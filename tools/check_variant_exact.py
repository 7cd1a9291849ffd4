"""Correctness check of a fast-path config variant vs the r1-best
baseline at bench scale on the real chip (timings here are NOT trusted
— only outputs). Usage: python tools/check_variant_exact.py <variant>
(a key of probe_bench_variants.VARIANTS)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays, make_fast_scene)
from tools.probe_bench_variants import VARIANTS, base_cfg


def main():
    import dataclasses

    which = sys.argv[1] if len(sys.argv) > 1 else "co8"
    tag, cfg_v, ab = VARIANTS[which]
    assert ab is None, "cannot exactness-check an ablated variant"
    use_chair = os.environ.get("PROBE_SCENE", "") == "chair"
    cfg0 = base_cfg(fast_chunk=4096)
    if use_chair:
        from pointnerf2studio_tpu.data.synthetic import make_chair_scene
        cfg0 = dataclasses.replace(cfg0, query=dataclasses.replace(
            cfg0.query, z_depth_dim=400))
        cfg_v = dataclasses.replace(cfg_v, query=dataclasses.replace(
            cfg_v.query, z_depth_dim=400))
        tag = tag + " CHAIR"

    t0 = time.time()
    scene = (make_chair_scene if use_chair else make_sphere_scene)(
        n_points=558_000, cfg=cfg0)
    print(f"scene {time.time()-t0:.0f}s", flush=True)

    R = 65536
    rd = (camera_rays(scene.campos, scene.camrotc2w, 256, 256, 355.5)
          if use_chair else
          camera_rays(scene.campos, scene.camrotc2w, 128, 512, 320.0))
    raydirs = jnp.concatenate([rd] * (R // rd.shape[0] + 1))[:R]
    near, far = jnp.asarray(scene.near), jnp.asarray(scene.far)

    from tools.probe_bench_variants import resolve_measured_sentinels
    cfg_v = resolve_measured_sentinels(cfg_v, scene, raydirs)

    def render(cfg):
        cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid,
                                           near=scene.near, far=scene.far,
                                           params=scene.params)

        # big arrays passed as ARGUMENTS (closures become constants
        # shipped to the remote compiler -> HTTP 413, STATUS.md rule 4)
        @jax.jit
        def f(params, Rw2c, cache, raydirs):
            return fast_render_rays(
                params, Rw2c, cache, scene.campos,
                scene.camrotc2w, raydirs, near, far, cfg, rmin, svs)
        out = f(scene.params, scene.cloud.Rw2c, cache, raydirs)
        if out.win_overflow is not None:
            print(f"  win_overflow={int(out.win_overflow)}", flush=True)
        if out.dw_overflow is not None:
            print(f"  dw_overflow={int(out.dw_overflow)}", flush=True)
        if out.rb_overflow is not None:
            print(f"  rb_overflow={int(out.rb_overflow)}", flush=True)
        if out.mc_overflow is not None:
            print(f"  mc_overflow={int(out.mc_overflow)}", flush=True)
        if out.cb_overflow is not None:
            print(f"  cb_overflow={int(out.cb_overflow)}", flush=True)
        return (np.asarray(out.ray_mask), np.asarray(out.coarse_raycolor),
                np.asarray(out.acc))

    m0, c0, a0 = render(cfg0)
    m1, c1, a1 = render(cfg_v)
    agree = (m0 == m1).mean()
    both = m0 & m1
    cd = np.abs(c0 - c1)[both]
    ad = np.abs(a0 - a1)[both]
    print(f"{tag}: mask agreement {agree:.6f} "
          f"({int((m0 != m1).sum())} rays differ)")
    if both.any():
        print(f"color diff mean {cd.mean():.6f} max {cd.max():.6f}; "
              f"acc diff max {ad.max():.6f}")
    # chunk_mode='fused' re-associates the bf16 MLP matmuls (split
    # weights, f32 K-accumulation): masks must still agree exactly,
    # colors to bf16 rounding tolerance (tests/test_fused_chunk.py)
    # base_cache rounds the cached layer-1 partial product to bf16
    # once (tests/test_fast_render.py::test_base_cache_matches)
    # pe_mode="rec" ("pem" keys) perturbs the encodings by ~2e-4 —
    # bf16-tower-tolerance class, same bar as base_cache
    tol = (2.5e-2 if which.startswith("tkfc")
           else 5e-3 if ("bh" in which or "pem" in which) else 1e-3)
    ok = agree == 1.0 and (not both.any() or cd.max() < tol)
    print(("EXACT" if tol == 1e-3 else f"WITHIN-TOL {tol}") if ok
          else "DIFFERS")


if __name__ == "__main__":
    main()
