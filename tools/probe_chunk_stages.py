"""Cumulative stage decomposition of the downstream chunk pipeline.

The single-stage skip ablations (probe_chunks.py, tkpcdwrbm*s) came
back FLAT at both sphere and chair scale — no one stage accounts for
the ~2.6 ms per active 4096-sample chunk. This probe times CUMULATIVE
PREFIXES of chunk_body in one process (fetch-forced timing), so the
deltas attribute each stage's cost including the materialization of
its inputs:

  p_gather   fat-row gather + bitcasts
  p_geom     + cdelta / d2 / masking / shell eligibility
  p_knn      + K-NN top_k
  p_extract  + one-hot payload extract
  p_dists    + attr slices / w2pers perspective offsets
  decode     + aggregation weights (existing skip: fake MLP only)
  full       + MLP decode tower

Feeds REAL precomputed compaction outputs (chair scene by default,
reference geometry D=400) like probe_chunks.py; M = R * compact_budget
at R = 65536 — the bench's rb packing only scales M, stage RATIOS
carry over. Usage: probe_chunk_stages.py [all|<stage>[,<stage>...]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_chair_scene, make_sphere_scene)
from pointnerf2studio_tpu.models.fast_render import (
    chunk_pipeline, make_fast_scene)
from pointnerf2studio_tpu.ops.select import (
    rank_gather_pack, select_first_cols)
from tools.probe_bench_variants import base_cfg

STAGES = ("p_gather", "p_geom", "p_knn", "p_extract", "p_dists",
          "decode", "full")


def main():
    want = sys.argv[1] if len(sys.argv) > 1 else "all"
    stages = STAGES if want == "all" else tuple(want.split(","))
    use_sphere = os.environ.get("PROBE_SCENE", "chair") == "sphere"
    cfg = base_cfg(fast_chunk=4096, compact_mode="topk",
                   composite_mode="packed",
                   z_depth_dim=180 if use_sphere else 400)
    q = cfg.query
    t0 = time.time()
    scene = (make_sphere_scene if use_sphere else make_chair_scene)(
        n_points=558_000, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid,
                                       near=scene.near, far=scene.far)
    jax.block_until_ready(cache.rows)

    R, D = 65536, q.z_depth_dim
    SR, BP, budget = q.SR, q.ray_slot_budget, q.compact_budget
    M = R * budget
    near, far = jnp.asarray(scene.near), jnp.asarray(scene.far)
    step_t = (far - near) / D
    dims = cache.coor_2_qslot.shape
    gy, gz = dims[1], dims[2]
    dims_arr = jnp.array(dims, jnp.int32)
    qslot_flat = cache.coor_2_qslot.reshape(-1)

    @jax.jit
    def frontend(qslot_flat, raydirs):
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = scene.campos + raydirs[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)
        col_sel, cnt, _ = select_first_cols(qs, BP, min(SR, BP, D),
                                            q.select_mode)
        sel_ray, _, colm, _, qslot_c, mask_c = rank_gather_pack(
            qs, col_sel, cnt, M)
        return qslot_c, sel_ray, colm, mask_c

    rd0 = camera_rays(scene.campos, scene.camrotc2w, 128, 512,
                      320.0 if use_sphere else 711.0)
    fe_vars = []
    for i in range(9):   # 8 timed + 1 warmup, all DISTINCT (timing.py)
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        rays = jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]
        fe = frontend(qslot_flat, rays)
        fe_vars.append(jax.block_until_ready((rays,) + fe))
    n_valid = int(fe_vars[0][4].sum())
    print(f"setup {time.time()-t0:.0f}s  M={M} valid~{n_valid} "
          f"active_chunks~{-(-n_valid // 4096)}", flush=True)

    from tools.timing import timed_scalar_calls
    prev = None
    for stage in stages:
        ablate = None if stage == "full" else stage

        @jax.jit
        def run(params, Rw2c, cache, raydirs, qslot_c, sel_ray, sel_d,
                mask_c, _ab=ablate):
            sig, rgb, found, _pb = chunk_pipeline(
                params, Rw2c, cache, raydirs, scene.campos,
                scene.camrotc2w, near, step_t, cfg, rmin, svs,
                qslot_c, sel_ray, sel_d, mask_c, debug_ablate=_ab)
            return (sig.astype(jnp.float32).sum()
                    + rgb.astype(jnp.float32).sum()
                    + found.astype(jnp.float32).sum())

        tc = time.time()
        dt, _ = timed_scalar_calls(
            lambda fe, _r=run: _r(scene.params, scene.cloud.Rw2c, cache,
                                  *fe),
            fe_vars[:8], warmup_input=fe_vars[8])
        delta = "" if prev is None else f"  (+{(dt - prev)*1e3:6.1f})"
        print(f"stages {stage:10}: {dt*1e3:7.1f} ms{delta}"
              f"  [compile {time.time()-tc-8*dt:.0f}s]", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
