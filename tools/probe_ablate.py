"""End-to-end ablation timing of the fast render path on the bench
scene: full vs decode-skipped vs knn-skipped vs qslot-skipped. The only
trustworthy timing methodology on this backend is end-to-end wall time
over varied ray chunks (see STATUS.md measurement notes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_render import (
    fast_render_rays, make_fast_scene)


def main():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=8, ray_slot_budget=32, use_cache=False),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid)
    jax.block_until_ready(cache.rows)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    R = 65536
    rd0 = camera_rays(scene.campos, scene.camrotc2w, 128, 512, 320.0)
    ray_vars = []
    for i in range(4):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]))
    near, far = jnp.asarray(scene.near), jnp.asarray(scene.far)

    def make(ablate):
        @jax.jit
        def f(params, Rw2c, cache, raydirs):
            return fast_render_rays(
                params, Rw2c, cache, scene.campos, scene.camrotc2w,
                raydirs, near, far, cfg, rmin, svs,
                debug_ablate=ablate).coarse_raycolor
        return f

    for ablate in [None, "decode", "knn", "qslot"]:
        f = make(ablate)
        out = jax.block_until_ready(
            f(scene.params, scene.cloud.Rw2c, cache, ray_vars[0]))
        t0 = time.perf_counter()
        n = 8
        for i in range(n):
            out = f(scene.params, scene.cloud.Rw2c, cache,
                    ray_vars[i % 4])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"ablate={str(ablate):6}: {dt*1e3:7.1f} ms "
              f"-> {R/dt:,.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
