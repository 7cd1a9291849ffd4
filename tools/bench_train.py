"""Training-step throughput at reference scale (4096-ray batches).

The reference trains chair at ~6-7 it/s of 4096-ray batches = 25-30k
rays/s on its CUDA GPU (pointnerf/out_train.txt:51-80, BASELINE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.train.trainer import (
    create_train_state, make_train_step)


def main():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=8),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    jax.block_until_ready(scene.grid.cache.cand_pack)
    print(f"scene build {time.time()-t0:.0f}s", flush=True)

    B = 4096
    rd = camera_rays(scene.campos, scene.camrotc2w, 8, 512, 320.0)
    raydirs = jnp.concatenate([rd] * (B // rd.shape[0] + 1))[:B]
    gt = jnp.full((B, 3), 0.4, jnp.float32)
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)

    step_fn = make_train_step(cfg)
    state = create_train_state(scene.params, scene.cloud, cfg)

    # warmup/compile
    state, aux = step_fn(state, scene.grid, scene.campos, scene.camrotc2w,
                         raydirs, gt, near, far, jax.random.PRNGKey(0))
    jax.block_until_ready(aux["total"])
    print(f"compiled (+{time.time()-t0:.0f}s)", flush=True)

    n = 30
    t1 = time.perf_counter()
    for s in range(n):
        state, aux = step_fn(state, scene.grid, scene.campos,
                             scene.camrotc2w, raydirs, gt, near, far,
                             jax.random.PRNGKey(s))
    jax.block_until_ready(aux["total"])
    dt = (time.perf_counter() - t1) / n
    print(f"train step: {dt*1e3:.1f} ms  -> {1/dt:.1f} it/s, "
          f"{B/dt:,.0f} rays/s (reference ~6-7 it/s, 25-30k rays/s)")


if __name__ == "__main__":
    main()
