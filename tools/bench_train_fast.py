"""Fast-train-path throughput at reference scale (4096-ray batches),
vs tools/bench_train.py's legacy-path number (r1: 13.0 it/s)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_train import (
    make_fast_train_step, make_geo_scene)
from pointnerf2studio_tpu.train.trainer import create_train_state


def main():
    fast_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # argv[3]: "onehot" (default), "topk", or "topk-packed"
    mode = sys.argv[3] if len(sys.argv) > 3 else "onehot"
    compact = "topk" if mode.startswith("topk") else "onehot"
    composite = "packed" if mode.endswith("packed") else "grid"
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=budget, use_cache=False,
            fast_chunk=fast_chunk, compact_mode=compact,
            composite_mode=composite),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    geo, rmin, svs = make_geo_scene(cfg, scene.cloud, scene.grid)
    jax.block_until_ready(geo.rows)
    print(f"scene+geo build {time.time()-t0:.0f}s", flush=True)

    B = 4096
    rd0 = camera_rays(scene.campos, scene.camrotc2w, 8, 512, 320.0)
    ray_vars = []
    for i in range(4):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (B // r.shape[0] + 1))[:B]))
    gt = jnp.full((B, 3), 0.4, jnp.float32)
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)

    step_fn = make_fast_train_step(cfg)
    state = create_train_state(scene.params, scene.cloud, cfg)

    state, aux = step_fn(state, geo, rmin, svs, scene.campos,
                         scene.camrotc2w, ray_vars[0], gt, near, far,
                         jax.random.PRNGKey(0))
    jax.block_until_ready(aux["total"])
    print(f"compiled (+{time.time()-t0:.0f}s)", flush=True)

    n = 30
    t1 = time.perf_counter()
    for s in range(n):
        state, aux = step_fn(state, geo, rmin, svs, scene.campos,
                             scene.camrotc2w, ray_vars[s % 4], gt, near,
                             far, jax.random.PRNGKey(s))
    jax.block_until_ready(aux["total"])
    dt = (time.perf_counter() - t1) / n
    print(f"fast train step ch={fast_chunk} b={budget} {mode}: "
          f"{dt*1e3:.1f} ms "
          f"-> {1/dt:.1f} it/s, {B/dt:,.0f} rays/s "
          f"(legacy r1: 13.0 it/s; reference ~6-7 it/s)")


if __name__ == "__main__":
    main()
