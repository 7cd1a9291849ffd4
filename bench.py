"""Benchmark: render throughput (rays/s) at NeRF-Synthetic chair scale.

Renders a full 800x800 frame (640k rays) of a chair-scale synthetic
scene (558k neural points — the reference's fresh chair init count,
BASELINE.md) through the jitted sharded FAST render path
(models/fast_render.py: fat candidate cache + one-hot slot compaction),
in fixed-size ray chunks. Prints ONE JSON line:
  {"metric": "render_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / 94000}
Baseline: the reference renders 800x800 chair frames in ~6.8 s on a
CUDA GPU => ~94k rays/s (pointnerf/out.txt:43-61).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 94_000.0


def main() -> None:
    import dataclasses

    from pointnerf2studio_tpu.config import (
        AggregatorConfig, PointNerfConfig, QueryConfig)
    from pointnerf2studio_tpu.data.synthetic import (
        camera_rays, make_sphere_scene)
    from pointnerf2studio_tpu.models.fast_render import make_fast_scene
    from pointnerf2studio_tpu.parallel.sharding import (
        make_mesh, make_sharded_fast_render)

    # Chair-scale configuration (SURVEY.md §2.1 canonical values), with
    # bf16 MLP compute — production precision on TPU.
    # z_depth_dim matches the REFERENCE's sampling density: chair uses
    # 400 samples over [2, 6] = one per 1.25 scaled voxels
    # (dev_scripts/w_n360/chair_points.sh); this scene's [1.1, 2.9]
    # span at the same density is 180 samples. compact_budget 8 is
    # generous headroom over the ~224k valid slots per 65k-ray chunk:
    # all-padding tail chunks are skipped by the prefix-validity cond,
    # so overprovisioning is ~free. ray_slot_budget 32 covers the
    # per-ray tail (p100 measured < 32 on this scene).
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=8, ray_slot_budget=32, use_cache=False,
            fast_chunk=4096),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid,
                                       near=scene.near, far=scene.far)
    jax.block_until_ready(cache.rows)

    H = W = 800
    chunk = 65_536
    focal = 800.0
    raydirs = camera_rays(scene.campos, scene.camrotc2w, H, W, focal)
    total = raydirs.shape[0]
    n_chunks = total // chunk

    mesh = make_mesh()
    render = make_sharded_fast_render(cfg, mesh)
    near, far = jnp.asarray(scene.near), jnp.asarray(scene.far)

    def run_chunk(i):
        rays = jax.lax.dynamic_slice_in_dim(raydirs, i * chunk, chunk)
        return render(scene.params, scene.cloud.Rw2c, cache, scene.campos,
                      scene.camrotc2w, rays, near, far, rmin, svs)

    # Warmup / compile.
    run_chunk(0).coarse_raycolor.block_until_ready()

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n_chunks):
        out = run_chunk(i)
    out.coarse_raycolor.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_sec = n_chunks * chunk / dt
    print(json.dumps({
        "metric": "render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
