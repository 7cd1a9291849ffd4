"""Standalone timing of the fast-path chunk pipeline (fat gather +
K-NN + extract + weights + decode), fed REAL precomputed compaction
outputs as arguments — no DCE ambiguity, no front-end in the timed
program. One variant per process (phantom-timing rule, STATUS.md).

Variants:
  full    : chunk_pipeline as shipped
  gather  : fat-row gather replaced by a broadcast (isolates gather)
  knn     : top_k replaced by a static slice
  extract : one-hot payload extract replaced by a static slice
  weights : aggregation weights replaced by constants
  decode  : MLP tower replaced by cheap reductions
  ch8k / ch16k : full at fast_chunk 8192 / 16384
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_render import (
    chunk_pipeline, make_fast_scene)
from pointnerf2studio_tpu.ops.select import (
    rank_gather_pack, select_first_cols)
from tools.probe_bench_variants import base_cfg


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    chunk = {"ch8k": 8192, "ch16k": 16384}.get(variant, 4096)
    ablate = (variant if variant in
              ("gather", "knn", "extract", "weights", "decode") else None)
    cfg = base_cfg(fast_chunk=chunk, compact_mode="topk",
                   composite_mode="packed",
                   knn_mode="fused" if variant == "fused" else "xla")
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
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

    rd0 = camera_rays(scene.campos, scene.camrotc2w, 128, 512, 320.0)
    fe_vars = []
    for i in range(9):   # 8 timed + 1 warmup, all DISTINCT (timing.py)
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        rays = jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]
        fe = frontend(qslot_flat, rays)
        fe_vars.append(jax.block_until_ready((rays,) + fe))
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    @jax.jit
    def run(params, Rw2c, cache, raydirs, qslot_c, sel_ray, sel_d, mask_c):
        sig, rgb, found, _pb = chunk_pipeline(
            params, Rw2c, cache, raydirs, scene.campos, scene.camrotc2w,
            near, step_t, cfg, rmin, svs, qslot_c, sel_ray, sel_d,
            mask_c, debug_ablate=ablate)
        return (sig.astype(jnp.float32).sum()
                + rgb.astype(jnp.float32).sum()
                + found.astype(jnp.float32).sum())

    from tools.timing import timed_scalar_calls
    dt, _ = timed_scalar_calls(
        lambda fe: run(scene.params, scene.cloud.Rw2c, cache, *fe),
        fe_vars[:8], warmup_input=fe_vars[8])
    print(f"chunks {variant:8} ch={chunk}: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
