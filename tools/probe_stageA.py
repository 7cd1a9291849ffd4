"""Time ONLY the fast-path front end (raygen -> voxelize -> qslot
gather -> mask -> compaction) as its own jitted program — the honest
complement to the compact-skip ablation. One variant per process.

Usage: python tools/probe_stageA.py [onehot|topk|novox]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_render import (
    make_fast_scene, onehot_select_qd)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "topk"
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=8, ray_slot_budget=32, use_cache=False,
            fast_chunk=4096),
        agg=AggregatorConfig(compute_dtype="bfloat16"))
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid)
    jax.block_until_ready(cache.rows)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    R = 65536
    D = q.z_depth_dim
    BP = 32
    budget = q.compact_budget
    M = R * budget
    rd0 = camera_rays(scene.campos, scene.camrotc2w, 128, 512, 320.0)
    ray_vars = []
    for i in range(4):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]))
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)
    step_t = (far - near) / D
    dims = cache.coor_2_qslot.shape
    gy, gz = dims[1], dims[2]
    dims_arr = jnp.array(dims, jnp.int32)
    SR = q.SR

    @jax.jit
    def stageA(qslot_flat, raydirs, campos):
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = campos + raydirs[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        if which == "novox":
            qs = jnp.where(inb, fidx % 97, -1)
        else:
            qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)
        mask = qs >= 0
        if which == "mask":
            # through the [R, D] mask only
            return jnp.sum(mask.astype(jnp.int32)) + qs.sum()
        if which == "sel":
            # mask + top_k, no scatter/gathers
            col = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1)
            neg = jax.lax.top_k(jnp.where(mask, -col, -(D + 1)), BP)[0]
            return neg.sum() + qs.sum()
        if which == "onehot":
            rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
            keep = mask & (rank <= min(SR, BP))
            d_true = jnp.broadcast_to(
                jnp.arange(D, dtype=jnp.int32), (R, D))
            q_sel, d_sel = onehot_select_qd(keep, rank, qs, d_true, BP)
            cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)
            off = jnp.cumsum(cnt) - cnt
            sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
            dest = jnp.where(sloti < cnt[:, None],
                             off[:, None] + sloti, M)
            rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
            sel_ray = jnp.zeros((M,), jnp.int32).at[dest].set(
                rayi, mode="drop")
            sel_d = jnp.zeros((M,), jnp.int32).at[dest].set(
                d_sel, mode="drop")
            qslot_c = jnp.zeros((M,), jnp.int32).at[dest].set(
                jnp.maximum(q_sel, 0), mode="drop")
            return sel_ray.sum() + sel_d.sum() + qslot_c.sum()
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1)
            neg = jax.lax.top_k(jnp.where(mask, -col, -(D + 1)), BP)[0]
            cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32), -1),
                              min(SR, BP))
            off = jnp.cumsum(cnt) - cnt
            sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
            dest = jnp.where(sloti < cnt[:, None],
                             off[:, None] + sloti, M)
            rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
            sel = jnp.zeros((M,), jnp.int32).at[dest].set(
                rayi * D + jnp.minimum(-neg, D - 1), mode="drop")
            sel_ray = sel // D
            qslot_c = jnp.maximum(qs.reshape(-1)[sel], 0)
            sel_slot = jnp.arange(M, dtype=jnp.int32) - off[sel_ray]
            return sel.sum() + qslot_c.sum() + sel_slot.sum()

    qf = cache.coor_2_qslot.reshape(-1)
    out = jax.block_until_ready(stageA(qf, ray_vars[0], scene.campos))
    t1 = time.perf_counter()
    n = 8
    for i in range(n):
        out = stageA(qf, ray_vars[i % 4], scene.campos)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t1) / n
    print(f"stageA[{which}]: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
