"""Standalone timing of the topk-compaction machinery (fast_render's
[R, D]-domain stage), isolated from the chunk pipeline. One stage per
process (phantom-timing rule, STATUS.md).

Stages:
  qs    : voxelize + qslot table gather             -> qs.sum()
  mask  : + mask / ray_hit / cnt / off               -> sums
  topk  : + lax.top_k first-BP columns               -> col_sel.sum()
  pack  : full rank-gather pack (current code path)  -> all outputs
  packsc: scatter-based pack (the pre-r2.5 design)   -> all outputs
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.data.synthetic import camera_rays, make_sphere_scene
from pointnerf2studio_tpu.models.fast_render import make_fast_scene
from tools.probe_bench_variants import base_cfg


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "pack"
    cfg = base_cfg(fast_chunk=4096, compact_mode="topk")
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    cache, rmin, svs = make_fast_scene(cfg, scene.cloud, scene.grid,
                                       near=scene.near, far=scene.far)
    jax.block_until_ready(cache.rows)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    R = 65536
    D = q.z_depth_dim
    SR, BP = q.SR, q.ray_slot_budget
    budget = q.compact_budget
    M = R * budget
    near, far = jnp.asarray(scene.near), jnp.asarray(scene.far)
    step_t = (far - near) / D
    dims = cache.coor_2_qslot.shape
    gy, gz = dims[1], dims[2]
    dims_arr = jnp.array(dims, jnp.int32)

    rd0 = camera_rays(scene.campos, scene.camrotc2w, 128, 512, 320.0)
    ray_vars = []
    for i in range(4):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]))

    def compaction(qslot_flat, raydirs, upto):
        nvox = dims[0] * dims[1] * dims[2]
        if upto == "tg":
            # hashed-index gather from the big table, no voxelize:
            # isolates pure gather row cost
            mi2 = jnp.arange(R * D, dtype=jnp.uint32).reshape(R, D)
            h = (mi2 * jnp.uint32(2654435761)
                 + (raydirs[:, :1] * 1e6).astype(jnp.uint32))
            idx = (h % jnp.uint32(nvox)).astype(jnp.int32)
            return (qslot_flat[idx].sum(),)
        if upto == "qst":
            # transposed [D, R] domain: consecutive gather indices are
            # neighboring PIXELS at one depth (near-identical table
            # rows) instead of depth steps (~3 voxels apart). Tests
            # whether the gather unit exploits index locality.
            t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
            pos = (scene.campos + raydirs[None, :, :]
                   * t_mid[:, None, None])                       # [D, R, 3]
            gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
            inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
            gcc = jnp.clip(gc, 0, dims_arr - 1)
            fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
            qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)
            return (qs.T.sum(),)
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = scene.campos + raydirs[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        if upto == "vox":
            # voxelize only, no table gather
            return (fidx.sum(), inb.sum())
        qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)
        if upto == "qs":
            return (qs.sum(),)
        mask = qs >= 0
        ray_hit = jnp.any(mask, axis=-1)
        cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32), -1),
                          min(SR, BP, D))
        off_end = jnp.cumsum(cnt)
        off = off_end - cnt
        if upto == "mask":
            return (qs.sum(), off.sum(), ray_hit.sum())
        kk = min(BP, D)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1)
        neg = jax.lax.top_k(jnp.where(mask, -col, -(D + 1)), kk)[0]
        col_sel = -neg
        if upto == "topk":
            return (qs.sum(), off.sum(), col_sel.sum())
        d_true = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (R, D))
        if upto == "pack":
            inc = jnp.zeros((M + 1,), jnp.int32).at[
                jnp.minimum(off_end, M)].add(1, mode="drop")
            mi = jnp.arange(M, dtype=jnp.int32)
            sel_ray = jnp.minimum(jnp.cumsum(inc)[:M], R - 1)
            sel_slot = mi - off[sel_ray]
            colm = jnp.minimum(
                col_sel.reshape(-1)[sel_ray * BP
                                    + jnp.clip(sel_slot, 0, BP - 1)],
                D - 1)
            sel = sel_ray * D + colm
            qslot_c = jnp.maximum(qs.reshape(-1)[sel], 0)
            sel_d = d_true.reshape(-1)[sel]
            total = jnp.minimum(off_end[-1], M)
        else:   # packsc
            sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
            dest = jnp.where(sloti < cnt[:, None], off[:, None] + sloti, M)
            rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
            sel = jnp.zeros((M,), jnp.int32).at[dest].set(
                rayi * D + jnp.minimum(col_sel, D - 1), mode="drop")
            sel_ray = sel // D
            qslot_c = jnp.maximum(qs.reshape(-1)[sel], 0)
            sel_d = d_true.reshape(-1)[sel]
            sel_slot = jnp.arange(M, dtype=jnp.int32) - off[sel_ray]
            total = jnp.minimum(jnp.sum(cnt), M)
        mask_c = jnp.arange(M, dtype=jnp.int32) < total
        return (sel_ray.sum(), qslot_c.sum(), sel_d.sum(),
                sel_slot.sum(), mask_c.sum(), ray_hit.sum())

    qslot_flat = cache.coor_2_qslot.reshape(-1)
    f = jax.jit(lambda qf, r: compaction(qf, r, stage))
    out = jax.block_until_ready(f(qslot_flat, ray_vars[0]))
    t0 = time.perf_counter()
    n = 8
    for i in range(n):
        out = f(qslot_flat, ray_vars[i % 4])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"stage {stage:7}: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
