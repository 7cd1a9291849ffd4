"""Stage timing v2: the candidate-cache render pipeline at bench scale.

Scene state (grid/cloud/params) is passed as jit ARGUMENTS — closing
over it bakes the 1-4 GB candidate cache into each executable as a
constant (slow compiles, duplicated HBM)."""

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
from pointnerf2studio_tpu.models.aggregator import (
    aggregation_weight, decode_radiance)
from pointnerf2studio_tpu.models.neural_points import gather_neighbors
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.query import (
    compact_shading_locs, knn_from_cache, mask_raypos_qslot)
from pointnerf2studio_tpu.ops.raygen import near_far_linear_ray_generation


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=8, max_q=1_000_000),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    jax.block_until_ready(scene.grid.cache.cand_pack)
    print(f"grid+cache build: {time.time()-t0:.1f}s "
          f"n_occ={int(scene.grid.n_occ)} n_q={int(scene.grid.cache.n_q)}")

    R = 32768
    rd = camera_rays(scene.campos, scene.camrotc2w, 64, 512, 320.0)
    raydirs = jnp.concatenate([rd] * (R // rd.shape[0] + 1))[:R]
    grid, cloud, params = scene.grid, scene.cloud, scene.params
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)
    campos, camrot = scene.campos, scene.camrotc2w
    base, _ = timed(jax.jit(lambda x: x + 1), jnp.zeros(8))
    print(f"dispatch baseline: {base*1e3:.1f} ms  R={R}")

    M = R * q.compact_budget

    D = q.z_depth_dim

    @jax.jit
    def stage1(grid, raydirs):
        # mirrors the [R, D] mask formulation in models/render.py
        R_ = raydirs.shape[0]
        raypos, _, _ = near_far_linear_ray_generation(
            campos, raydirs, q.z_depth_dim, near=near, far=far)
        qs = mask_raypos_qslot(grid, raypos)
        m = qs >= 0
        rank_d = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        keep = m & (rank_d <= q.SR)
        flat_m = keep.reshape(R_ * D)
        rank = jnp.cumsum(flat_m.astype(jnp.int32)) - 1
        n_valid = rank[-1] + 1
        dest = jnp.where(flat_m & (rank < M), rank, M)
        sel = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.arange(R_ * D, dtype=jnp.int32), mode="drop")
        mask_c = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(n_valid, M)
        return (raypos.reshape(-1, 3)[sel], mask_c,
                qs.reshape(-1)[sel], sel)

    t1, (locs, mask_c, qslot, sel) = timed(stage1, grid, raydirs)
    print(f"stage1 raygen+mask+compact: {(t1-base)*1e3:.1f} ms  "
          f"valid={int(mask_c.sum())}/{M}")

    @jax.jit
    def stage1a(grid, raydirs):
        raypos, _, _ = near_far_linear_ray_generation(
            campos, raydirs, q.z_depth_dim, near=near, far=far)
        return mask_raypos_qslot(grid, raypos)

    t1a, _ = timed(stage1a, grid, raydirs)
    print(f"  (raygen+qslot gather only): {(t1a-base)*1e3:.1f} ms")

    @jax.jit
    def stage2(grid, qslot, locs, mask_c):
        return knn_from_cache(grid, qslot, locs, mask_c, q.K,
                              q.radius_limit ** 2, 2, True)

    t2, pidx = timed(stage2, grid, qslot, locs, mask_c)
    print(f"stage2 cache knn:           {(t2-base)*1e3:.1f} ms  "
          f"found={int((pidx >= 0).sum())}")

    @jax.jit
    def stage3a(cloud, pidx):
        return gather_neighbors(cloud, pidx)

    t3a, neigh = timed(stage3a, cloud, pidx)
    print(f"stage3a attr gathers:       {(t3a-base)*1e3:.1f} ms")

    @jax.jit
    def stage3b(params, cloud, neigh, pidx, locs, sel):
        pnt_mask = pidx >= 0
        loc_pers = w2pers(locs, camrot, campos)
        neigh_pers = w2pers(neigh["xyz"], camrot, campos)
        lp = loc_pers[..., None, :]
        pdist = jnp.stack(
            [neigh_pers[..., 0] * neigh_pers[..., 2] - lp[..., 0] * lp[..., 2],
             neigh_pers[..., 1] * neigh_pers[..., 2] - lp[..., 1] * lp[..., 2],
             neigh_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([neigh["xyz"] - locs[..., None, :], pdist], -1)
        weight, emb = aggregation_weight(
            cfg.agg, neigh["embeding"], dists, pnt_mask, max(q.scaled_vsize))
        vd = raydirs[(sel // q.z_depth_dim)]
        return decode_radiance(params, cfg.agg, emb,
                               neigh["color"], neigh["dir"], dists, weight,
                               pnt_mask, vd, cloud.Rw2c)

    t3b, _ = timed(stage3b, params, cloud, neigh, pidx, locs, sel)
    print(f"stage3b mlp tower:          {(t3b-base)*1e3:.1f} ms")

    total = (t1 - base) + (t2 - base) + (t3a - base) + (t3b - base)
    print(f"total ~{total*1e3:.1f} ms -> {R/total:,.0f} rays/s")


if __name__ == "__main__":
    main()
