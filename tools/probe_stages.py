"""Probe: re-measure the real render-pipeline stages with VARIED inputs
(the axon backend caches identical executions) and drill into sub-ops.

probe_gather3 showed standalone gathers run at >=40 Gelem/s — so the
50ms-per-stage numbers from profile_render2 (fixed args) need
re-verification.
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
from pointnerf2studio_tpu.models.aggregator import (
    aggregation_weight, decode_radiance)
from pointnerf2studio_tpu.models.neural_points import gather_neighbors
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.query import knn_from_cache, mask_raypos_qslot
from pointnerf2studio_tpu.ops.raygen import near_far_linear_ray_generation


def timed_v(fn, variants, *rest, n=10):
    """fn(variants[i], *rest) with distinct first args per call."""
    out = jax.block_until_ready(fn(variants[0], *rest))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(variants[i % len(variants)], *rest)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


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
    print(f"grid+cache build: {time.time()-t0:.1f}s")

    R = 32768
    D = q.z_depth_dim
    M = R * q.compact_budget
    grid, cloud, params = scene.grid, scene.cloud, scene.params
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)
    campos, camrot = scene.campos, scene.camrotc2w

    rd = camera_rays(scene.campos, scene.camrotc2w, 64, 512, 320.0)
    rd = jnp.concatenate([rd] * (R // rd.shape[0] + 1))[:R]
    key = jax.random.PRNGKey(0)
    # 4 distinct ray batches (tiny rotations)
    ray_vars = [jax.block_until_ready(
        rd + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd.shape))
        for i in range(4)]
    ray_vars = [r / jnp.linalg.norm(r, axis=-1, keepdims=True)
                for r in ray_vars]

    base = timed_v(jax.jit(lambda x: x + 1),
                   [jnp.zeros(8) + i for i in range(4)])
    print(f"dispatch baseline: {base*1e3:.2f} ms")

    # END-TO-END first: the ground truth.
    @jax.jit
    def full(raydirs, grid, cloud, params):
        return render_rays(params, cloud, grid, campos, camrot, raydirs,
                           near, far, cfg).coarse_raycolor

    t = timed_v(full, ray_vars, grid, cloud, params)
    print(f"FULL render step:  {(t-base)*1e3:7.1f} ms "
          f"-> {R/(t-base):,.0f} rays/s")

    # Stage 1
    @jax.jit
    def stage1(raydirs, grid):
        R_ = raydirs.shape[0]
        raypos, _, _ = near_far_linear_ray_generation(
            campos, raydirs, D, near=near, far=far)
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

    t1 = timed_v(stage1, ray_vars, grid)
    locs, mask_c, qslot, sel = jax.block_until_ready(stage1(rd, grid))
    print(f"stage1 total:      {(t1-base)*1e3:7.1f} ms  "
          f"valid={int(mask_c.sum())}/{M}")

    # Stage 1 sub-ops
    @jax.jit
    def s1_raygen(raydirs):
        return near_far_linear_ray_generation(
            campos, raydirs, D, near=near, far=far)[0]

    print(f"  raygen:          {(timed_v(s1_raygen, ray_vars)-base)*1e3:7.1f} ms")

    raypos_vars = [jax.block_until_ready(s1_raygen(r)) for r in ray_vars]

    @jax.jit
    def s1_qslot(raypos, grid):
        return mask_raypos_qslot(grid, raypos)

    print(f"  qslot gather:    {(timed_v(s1_qslot, raypos_vars, grid)-base)*1e3:7.1f} ms")

    qs_vars = [jax.block_until_ready(s1_qslot(rp, grid))
               for rp in raypos_vars]

    @jax.jit
    def s1_compact(qs):
        m = qs >= 0
        rank_d = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        keep = m & (rank_d <= q.SR)
        flat_m = keep.reshape(R * D)
        rank = jnp.cumsum(flat_m.astype(jnp.int32)) - 1
        n_valid = rank[-1] + 1
        dest = jnp.where(flat_m & (rank < M), rank, M)
        sel = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.arange(R * D, dtype=jnp.int32), mode="drop")
        return sel, n_valid

    print(f"  cumsum+scatter:  {(timed_v(s1_compact, qs_vars)-base)*1e3:7.1f} ms")

    # Stage 2: KNN
    s1_outs = [jax.block_until_ready(stage1(r, grid)) for r in ray_vars]
    qslot_vars = [o[2] for o in s1_outs]

    @jax.jit
    def stage2(qslot, locs, mask_c, grid):
        return knn_from_cache(grid, qslot, locs, mask_c, q.K,
                              q.radius_limit ** 2, 2, True)

    t2 = timed_v(stage2, qslot_vars, locs, mask_c, grid)
    print(f"stage2 cache knn:  {(t2-base)*1e3:7.1f} ms")

    # stage2 sub: just the fat-row gather
    @jax.jit
    def s2_gather(qslot, grid):
        return grid.cache.cand_pack[jnp.clip(qslot, 0)]

    t2g = timed_v(s2_gather, qslot_vars, grid)
    print(f"  cand_pack row gather: {(t2g-base)*1e3:7.1f} ms")

    pidx_vars = [jax.block_until_ready(stage2(qs, lc, mc, grid))
                 for (lc, mc, qs, _) in s1_outs]

    # Stage 3a: attribute gathers
    @jax.jit
    def stage3a(pidx, cloud):
        return gather_neighbors(cloud, pidx)

    t3a = timed_v(stage3a, pidx_vars, cloud)
    print(f"stage3a attr gathers: {(t3a-base)*1e3:7.1f} ms")

    # Stage 3b: MLP tower
    neigh_vars = [jax.block_until_ready(stage3a(p, cloud))
                  for p in pidx_vars]

    @jax.jit
    def stage3b(args, params, cloud):
        neigh, pidx, locs, sel = args
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
        vd = rd[(sel // D)]
        return decode_radiance(params, cfg.agg, emb,
                               neigh["color"], neigh["dir"], dists, weight,
                               pnt_mask, vd, cloud.Rw2c)

    args_vars = [(n_, p_, o[0], o[3])
                 for n_, p_, o in zip(neigh_vars, pidx_vars, s1_outs)]
    t3b = timed_v(stage3b, args_vars, params, cloud)
    print(f"stage3b mlp tower: {(t3b-base)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
