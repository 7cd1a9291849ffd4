"""Stage-level timing of the render path on the current platform.

Times four jitted stages separately (raygen+mask+compact / K-NN /
gather+MLP / scatter+composite) at bench shapes so we can see where the
rays/s go. Not part of the test suite.
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
    decode_radiance, inverse_distance_weight)
from pointnerf2studio_tpu.models.neural_points import gather_neighbors
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.query import (
    compact_shading_locs, knn_for_locs, mask_raypos)
from pointnerf2studio_tpu.ops.raygen import near_far_linear_ray_generation


def timed(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n, out


def main():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=400,
            compact_budget=16),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    q = cfg.query
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    R = 8192
    raydirs = camera_rays(scene.campos, scene.camrotc2w, 64, 128, 80.0)
    raydirs = jnp.concatenate([raydirs] * (R // raydirs.shape[0]))[:R]
    print(f"R={R} SR={q.SR} D={q.z_depth_dim} budget={q.compact_budget} "
          f"platform={jax.devices()[0].platform}")

    grid, cloud, params = scene.grid, scene.cloud, scene.params
    near, far = jnp.asarray(2.0 - 0.9), jnp.asarray(2.0 + 0.9)

    @jax.jit
    def stage1(raydirs):
        raypos, _, _ = near_far_linear_ray_generation(
            scene.campos, raydirs, q.z_depth_dim, near=near, far=far)
        rp_mask = mask_raypos(grid, raypos)
        loc, m = compact_shading_locs(raypos, rp_mask, q.SR)
        flat_m = m.reshape(-1)
        order = jnp.argsort(~flat_m, stable=True).astype(jnp.int32)
        sel = order[: R * q.compact_budget]
        return loc.reshape(-1, 3)[sel], flat_m[sel], sel

    t1, (locs, mask_c, sel) = timed(stage1, raydirs)
    print(f"stage1 raygen+mask+compact: {t1*1e3:.1f} ms  "
          f"valid={int(mask_c.sum())}/{mask_c.shape[0]}")

    @jax.jit
    def stage2(locs, mask_c):
        return knn_for_locs(grid, cloud.xyz, locs, mask_c, q.K,
                            q.radius_limit ** 2, q.kernel_size)

    t2, pidx = timed(stage2, locs, mask_c)
    print(f"stage2 knn:                 {t2*1e3:.1f} ms  "
          f"found={int((pidx >= 0).sum())}")

    @jax.jit
    def stage3(pidx, locs, mask_c):
        pnt_mask = pidx >= 0
        neigh = gather_neighbors(cloud, pidx)
        loc_pers = w2pers(locs, scene.camrotc2w, scene.campos)
        neigh_pers = w2pers(neigh["xyz"], scene.camrotc2w, scene.campos)
        lp = loc_pers[..., None, :]
        pdist = jnp.stack(
            [neigh_pers[..., 0] * neigh_pers[..., 2] - lp[..., 0] * lp[..., 2],
             neigh_pers[..., 1] * neigh_pers[..., 2] - lp[..., 1] * lp[..., 2],
             neigh_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([neigh["xyz"] - locs[..., None, :], pdist], -1)
        weight = inverse_distance_weight(dists, pnt_mask)
        ray_id = sel // q.SR
        vd = raydirs[ray_id]
        return decode_radiance(params, cfg.agg, neigh["embeding"],
                               neigh["color"], neigh["dir"], dists, weight,
                               pnt_mask, vd, cloud.Rw2c)

    t3, (sigma, rgb) = timed(stage3, pidx, locs, mask_c)
    print(f"stage3 gather+mlp:          {t3*1e3:.1f} ms")

    M = locs.shape[0]

    @jax.jit
    def stage4(sigma, rgb, sel):
        s = jnp.zeros((R * q.SR,), sigma.dtype).at[sel].set(sigma)
        c = jnp.zeros((R * q.SR, 3), rgb.dtype).at[sel].set(rgb)
        s = s.reshape(R, q.SR)
        op = 1 - jnp.exp(-s * 0.008)
        tr = jnp.cumprod(1 - op + 1e-10, axis=-1)
        return jnp.sum((op * tr)[..., None] * c.reshape(R, q.SR, 3), -2)

    t4, _ = timed(stage4, sigma, rgb, sel)
    print(f"stage4 scatter+composite:   {t4*1e3:.1f} ms")

    total = t1 + t2 + t3 + t4
    print(f"total {total*1e3:.1f} ms -> {R/total:,.0f} rays/s")


if __name__ == "__main__":
    main()
