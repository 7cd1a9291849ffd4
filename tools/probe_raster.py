"""Raster front-end probes.

--stats (CPU ok): build the bench chair scene's grid, compute every
  query voxel's conservative footprint for the bench camera, and print
  the (w, h, nd) distribution + suggested class budgets for
  ops/raster.DEFAULT settings at 800p.

no flag (chip): time the frame emit-table build (salted inputs,
  fetch-forced) and an end-to-end chunk render through premarch vs
  the march anchor, sentinel-bracketed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--stats" in sys.argv or "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import camera_rays, make_chair_scene


def bench_cfg():
    return PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=400,
            compact_budget=8, ray_slot_budget=32, use_cache=False,
            fast_chunk=4096),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )


def main():
    cfg = bench_cfg()
    scene = make_chair_scene(n_points=558_000, cfg=cfg)
    H = W = 800
    focal = 1111.1
    q = cfg.query
    D = q.z_depth_dim
    step_t = (scene.far - scene.near) / D

    from pointnerf2studio_tpu.ops.raster import _voxel_footprint

    # query voxel set = dilated occupancy (the qslot table's domain)
    occ = np.asarray(jax.device_get(scene.grid.coor_occ)).astype(bool)
    coords = np.argwhere(occ).astype(np.int32)
    n_q = coords.shape[0]
    print(f"query voxels: {n_q}", flush=True)

    qvox = jnp.asarray(coords)
    i0, j0, d0, w, h, nd, ok = jax.jit(
        lambda qv: _voxel_footprint(
            qv, jnp.asarray(scene.grid.ranges_min, jnp.float32),
            jnp.asarray(q.scaled_vsize, jnp.float32),
            scene.campos, scene.camrotc2w, H, W, focal,
            jnp.float32(scene.near), jnp.float32(scene.far), D,
            jnp.float32(step_t)))(qvox)
    w = np.asarray(w)
    h = np.asarray(h)
    nd = np.asarray(nd)
    ok = np.asarray(ok)
    w, h, nd = w[ok], h[ok], nd[ok]
    print(f"ray-visible voxels: {ok.sum()} of {n_q}")
    for name, a in (("w", w), ("h", h), ("nd", nd)):
        qs = np.percentile(a, [50, 90, 99, 99.9, 100])
        print(f"{name}: p50={qs[0]:.0f} p90={qs[1]:.0f} p99={qs[2]:.0f} "
              f"p99.9={qs[3]:.0f} max={qs[4]:.0f}")
    rows_true = (w.astype(np.int64) * h * nd).sum()
    print(f"true emit rows (bbox x ndrange): {rows_true:,}")
    # class assignment for a few candidate ladders
    for classes in (((3, 3, 2), (4, 4, 2), (4, 5, 2)),
                    ((3, 4, 2), (4, 5, 2)),
                    ((3, 3, 2), (4, 5, 2)),
                    ((3, 3, 2), (4, 4, 2), (5, 6, 3)),):
        tot = 0
        counts = []
        rem = np.ones(w.shape[0], bool)
        for (px, py, ndc) in classes:
            fits = rem & (w <= px) & (h <= py) & (nd <= ndc)
            counts.append(int(fits.sum()))
            tot += int(fits.sum()) * px * py * ndc
            rem &= ~fits
        print(f"classes {classes}: counts {counts} "
              f"unfit {int(rem.sum())} static_rows {tot:,}")


if __name__ == "__main__":
    main()
