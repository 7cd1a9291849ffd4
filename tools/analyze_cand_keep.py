"""Distribution of EXACT-prune kept-candidate counts on the bench
chair: sizes the two-tier candidate-width design (most slots decode at
a narrow width C2; the few fat-voxel slots take a wide pass). Run on
CPU (the chip queue owns the TPU): ~10 min.

Prints per-voxel kept quantiles and valid-candidate quantiles, plus
candidate-weighted ones (a proxy for slot-weighted: shading slots
concentrate where candidates do).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import make_chair_scene
from pointnerf2studio_tpu.models.fast_render import ROWW, make_fast_scene


def main():
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 558_000
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=400,
            compact_budget=8, ray_slot_budget=32, use_cache=False,
            fast_chunk=4096, cand_prune=True),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    scene = make_chair_scene(n_points=n_pts, cfg=cfg)
    cache, _, _ = make_fast_scene(cfg, scene.cloud, scene.grid)
    C = cache.cand
    meta = jax.lax.bitcast_convert_type(
        cache.rows.reshape(-1, C, ROWW)[..., 0], jnp.int32)
    kept = np.asarray(jnp.sum((meta >= 0).astype(jnp.int32), -1))
    live = kept > 0
    k = kept[live]
    qs = [50, 75, 90, 95, 99, 99.9, 100]
    print(f"voxels live {live.sum()} / {kept.shape[0]}; C={C}")
    print("kept per voxel   :",
          {q: float(np.percentile(k, q)) for q in qs})
    w = k.astype(np.float64)
    order = np.sort(k)
    cw = np.cumsum(np.sort(k).astype(np.float64))
    cw /= cw[-1]
    print("cand-weighted    :",
          {q: int(order[np.searchsorted(cw, q / 100)])
           for q in (50, 75, 90, 95, 99)})
    for c2 in (16, 24, 32, 40):
        frac_v = float((k > c2).mean())
        frac_c = float(w[k > c2].sum() / w.sum())
        print(f"C2={c2:3d}: fat voxels {frac_v * 100:5.2f}%  "
              f"fat candidate mass {frac_c * 100:5.2f}%")

    # ---- subdivided-domination variant (numpy, voxel subsample):
    # keep p iff RELEVANT IN SOME SUB-CELL (radius-feasible there and
    # fewer than K candidates whose max distance to the sub-cell is
    # below p's min). Tighter cubes -> tighter lo/hi -> more pruning;
    # still provably exact by the same argument per sub-cell.
    # decode the packed bf16 payload: words 1.. hold bf16 pairs;
    # rel = payload[..., :3]
    pay = jax.lax.bitcast_convert_type(
        cache.rows.reshape(-1, C, ROWW)[..., 1:], jnp.bfloat16)
    rel = np.asarray(pay.reshape(-1, C, (ROWW - 1) * 2)[..., :3],
                     np.float32)
    valid = np.asarray(meta >= 0)
    shell = np.asarray(meta & 3)
    half = np.asarray(scene.grid.scaled_vsize, np.float32) * 0.5
    radius2 = float(cfg.query.radius_limit) ** 2
    K = cfg.query.K
    rng = np.random.default_rng(0)
    live_idx = np.flatnonzero(live)
    sub = rng.choice(live_idx, min(60_000, live_idx.size), replace=False)
    rels, vals, shs = rel[sub], valid[sub], shell[sub]

    for S in (2, 3):
        offs = (np.stack(np.meshgrid(*[np.arange(S)] * 3,
                                     indexing="ij"), -1)
                .reshape(-1, 3).astype(np.float32) + 0.5) / S
        centers = (offs * 2 - 1) * half            # [S^3, 3] subcenters
        h2 = half / S
        keep_any = np.zeros(vals.shape, bool)
        for c0 in centers:
            a = np.abs(rels - c0)
            lo = np.linalg.norm(np.maximum(a - h2, 0.0), axis=-1)
            hi = np.linalg.norm(a + h2, axis=-1)
            feas = vals & (lo * lo <= radius2)
            dom = (hi[:, None, :] < lo[:, :, None]) & feas[:, None, :]
            cnt = dom.sum(-1)
            keep_any |= feas & ~((shs >= 1) & (cnt >= K))
        k2 = keep_any.sum(-1)
        k2 = k2[k2 > 0]
        print(f"S={S} kept per voxel:",
              {q: float(np.percentile(k2, q))
               for q in (50, 75, 90, 95, 99, 100)})
        w2 = k2.astype(np.float64)
        for c2 in (16, 24, 32):
            print(f"  S={S} C2={c2}: fat vox "
                  f"{float((k2 > c2).mean()) * 100:.2f}%  mass "
                  f"{float(w2[k2 > c2].sum() / w2.sum()) * 100:.2f}%")


if __name__ == "__main__":
    main()
