"""Diagnose host-sim vs device march divergence on the bench's rays.

The round-3 bench trips mc_overflow on chunk 1 (never chunk 0) with
~276-788 rays unfinished even at slack 1.35 / fuel +10 — too
systematic for float drift. This probe runs march_rays with ONE huge
fuel stage (no buckets, nothing to drop) on the exact bench chunks and
compares the DEVICE per-ray outcome (done, steps proxy via emit count
+ final d) against simulate_march's host counts, printing the
divergent rays' geometry (direction stats, slab spans) — enough to
tell grazing-ray slab instability from a packing/indexing bug.

Usage: python tools/probe_march_divergence.py [chunk_idx ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import (
    AggregatorConfig, PointNerfConfig, QueryConfig)
from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_chair_scene)
from pointnerf2studio_tpu.ops.march import (
    build_march_table, march_rays, simulate_march)


def main():
    if "--cpu" in sys.argv:      # reproduce host-vs-XLA divergence
        jax.config.update("jax_platforms", "cpu")   # locally
    chunks = [int(a) for a in sys.argv[1:]
              if not a.startswith("--")] or [0, 1]
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004,) * 3, vscale=(2, 2, 2), SR=80, K=8, P=12,
            max_o=700_000, z_depth_dim=400, compact_budget=8,
            ray_slot_budget=32, use_cache=False, fast_chunk=4096),
        agg=AggregatorConfig(compute_dtype="bfloat16"))
    scene = make_chair_scene(n_points=558_000, cfg=cfg)
    H = W = 800
    rays = camera_rays(scene.campos, scene.camrotc2w, H, W, 1111.1)
    perm = np.random.default_rng(0).permutation(rays.shape[0])
    rays_np = np.asarray(jax.device_get(rays), np.float32)[perm]

    occ = jnp.asarray(scene.grid.coor_occ)
    # the REAL qslot-packed table the bench's cache marches (the
    # planner's occupancy-only table has identical distance bits, but
    # match the executed program exactly)
    occ_flat = occ.reshape(-1)
    qslot = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    c2q = jnp.where(occ_flat.astype(bool), qslot, -1).reshape(occ.shape)
    tblj = build_march_table(c2q)
    tbl = np.asarray(jax.device_get(tblj))
    dims = tbl.shape
    gy, gz = dims[1], dims[2]
    dims_arr = jnp.array(dims, jnp.int32)
    near, far = float(scene.near), float(scene.far)
    D = cfg.query.z_depth_dim
    cap = 32
    step_t = (far - near) / D
    rmin = np.asarray(jax.device_get(scene.grid.ranges_min))
    svs = np.asarray(cfg.query.scaled_vsize, np.float32)
    cp = np.asarray(jax.device_get(scene.campos), np.float32)

    fuel = 2 * D + 16      # one stage, no buckets: nothing can drop

    @jax.jit
    def dev_march(rd):
        return march_rays(
            tblj.reshape(-1), dims_arr, gy, gz,
            jnp.asarray(rmin), jnp.asarray(svs), jnp.asarray(cp), rd,
            near, far, step_t, D, cap, (fuel,), ())

    for ci in chunks:
        sl = slice(ci * 65536, (ci + 1) * 65536)
        rd = rays_np[sl]
        su = simulate_march(tbl, rmin, svs, cp, rd, near, far, D, cap)
        emit, cnt, mc = dev_march(jnp.asarray(rd))
        mc = int(jax.device_get(mc))
        cnt = np.asarray(jax.device_get(cnt))
        print(f"chunk {ci}: host steps p50/p95/max = "
              f"{np.percentile(su[su > 0], 50):.0f}/"
              f"{np.percentile(su[su > 0], 95):.0f}/{su.max()}  "
              f"device unfinished at fuel {fuel}: {mc}", flush=True)
        # device emit count vs host emit count (the host sim tracks k)
        # — re-derive host k by re-simulating? cnt comparison instead:
        # rays whose device cnt deviates from a 2nd host pass
        su2 = simulate_march(tbl, rmin, svs, cp, rd, near, far, D, cap)
        assert np.array_equal(su, su2)
        if mc:
            print("  device has rays the host never predicted — "
                  "check grazing stats below")
        # grazing-ray population: tiny |dir| component along some axis
        g = (np.abs(rd) < 1e-3).any(-1)
        print(f"  rays with a near-zero dir component: {g.sum()}")
        # per-ray steps histogram tail
        print(f"  host rays needing > {int(su.max()) - 10} steps: "
              f"{(su > su.max() - 10).sum()}")

    # staged repro: the shipped plan on chunk 1 — count unfinished at
    # each successive fuel level to see HOW far past the host max the
    # device tail reaches
    from pointnerf2studio_tpu.ops.march import plan_march
    steps, buckets = plan_march(tbl, rmin, svs, cp,
                                rays_np[: 9 * 65536], near, far, D,
                                cap, slack=1.35, chunk=65536,
                                fuel_margin=10)
    print(f"plan: steps {steps} buckets {buckets}", flush=True)

    @jax.jit
    def dev_staged(rd):
        return march_rays(
            tblj.reshape(-1), dims_arr, gy, gz,
            jnp.asarray(rmin), jnp.asarray(svs), jnp.asarray(cp), rd,
            near, far, step_t, D, cap, steps, buckets)[2]

    for ci in chunks:
        sl = slice(ci * 65536, (ci + 1) * 65536)
        mc = int(jax.device_get(dev_staged(jnp.asarray(rays_np[sl]))))
        print(f"chunk {ci}: staged-plan mc_overflow = {mc}", flush=True)


if __name__ == "__main__":
    main()
