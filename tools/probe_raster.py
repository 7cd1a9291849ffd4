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


def parity_main():
    """Chip parity: raster emit table vs march_rays emit, directly."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from pointnerf2studio_tpu.models.fast_render import make_fast_scene
    from pointnerf2studio_tpu.ops.march import (
        build_march_table, march_rays, plan_march)
    from pointnerf2studio_tpu.ops.raster import (
        build_qvox, make_raster_program)

    cfg = bench_cfg()
    scene = make_chair_scene(n_points=558_000, cfg=cfg)
    H = W = 800
    focal = 1111.1
    q = cfg.query
    D = q.z_depth_dim
    rays = camera_rays(scene.campos, scene.camrotc2w, H, W, focal)
    tbl = np.asarray(jax.device_get(build_march_table(
        jnp.where(jnp.asarray(scene.grid.coor_occ).astype(bool), 0, -1))))
    cap = min(q.SR, q.ray_slot_budget, D)
    steps, buckets = plan_march(
        tbl, scene.grid.ranges_min, q.scaled_vsize, scene.campos,
        np.asarray(jax.device_get(rays)), float(scene.near),
        float(scene.far), D, cap, slack=1.35, chunk=H * W,
        fuel_margin=10)
    print(f"march steps {steps} buckets {buckets}", flush=True)
    cfg = _dc.replace(cfg, query=_dc.replace(
        q, march_steps=steps, march_buckets=buckets))
    cache, rmin, svs = make_fast_scene(
        cfg, scene.cloud, scene.grid, near=scene.near, far=scene.far,
        params=scene.params)
    step_t = jnp.float32((scene.far - scene.near) / D)
    dims = cache.coor_2_qslot.shape
    print(f"grid dims {dims} max_q {cache.rows.shape[0]} "
          f"n_q {int(cache.n_q)}", flush=True)
    m_emit, m_cnt, m_of = march_rays(
        cache.march_table.reshape(-1), jnp.array(dims, jnp.int32),
        dims[1], dims[2], rmin, svs, scene.campos, rays,
        jnp.float32(scene.near), jnp.float32(scene.far), step_t, D,
        cap, steps, buckets)
    m_cnt = np.asarray(jax.device_get(m_cnt))
    me = np.asarray(jax.device_get(m_emit))
    print(f"march: mc_overflow={int(m_of)} total={m_cnt.sum()}",
          flush=True)

    qvox = build_qvox(cache.coor_2_qslot, cache.rows.shape[0])
    t0 = time.time()
    prog = make_raster_program(
        H, W, focal, D, cap,
        classes=((3, 3, 2), (4, 4, 2), (4, 5, 2)),
        class_budgets=(400000, 262144, 32768),
        live_budget=3_670_016)
    emit, counters = prog(qvox, rmin, svs, scene.campos,
                          scene.camrotc2w, rays,
                          jnp.float32(scene.near), step_t,
                          jnp.float32(0.125))
    re = np.asarray(jax.device_get(emit))
    ctr = np.asarray(jax.device_get(counters))
    print(f"raster: counters={ctr.tolist()} (+{time.time()-t0:.0f}s)",
          flush=True)
    r_cnt = (re != 0).sum(-1)
    bad_cnt = np.nonzero(r_cnt != m_cnt)[0]
    print(f"cnt mismatches: {bad_cnt.size} rays", flush=True)
    if bad_cnt.size:
        for r in bad_cnt[:8]:
            print(f"  ray {r}: march cnt {m_cnt[r]} rows "
                  f"{[hex(v) for v in me[r][:m_cnt[r]]]} | raster cnt "
                  f"{r_cnt[r]} rows "
                  f"{[hex(v) for v in re[r][:r_cnt[r]]]}", flush=True)
    lanes = np.arange(cap)[None, :] < np.minimum(m_cnt, r_cnt)[:, None]
    vals_bad = int((me[lanes] != re[lanes]).sum())
    print(f"value mismatches on common lanes: {vals_bad}", flush=True)
    print("PARITY " + ("OK" if bad_cnt.size == 0 and vals_bad == 0
                       else "FAIL"), flush=True)

    if "--ab" not in sys.argv:
        return
    # ---- A/B: march-walk vs raster-premarch e2e frame renders,
    # alternating in ONE process on content-distinct permutations —
    # the only same-window comparison of the two front-ends
    from pointnerf2studio_tpu.models.fast_render import (
        fast_render_rays_jit)
    from tools.timing import congestion_sentinel

    chunk = 65536
    n_chunks = (H * W) // chunk
    rd0 = np.asarray(jax.device_get(rays), np.float32)
    # rb packing like the bench ('rb auto'): box-hitting rays only
    import dataclasses as _dc2
    from pointnerf2studio_tpu.models.fast_render import slab_hit_mask
    hits = slab_hit_mask(scene.campos, rays, scene.near, scene.far,
                         D, scene.grid.ranges_min, dims,
                         q.scaled_vsize)
    per_chunk = np.asarray(hits[:n_chunks * chunk]).reshape(
        n_chunks, chunk).sum(-1).max()
    rb = min(chunk, (int(per_chunk) + W + 1023) // 1024 * 1024)
    cfg_rb = _dc2.replace(cfg, query=_dc2.replace(
        cfg.query, ray_budget=rb))
    print(f"ab: ray_budget {rb}", flush=True)

    def one_pass(seed, use_raster):
        p = np.random.default_rng(seed).permutation(H * W)
        rays_t = jnp.asarray(rd0[p])
        ids_t = jnp.asarray(p.astype(np.int32))
        t0 = time.time()
        sums = []
        if use_raster:
            emit_t, ctr_t = prog(qvox, rmin, svs, scene.campos,
                                 scene.camrotc2w, rays,
                                 jnp.float32(scene.near), step_t,
                                 jnp.float32(seed + 0.5))
            sums.append(ctr_t.sum().astype(jnp.float32))
        for i in range(n_chunks):
            r_c = jax.lax.dynamic_slice_in_dim(rays_t, i * chunk, chunk)
            pm = None
            if use_raster:
                ids = jax.lax.dynamic_slice_in_dim(ids_t, i * chunk,
                                                   chunk)
                pm = (emit_t, ids)
            out = fast_render_rays_jit(
                scene.params, scene.cloud.Rw2c, cache, scene.campos,
                scene.camrotc2w, r_c, jnp.float32(scene.near),
                jnp.float32(scene.far), cfg_rb, rmin, svs,
                premarch=pm)
            sums.append(out.coarse_raycolor.astype(jnp.float32).sum())
        tot = float(jax.device_get(jnp.stack(sums).sum()))
        dt = time.time() - t0
        return dt, tot

    # compile both variants untimed
    one_pass(100, False)
    one_pass(101, True)
    for k in range(3):
        s0 = congestion_sentinel()
        dm, _ = one_pass(2 * k + 10, False)
        dr, _ = one_pass(2 * k + 11, True)
        s1 = congestion_sentinel()
        rays_n = n_chunks * chunk
        print(f"ab round {k}: march {dm*1000:.1f} ms "
              f"({rays_n/dm:,.0f} rays/s) | raster {dr*1000:.1f} ms "
              f"({rays_n/dr:,.0f} rays/s) | sentinels "
              f"{s0:.1f}/{s1:.1f}", flush=True)


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
    if "--stats" in sys.argv:
        main()
    else:
        parity_main()
