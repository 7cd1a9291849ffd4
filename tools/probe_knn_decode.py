"""Fine-grained stage2 (cache K-NN) breakdown + decode crash probe."""

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
            compact_budget=10, max_q=1_000_000),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    jax.block_until_ready(scene.grid.cache.cand_pack)
    print(f"scene build {time.time()-t0:.0f}s", flush=True)
    grid, cloud, params = scene.grid, scene.cloud, scene.params
    campos, camrot = scene.campos, scene.camrotc2w
    near, far = jnp.asarray(1.1), jnp.asarray(2.9)

    R = 32768
    rd = camera_rays(campos, camrot, 64, 512, 320.0)
    raydirs = jnp.concatenate([rd] * (R // rd.shape[0] + 1))[:R]
    M = R * q.compact_budget

    @jax.jit
    def stage1(grid, raydirs):
        raypos, _, _ = near_far_linear_ray_generation(
            campos, raydirs, q.z_depth_dim, near=near, far=far)
        qs = mask_raypos_qslot(grid, raypos)
        loc, sm, qss = compact_shading_locs(raypos, qs >= 0, q.SR, extra=qs)
        flat_m = sm.reshape(-1)
        rank = jnp.cumsum(flat_m.astype(jnp.int32)) - 1
        dest = jnp.where(flat_m & (rank < M), rank, M)
        sel = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.arange(flat_m.shape[0], dtype=jnp.int32), mode="drop")
        mask_c = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(rank[-1] + 1, M)
        return (loc.reshape(-1, 3)[sel], mask_c,
                qss.reshape(-1)[sel], sel)

    _, (locs, mask_c, qslot, sel) = timed(stage1, grid, raydirs)

    # --- stage2 breakdown ---
    @jax.jit
    def s2_gather(grid, qslot):
        return grid.cache.cand_pack[jnp.clip(qslot, 0)]

    t, rows = timed(s2_gather, grid, qslot)
    print(f"s2 row gather [M,320]: {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def s2_d2(grid, qslot, locs, mask_c):
        rows = grid.cache.cand_pack[jnp.clip(qslot, 0)]
        cxyz, pidx, shell = grid.cache.unpack(rows)
        ok = (qslot >= 0)[:, None] & mask_c[:, None] & (pidx >= 0)
        d2 = jnp.sum((cxyz - locs[:, None, :]) ** 2, axis=-1)
        return jnp.where(ok & (d2 <= q.radius_limit ** 2), d2, jnp.inf)

    t, key = timed(s2_d2, grid, qslot, locs, mask_c)
    print(f"s2 +unpack+d2:          {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def s2_topk(key):
        return jax.lax.top_k(-key, q.K)

    t, _ = timed(s2_topk, key)
    print(f"s2 top_k alone:         {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def s2_full(grid, qslot, locs, mask_c):
        return knn_from_cache(grid, qslot, locs, mask_c, q.K,
                              q.radius_limit ** 2, 2, True)

    t, pidx = timed(s2_full, grid, qslot, locs, mask_c)
    print(f"s2 full knn:            {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def s2_nolayer(grid, qslot, locs, mask_c):
        return knn_from_cache(grid, qslot, locs, mask_c, q.K,
                              q.radius_limit ** 2, 2, False)

    t, _ = timed(s2_nolayer, grid, qslot, locs, mask_c)
    print(f"s2 knn layered=False:   {t*1e3:.1f} ms", flush=True)

    # --- decode probe: find a compiling config ---
    neigh = jax.jit(lambda c, p: gather_neighbors(c, p))(cloud, pidx)
    jax.block_until_ready(neigh["xyz"])

    def try_decode(mm, dtype):
        import dataclasses
        agg = dataclasses.replace(cfg.agg, compute_dtype=dtype)

        @jax.jit
        def run(params, cloud, neigh, pidx, locs, sel):
            pm = pidx >= 0
            dists = jnp.concatenate(
                [neigh["xyz"] - locs[..., None, :],
                 neigh["xyz"] - locs[..., None, :]], -1)
            weight, emb = aggregation_weight(
                agg, neigh["embeding"], dists, pm, max(q.scaled_vsize))
            vd = raydirs[(sel // q.SR)]
            return decode_radiance(params, agg, emb, neigh["color"],
                                   neigh["dir"], dists, weight, pm, vd,
                                   cloud.Rw2c)

        sl = lambda x: jax.tree.map(lambda a: a[:mm], x)
        try:
            t, _ = timed(run, params, cloud, sl(neigh), sl(pidx),
                         locs[:mm], sel[:mm], n=3)
            print(f"decode M={mm} {dtype}: {t*1e3:.1f} ms OK", flush=True)
        except Exception as e:
            print(f"decode M={mm} {dtype}: FAIL {str(e)[:120]}", flush=True)

    for mm, dtype in ((M // 2, "bfloat16"),):
        try_decode(mm, dtype)
    probe_fused(scene, cfg, locs, mask_c, pidx, sel, raydirs)



def probe_fused(scene, cfg, locs, mask_c, pidx, sel, raydirs):
    """Compare XLA decode vs fused kernel at fixed M (append-mode probe)."""
    import dataclasses
    from pointnerf2studio_tpu.ops.encoding import positional_encoding
    from pointnerf2studio_tpu.ops.fused_decode import fused_decode

    q = cfg.query
    cloud, params = scene.cloud, scene.params
    neigh = jax.jit(lambda c, p: gather_neighbors(c, p))(cloud, pidx)
    jax.block_until_ready(neigh["xyz"])
    mm = 262144
    agg = dataclasses.replace(cfg.agg, compute_dtype="bfloat16")

    dists = jnp.concatenate(
        [neigh["xyz"] - locs[..., None, :],
         neigh["xyz"] - locs[..., None, :]], -1)[:mm]
    emb = neigh["embeding"][:mm]
    colorv = neigh["color"][:mm]
    ndir = neigh["dir"][:mm]
    pm = (pidx >= 0)[:mm]
    w = jnp.ones(pm.shape, jnp.float32) / 8.0
    vd = raydirs[(sel // q.SR)][:mm]

    @jax.jit
    def xla_decode(emb, colorv, ndir, dists, w, pm, vd):
        from pointnerf2studio_tpu.models.aggregator import decode_radiance
        return decode_radiance(params, agg, emb, colorv, ndir, dists, w,
                               pm, vd, cloud.Rw2c)

    t, _ = timed(xla_decode, emb, colorv, ndir, dists, w, pm, vd)
    print(f"decode XLA   M={mm}: {t*1e3:.1f} ms", flush=True)

    dir_enc = positional_encoding(vd, agg.num_viewdir_freqs, ori=True)
    ov, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]
    dirdot = jnp.concatenate(
        [ndir - ov[:, None, :],
         jnp.sum(ndir * ov[:, None, :], -1, keepdims=True)], -1)

    @jax.jit
    def fused(emb, dists, colorv, dirdot, wk, dir_pe):
        return fused_decode(params, emb, dists, colorv, dirdot, wk,
                            dir_pe, K=q.K,
                            num_feat_freqs=agg.num_feat_freqs,
                            num_dist_freqs=agg.num_dist_freqs)

    t, _ = timed(fused, emb, dists, colorv, dirdot, w * pm, dir_pe)
    print(f"decode FUSED M={mm}: {t*1e3:.1f} ms", flush=True)

    bf = jnp.bfloat16
    t, _ = timed(fused, emb.astype(bf), dists.astype(bf), colorv.astype(bf),
                 dirdot.astype(bf), (w * pm).astype(bf), dir_pe.astype(bf))
    print(f"decode FUSED bf16-in:  {t*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
