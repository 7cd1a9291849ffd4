"""Honest decomposition of the staged pipeline: each sub-piece timed as
its own jitted program on REAL scene data with 4 VARIED input sets.

proto_staged showed staging programs at index boundaries does NOT speed
things up (245 vs 271 ms) — so the cost is NOT (only) fused-index
gathers. Find where the 245ms actually lives.
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
from tools.proto_staged import build_fat_cache, R, BP, CBUDGET, CAND, AW, ROWW

from pointnerf2studio_tpu.models.aggregator import (
    aggregation_weight, decode_radiance)
from pointnerf2studio_tpu.ops.camera import w2pers


def timed_v(fn, variants, n=8):
    out = jax.block_until_ready(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = PointNerfConfig(
        query=QueryConfig(
            vsize=(0.004, 0.004, 0.004), vscale=(2, 2, 2),
            SR=80, K=8, P=12, max_o=700_000, z_depth_dim=180,
            compact_budget=CBUDGET, max_q=1_000_000),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    jax.block_until_ready(scene.grid.cache.cand_pack)
    grid, cloud, params = scene.grid, scene.cloud, scene.params
    n_q = int(scene.grid.cache.n_q)
    max_q = (n_q + 32767) // 32768 * 32768
    coor_2_qslot, cand_fat = build_fat_cache(
        grid, cloud, q.kernel_size, max_q)
    jax.block_until_ready(cand_fat)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    near, far = 1.1, 2.9
    campos, camrot = scene.campos, scene.camrotc2w
    D, SR, K = q.z_depth_dim, q.SR, q.K
    M = R * CBUDGET
    radius2 = q.radius_limit ** 2
    gx, gy, gz = grid.dims
    dims_arr = np.array(grid.dims, np.int32)
    rmin = np.asarray(grid.ranges_min)
    svs = np.asarray(grid.scaled_vsize)
    step_t = (far - near) / D
    DC = q.decode_chunk
    qslot_flat = coor_2_qslot.reshape(-1)
    num_shells = 2

    rd0 = camera_rays(campos, camrot, 64, 512, 320.0)
    ray_vars = []
    for i in range(4):
        r = rd0 + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd0.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]))

    base = timed_v(jax.jit(lambda x: x + 1), [(jnp.zeros((8, 128)) + i,)
                                              for i in range(4)])
    print(f"dispatch {base*1e3:.1f} ms", flush=True)

    # ---- stage A pieces ----
    @jax.jit
    def sA(raydirs):
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = campos + raydirs[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        return jnp.where(inb, fidx, 0), inb

    print(f"A raygen+fidx: {(timed_v(sA, [(r,) for r in ray_vars])-base)*1e3:7.1f} ms", flush=True)
    fidx_vars = [jax.block_until_ready(sA(r)) for r in ray_vars]

    # ---- stage B pieces ----
    @jax.jit
    def sB_gather(fidx, inb):
        qs = qslot_flat[fidx]
        return jnp.where(inb, qs, -1)

    print(f"B qslot gather: {(timed_v(sB_gather, fidx_vars)-base)*1e3:7.1f} ms", flush=True)
    qs_vars = [(jax.block_until_ready(sB_gather(*fv)),) for fv in fidx_vars]

    @jax.jit
    def sB_rank(qs):
        mask = qs >= 0
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        keep = mask & (rank <= min(SR, BP))
        return rank, keep

    print(f"B rank cumsum : {(timed_v(sB_rank, qs_vars)-base)*1e3:7.1f} ms", flush=True)
    rank_vars = [(jax.block_until_ready(sB_rank(*qv))) for qv in qs_vars]

    @jax.jit
    def sB_onehot(rank, keep):
        oh = (keep[:, :, None]
              & (rank[:, :, None] == jnp.arange(1, BP + 1))).astype(
                  jnp.bfloat16)
        d_sel = jnp.einsum("rdb,d->rb", oh,
                           jnp.arange(D, dtype=jnp.bfloat16)).astype(jnp.int32)
        return d_sel

    print(f"B onehot d_sel: {(timed_v(sB_onehot, rank_vars)-base)*1e3:7.1f} ms", flush=True)

    @jax.jit
    def sB_onehot32(rank, keep, qs):
        oh = (keep[:, :, None]
              & (rank[:, :, None] == jnp.arange(1, BP + 1))).astype(
                  jnp.float32)
        q_sel = jnp.einsum("rdb,rd->rb", oh,
                           qs.astype(jnp.float32)).astype(jnp.int32)
        return q_sel

    oh32_vars = [(r, k, qv[0]) for (r, k), qv in zip(rank_vars, qs_vars)]
    print(f"B onehot qsel f32: {(timed_v(sB_onehot32, oh32_vars)-base)*1e3:7.1f} ms", flush=True)

    @jax.jit
    def sB_lvl2(rank, keep):
        cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)
        off = jnp.cumsum(cnt) - cnt
        sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
        dest = jnp.where(sloti < cnt[:, None], off[:, None] + sloti, M)
        rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
        sel_ray = jnp.zeros((M,), jnp.int32).at[dest].set(rayi, mode="drop")
        return sel_ray, cnt

    print(f"B lvl2 scatter: {(timed_v(sB_lvl2, rank_vars)-base)*1e3:7.1f} ms", flush=True)

    # ---- stage C pieces (varied qslot_c from the real stageB) ----
    from tools.proto_staged import main as _unused  # noqa

    def run_stageB(fidx, inb):
        qs = jnp.where(inb, qslot_flat[fidx], -1)
        mask = qs >= 0
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        keep = mask & (rank <= min(SR, BP))
        ohb = (keep[:, :, None]
               & (rank[:, :, None] == jnp.arange(1, BP + 1)))
        d_sel = jnp.einsum("rdb,d->rb", ohb.astype(jnp.bfloat16),
                           jnp.arange(D, dtype=jnp.bfloat16)).astype(jnp.int32)
        q_sel = jnp.einsum("rdb,rd->rb", ohb.astype(jnp.float32),
                           qs.astype(jnp.float32)).astype(jnp.int32)
        cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)
        off = jnp.cumsum(cnt) - cnt
        sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
        dest = jnp.where(sloti < cnt[:, None], off[:, None] + sloti, M)
        rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
        sel_ray = jnp.zeros((M,), jnp.int32).at[dest].set(rayi, mode="drop")
        sel_d = jnp.zeros((M,), jnp.int32).at[dest].set(d_sel, mode="drop")
        sel_slot = jnp.zeros((M,), jnp.int32).at[dest].set(sloti, mode="drop")
        qslot_c = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.maximum(q_sel, 0), mode="drop")
        total = jnp.minimum(jnp.sum(cnt), M)
        mask_c = jnp.arange(M, dtype=jnp.int32) < total
        return qslot_c, sel_ray, sel_d, sel_slot, mask_c

    jB = jax.jit(run_stageB)
    B_vars = [jax.block_until_ready(jB(*fv)) for fv in fidx_vars]

    @jax.jit
    def sC_gather(qslot_c):
        return cand_fat[qslot_c]

    print(f"C fat gather  : {(timed_v(sC_gather, [(b[0],) for b in B_vars])-base)*1e3:7.1f} ms", flush=True)
    rows_vars = [jax.block_until_ready(sC_gather(b[0])) for b in B_vars]

    @jax.jit
    def sC_knn(rows, sel_ray, sel_d, mask_c, raydirs):
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        meta = jax.lax.bitcast_convert_type(rows3[..., 3], jnp.int32)
        shell = (meta & 3).astype(jnp.int32)
        rd_sel = raydirs[sel_ray]
        t_mid = near + (sel_d.astype(jnp.float32) + 0.5) * step_t
        locs = campos + rd_sel * t_mid[:, None]
        d2 = jnp.sum((cxyz - locs[:, None, :]) ** 2, -1)
        ok = (meta >= 0) & mask_c[:, None] & (d2 <= radius2)
        eligible = shell == 0
        before = jnp.sum((ok & (shell == 0)).astype(jnp.int32), -1,
                         keepdims=True)
        eligible = eligible | ((shell == 1) & (before < K))
        ok = ok & eligible
        x = jnp.where(ok, d2, jnp.inf)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, CAND), 1)
        ohs, hits = [], []
        for _ in range(K):
            am = jnp.argmin(x, axis=-1)
            hits.append(jnp.take_along_axis(x, am[:, None], -1)[:, 0] < jnp.inf)
            ohk = (col == am[:, None]) & ok
            ohs.append(ohk)
            x = jnp.where(col == am[:, None], jnp.inf, x)
        return (jnp.stack(ohs, 1), jnp.stack(hits, 1), locs, rd_sel)

    knn_in = [(rw, b[1], b[2], b[4], rv)
              for rw, b, rv in zip(rows_vars, B_vars, ray_vars)]
    print(f"C knn select  : {(timed_v(sC_knn, knn_in)-base)*1e3:7.1f} ms", flush=True)
    knn_vars = [jax.block_until_ready(sC_knn(*a)) for a in knn_in]

    @jax.jit
    def sC_extract(rows, oh8b, hits):
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        attrs = jax.lax.bitcast_convert_type(
            rows3[..., 4:], jnp.bfloat16).reshape(M, CAND, AW)
        oh8 = oh8b.astype(jnp.bfloat16)
        nxyz = jnp.einsum("mkc,mcd->mkd", oh8b.astype(jnp.float32), cxyz)
        nattr = jnp.einsum("mkc,mca->mka", oh8, attrs)
        return nxyz, nattr

    ex_in = [(rw, kv[0], kv[1]) for rw, kv in zip(rows_vars, knn_vars)]
    print(f"C extract     : {(timed_v(sC_extract, ex_in)-base)*1e3:7.1f} ms", flush=True)
    ex_vars = [jax.block_until_ready(sC_extract(*a)) for a in ex_in]

    @jax.jit
    def sC_mlp(nxyz, nattr, hits, locs, rd_sel):
        emb = nattr[..., :32].astype(jnp.float32)
        conf = nattr[..., 32].astype(jnp.float32)
        ndir = nattr[..., 33:36].astype(jnp.float32)
        ncol = nattr[..., 36:39].astype(jnp.float32)
        loc_pers = w2pers(locs, camrot, campos)
        nei_pers = w2pers(nxyz, camrot, campos)
        lp = loc_pers[..., None, :]
        pdist = jnp.stack(
            [nei_pers[..., 0] * nei_pers[..., 2] - lp[..., 0] * lp[..., 2],
             nei_pers[..., 1] * nei_pers[..., 2] - lp[..., 1] * lp[..., 2],
             nei_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([nxyz - locs[:, None, :], pdist], -1)
        weight, emb2 = aggregation_weight(
            cfg.agg, emb, dists, hits, max(q.scaled_vsize))
        vd = jnp.sum(rd_sel[..., :, None] * cloud.Rw2c, axis=-2)

        def one(args):
            return decode_radiance(
                params, cfg.agg, neigh_emb=args[0], neigh_color=args[1],
                neigh_dir=args[2], dists=args[3], weight=args[4],
                pnt_mask=args[5], viewdirs=args[6], Rw2c=cloud.Rw2c)

        n = (M + DC - 1) // DC
        pad = n * DC - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                           ).reshape((n, DC) + x.shape[1:])

        mapped = [emb2, ncol, ndir, dists, weight, hits, vd]
        sig, rgb = jax.lax.map(one, tuple(cpad(x) for x in mapped))
        return sig.reshape(-1)[:M], rgb.reshape(-1, 3)[:M]

    mlp_in = [(ev[0], ev[1], kv[1], kv[2], kv[3])
              for ev, kv in zip(ex_vars, knn_vars)]
    print(f"C mlp         : {(timed_v(sC_mlp, mlp_in)-base)*1e3:7.1f} ms", flush=True)

    # MLP without the lax.map chunking (regalloc workaround check)
    @jax.jit
    def sC_mlp_nochunk(nxyz, nattr, hits, locs, rd_sel):
        emb = nattr[..., :32].astype(jnp.float32)
        ndir = nattr[..., 33:36].astype(jnp.float32)
        ncol = nattr[..., 36:39].astype(jnp.float32)
        nei_pers = w2pers(nxyz, camrot, campos)
        lp = w2pers(locs, camrot, campos)[..., None, :]
        pdist = jnp.stack(
            [nei_pers[..., 0] * nei_pers[..., 2] - lp[..., 0] * lp[..., 2],
             nei_pers[..., 1] * nei_pers[..., 2] - lp[..., 1] * lp[..., 2],
             nei_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([nxyz - locs[:, None, :], pdist], -1)
        weight, emb2 = aggregation_weight(
            cfg.agg, emb, dists, hits, max(q.scaled_vsize))
        vd = jnp.sum(rd_sel[..., :, None] * cloud.Rw2c, axis=-2)
        return decode_radiance(
            params, cfg.agg, neigh_emb=emb2, neigh_color=ncol,
            neigh_dir=ndir, dists=dists, weight=weight,
            pnt_mask=hits, viewdirs=vd, Rw2c=cloud.Rw2c)

    try:
        t = timed_v(sC_mlp_nochunk, mlp_in)
        print(f"C mlp nochunk : {(t-base)*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"C mlp nochunk : FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
