"""Stage-C honest decomposition on REAL scene data (synthetic-data
probes on this backend report phantom ~0 times; real-data varied-input
probes match end-to-end wall time). C pieces timed FIRST so a timeout
still yields the data. Thin candidate cache skipped (not needed)."""

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
            compact_budget=CBUDGET, use_cache=False),
        agg=AggregatorConfig(compute_dtype="bfloat16"),
    )
    q = cfg.query
    t0 = time.time()
    scene = make_sphere_scene(n_points=558_000, cfg=cfg)
    jax.block_until_ready(scene.grid.occ_2_pnts)
    grid, cloud, params = scene.grid, scene.cloud, scene.params

    # query-voxel table (normally part of the thin cache)
    occ_flat = grid.coor_occ.reshape(-1)
    qslot = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    n_q = int(jnp.sum(occ_flat.astype(jnp.int32)))
    max_q = (n_q + 32767) // 32768 * 32768
    coor_2_qslot, cand_fat = build_fat_cache(grid, cloud, q.kernel_size,
                                             max_q)
    cand_fat = jax.block_until_ready(cand_fat)
    qslot_flat = coor_2_qslot.reshape(-1)
    print(f"setup {time.time()-t0:.0f}s n_q={n_q}", flush=True)

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

    @jax.jit
    def stageAB(raydirs):
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = campos + raydirs[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)
        mask = qs >= 0
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        keep = mask & (rank <= min(SR, BP))
        ohb = keep[:, :, None] & (rank[:, :, None] == jnp.arange(1, BP + 1))
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
        sel_slot = jnp.zeros((M,), jnp.int32).at[dest].set(sloti,
                                                           mode="drop")
        qslot_c = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.maximum(q_sel, 0), mode="drop")
        total = jnp.minimum(jnp.sum(cnt), M)
        mask_c = jnp.arange(M, dtype=jnp.int32) < total
        return qslot_c, sel_ray, sel_d, sel_slot, mask_c

    B_vars = [jax.block_until_ready(stageAB(r)) for r in ray_vars]
    print("stageAB materialized", flush=True)

    # ---- C1: fat row gather ----
    @jax.jit
    def c_gather(qslot_c, cand_fat):
        return cand_fat[qslot_c]

    t = timed_v(c_gather, [(b[0], cand_fat) for b in B_vars]) - base
    print(f"C fat gather [262k,1536] 1.6GB: {t*1e3:7.1f} ms "
          f"{M*CAND*ROWW*4/max(t,1e-9)/1e9:5.0f} GB/s", flush=True)
    rows_vars = [jax.block_until_ready(c_gather(b[0], cand_fat))
                 for b in B_vars]

    # thin gather comparison: first 256 cols only (simulated thin rows)
    @jax.jit
    def c_gather_thin(qslot_c, cand_thin):
        return cand_thin[qslot_c]

    cand_thin = jax.block_until_ready(
        jnp.asarray(cand_fat[:, :CAND * 4]))
    t = timed_v(c_gather_thin, [(b[0], cand_thin) for b in B_vars]) - base
    print(f"C thin gather [262k,256] 268MB: {t*1e3:7.1f} ms", flush=True)

    # ---- C2: knn ----
    @jax.jit
    def c_knn(rows, sel_ray, sel_d, mask_c, raydirs):
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        meta = jax.lax.bitcast_convert_type(rows3[..., 3], jnp.int32)
        shell = (meta & 3).astype(jnp.int32)
        rd_sel = raydirs[sel_ray]
        t_mid = near + (sel_d.astype(jnp.float32) + 0.5) * step_t
        locs = campos + rd_sel * t_mid[:, None]
        d2 = jnp.sum((cxyz - locs[:, None, :]) ** 2, -1)
        ok = (meta >= 0) & mask_c[:, None] & (d2 <= radius2)
        before = jnp.sum((ok & (shell == 0)).astype(jnp.int32), -1,
                         keepdims=True)
        ok = ok & ((shell == 0) | ((shell == 1) & (before < K)))
        x = jnp.where(ok, d2, jnp.inf)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, CAND), 1)
        ohs, hits = [], []
        for _ in range(K):
            am = jnp.argmin(x, axis=-1)
            hits.append(jnp.take_along_axis(x, am[:, None], -1)[:, 0]
                        < jnp.inf)
            ohs.append((col == am[:, None]) & ok)
            x = jnp.where(col == am[:, None], jnp.inf, x)
        return jnp.stack(ohs, 1), jnp.stack(hits, 1), locs, rd_sel

    knn_in = [(rw, b[1], b[2], b[4], rv)
              for rw, b, rv in zip(rows_vars, B_vars, ray_vars)]
    t = timed_v(c_knn, knn_in) - base
    print(f"C knn 8x argmin               : {t*1e3:7.1f} ms", flush=True)
    knn_vars = [jax.block_until_ready(c_knn(*a)) for a in knn_in]

    # ---- C3: extract ----
    @jax.jit
    def c_extract(rows, oh8b):
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        attrs = jax.lax.bitcast_convert_type(
            rows3[..., 4:], jnp.bfloat16).reshape(M, CAND, AW)
        nxyz = jnp.einsum("mkc,mcd->mkd", oh8b.astype(jnp.float32), cxyz)
        nattr = jnp.einsum("mkc,mca->mka", oh8b.astype(jnp.bfloat16), attrs)
        return nxyz, nattr

    ex_in = [(rw, kv[0]) for rw, kv in zip(rows_vars, knn_vars)]
    t = timed_v(c_extract, ex_in) - base
    print(f"C extract onehot einsums      : {t*1e3:7.1f} ms", flush=True)
    ex_vars = [jax.block_until_ready(c_extract(*a)) for a in ex_in]

    # ---- C4: MLP ----
    def mlp_body(nxyz, nattr, hits, locs, rd_sel, chunked):
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

        def one(args):
            return decode_radiance(
                params, cfg.agg, neigh_emb=args[0], neigh_color=args[1],
                neigh_dir=args[2], dists=args[3], weight=args[4],
                pnt_mask=args[5], viewdirs=args[6], Rw2c=cloud.Rw2c)

        mapped = [emb2, ncol, ndir, dists, weight, hits, vd]
        if not chunked:
            return one(mapped)
        n = (M + DC - 1) // DC
        pad = n * DC - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                           ).reshape((n, DC) + x.shape[1:])

        sig, rgb = jax.lax.map(one, tuple(cpad(x) for x in mapped))
        return sig.reshape(-1)[:M], rgb.reshape(-1, 3)[:M]

    mlp_in = [(ev[0], ev[1], kv[1], kv[2], kv[3])
              for ev, kv in zip(ex_vars, knn_vars)]
    t = timed_v(jax.jit(lambda *a: mlp_body(*a, chunked=True)), mlp_in) - base
    print(f"C mlp chunked 131k            : {t*1e3:7.1f} ms", flush=True)
    try:
        t = timed_v(jax.jit(lambda *a: mlp_body(*a, chunked=False)),
                    mlp_in) - base
        print(f"C mlp unchunked               : {t*1e3:7.1f} ms", flush=True)
    except Exception as e:
        print(f"C mlp unchunked               : FAILED {type(e).__name__}",
              flush=True)

    # ---- C5: scatter + composite ----
    sig_vars = []
    fm = jax.jit(lambda *a: mlp_body(*a, chunked=True))
    for a in mlp_in:
        sig_vars.append(jax.block_until_ready(fm(*a)))

    from pointnerf2studio_tpu.ops.compositing import ray_dist_from_sample_z

    @jax.jit
    def c_comp(sig, rgb, sel_ray, sel_slot, sel_d, mask_c, hits, raydirs):
        slot_ok = mask_c & jnp.any(hits, -1)
        sigm = sig * slot_ok.astype(sig.dtype)
        dest2 = jnp.where(slot_ok, sel_ray * BP + sel_slot, R * BP)
        sig_rb = jnp.zeros((R * BP,), sig.dtype).at[dest2].set(
            sigm, mode="drop").reshape(R, BP)
        rgb_rb = jnp.zeros((R * BP, 3), rgb.dtype).at[dest2].set(
            rgb, mode="drop").reshape(R, BP, 3)
        valid_rb = jnp.zeros((R * BP,), jnp.bool_).at[dest2].set(
            slot_ok, mode="drop").reshape(R, BP)
        d_rb = jnp.zeros((R * BP,), jnp.int32).at[dest2].set(
            sel_d, mode="drop").reshape(R, BP)
        t_rb = near + (d_rb.astype(jnp.float32) + 0.5) * step_t
        pos_rb = campos + raydirs[:, None, :] * t_rb[..., None]
        z_rb = w2pers(pos_rb, camrot, campos)[..., 2]
        z_masked = jnp.where(valid_rb, z_rb, -1e9)
        dist = ray_dist_from_sample_z(z_masked, valid_rb, q.vsize[2])
        opacity = 1.0 - jnp.exp(-sig_rb * dist)
        trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones((R, 1), trans.dtype), trans[:, :-1]], -1)
        blend = opacity * trans
        acc = jnp.sum(blend, -1)
        color = jnp.sum(blend[..., None] * rgb_rb, -2) + (1 - acc)[..., None]
        return color

    comp_in = [(sv[0], sv[1], b[1], b[3], b[2], b[4], kv[1], rv)
               for sv, b, kv, rv in zip(sig_vars, B_vars, knn_vars,
                                        ray_vars)]
    t = timed_v(c_comp, comp_in) - base
    print(f"C scatter+composite [R,32]    : {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
