"""Prototype: STAGED render pipeline — gathers take parameter indices.

probe_chain2 established that an XLA TPU gather whose indices are
computed in the same program lowers to a ~12ns/row serial form, while
the identical gather with parameter indices runs at HBM speed. This
prototype splits the render step at every index boundary:

  stageA: raygen arithmetic -> flat voxel index per sample  [R, D]
  stageB: qslot table gather (param idx) -> per-ray one-hot slot
          compaction (B slots) -> level-2 global compaction
  stageC: FAT candidate-row gather (param idx; rows carry xyz + packed
          bf16 attributes) -> masked iterative top-K -> one-hot attr
          extraction -> MLP tower -> composite over [R, B]

Validates against the existing single-program render on the same scene
(chair-scale sphere), then times both (chained, varied rays).
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
from pointnerf2studio_tpu.models.render import render_rays
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.compositing import ray_dist_from_sample_z
from pointnerf2studio_tpu.ops.query import neighbor_offsets

R = 32768
BP = 32            # per-ray slot budget (layout cap; semantics cap = SR)
CBUDGET = 8        # global average slots per ray
CAND = 64          # candidates per query voxel
AW = 40            # packed bf16 attr columns (39 used)
ROWW = 4 + AW // 2  # f32 words per candidate: xyz(3) + meta(1) + attrs(20)


def build_fat_cache(grid, cloud, kernel_size, max_q, chunk=32768):
    """Per-query-voxel candidate rows carrying xyz + PACKED ATTRIBUTES.

    Row layout [max_q, CAND * ROWW] f32:
      [x, y, z, bitcast(meta), 20 x bitcast(bf16 attr pair)]
    meta = pidx * 4 + shell (pidx < 2^28), or -1 for an empty slot.
    """
    offs_np, shells_np = neighbor_offsets(kernel_size)
    offsets = jnp.asarray(offs_np)
    shells = jnp.asarray(shells_np)
    V = offsets.shape[0]
    P = grid.occ_2_pnts.shape[1]
    C = min(CAND, V * P)
    gx, gy, gz = grid.dims
    nvox = gx * gy * gz
    dims_arr = jnp.array(grid.dims, jnp.int32)

    occ_flat = grid.coor_occ.reshape(-1)
    qslot = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    valid_q = occ_flat & (qslot < max_q)
    coor_2_qslot = jnp.where(valid_q, qslot, -1).reshape(grid.dims)
    q_flat = jnp.full((max_q,), nvox, jnp.int32).at[
        jnp.where(valid_q, qslot, max_q)
    ].set(jnp.arange(nvox, dtype=jnp.int32), mode="drop")
    q_coor = jnp.stack([q_flat // (gy * gz), (q_flat // gz) % gy,
                        q_flat % gz], -1)
    q_live = q_flat < nvox
    center_w = (grid.ranges_min
                + (q_coor.astype(jnp.float32) + 0.5) * grid.scaled_vsize)

    # packed attrs [N, AW] bf16 -> [N, AW/2] f32 bitcast
    attrs = jnp.concatenate(
        [cloud.points_embeding, cloud.points_conf, cloud.points_dir,
         cloud.points_color,
         jnp.zeros((cloud.capacity, 1), jnp.float32)], -1)   # pad to 40
    attrs_b = attrs.astype(jnp.bfloat16)
    attrs_p = jax.lax.bitcast_convert_type(
        attrs_b.reshape(cloud.capacity, AW // 2, 2), jnp.float32)

    xyz = cloud.xyz

    @jax.jit
    def one_chunk(args):
        qc, cw, live = args
        B = qc.shape[0]
        nb = qc[:, None, :] + offsets[None]
        inb = jnp.all((nb >= 0) & (nb < dims_arr), -1) & live[:, None]
        nbc = jnp.clip(nb, 0, dims_arr - 1)
        slot = grid.coor_2_occ[nbc[..., 0], nbc[..., 1], nbc[..., 2]]
        slot_ok = inb & (slot >= 0)
        cand = grid.occ_2_pnts[jnp.where(slot_ok, slot, 0)]      # [B, V, P]
        ok = slot_ok[..., None] & (cand >= 0)
        safe = jnp.clip(cand, 0, xyz.shape[0] - 1)
        cxyz = xyz[safe]
        d2c = jnp.sum((cxyz - cw[:, None, None, :]) ** 2, -1)
        sh = jnp.broadcast_to(shells[None, :, None], cand.shape)
        okf = ok.reshape(B, V * P)
        key = (sh.reshape(B, V * P).astype(jnp.float32) * 1e12
               + jnp.minimum(d2c.reshape(B, V * P), 1e9))
        key = jnp.where(okf, key, jnp.inf)
        _, top = jax.lax.top_k(-key, C)
        sel_ok = jnp.take_along_axis(okf, top, -1)
        sel_pidx = jnp.take_along_axis(cand.reshape(B, V * P), top, -1)
        sel_sh = jnp.take_along_axis(sh.reshape(B, V * P), top, -1)
        meta = jnp.where(sel_ok, sel_pidx * 4 + sel_sh, -1)
        sel_xyz = jnp.take_along_axis(
            cxyz.reshape(B, V * P, 3), top[..., None], 1)
        sel_attr = attrs_p[jnp.clip(sel_pidx, 0, xyz.shape[0] - 1)]
        pack = jnp.concatenate([
            sel_xyz,
            jax.lax.bitcast_convert_type(meta, jnp.float32)[..., None],
            sel_attr,
        ], -1)                                                   # [B, C, ROWW]
        return pack.reshape(B, C * ROWW)

    padded = (max_q + chunk - 1) // chunk * chunk
    pad = padded - max_q
    qc_p = jnp.pad(q_coor, ((0, pad), (0, 0)))
    cw_p = jnp.pad(center_w, ((0, pad), (0, 0)))
    lv_p = jnp.pad(q_live, (0, pad))
    packs = []
    for i in range(padded // chunk):
        s = slice(i * chunk, (i + 1) * chunk)
        packs.append(one_chunk((qc_p[s], cw_p[s], lv_p[s])))
    pack = jnp.concatenate(packs, 0)[:max_q]
    return coor_2_qslot, pack


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
    print(f"scene+thin cache: {time.time()-t0:.1f}s "
          f"n_q={int(scene.grid.cache.n_q)}", flush=True)
    grid, cloud, params = scene.grid, scene.cloud, scene.params
    n_q = int(scene.grid.cache.n_q)
    max_q = (n_q + 32767) // 32768 * 32768
    t0 = time.time()
    coor_2_qslot, cand_fat = build_fat_cache(
        grid, cloud, q.kernel_size, max_q)
    jax.block_until_ready(cand_fat)
    print(f"fat cache: {time.time()-t0:.1f}s rows={max_q} "
          f"bytes={cand_fat.nbytes/1e9:.2f}GB", flush=True)

    near, far = 1.1, 2.9
    campos, camrot = scene.campos, scene.camrotc2w
    D = q.z_depth_dim
    SR = q.SR
    M = R * CBUDGET
    K = q.K
    radius2 = q.radius_limit ** 2
    gx, gy, gz = grid.dims
    nvox = gx * gy * gz
    dims_arr = np.array(grid.dims, np.int32)
    rmin = np.asarray(grid.ranges_min)
    svs = np.asarray(grid.scaled_vsize)
    step_t = (far - near) / D
    DC = q.decode_chunk

    qslot_flat = coor_2_qslot.reshape(-1)

    # ---------------- stage A ----------------
    @jax.jit
    def stageA(raydirs):
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos = campos + raydirs[:, None, :] * t_mid[None, :, None]
        gc = jnp.floor((pos - rmin) / svs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        return jnp.where(inb, fidx, 0), inb

    # NOTE: out-of-bounds samples map to voxel 0 and are masked via inb.

    # ---------------- stage B ----------------
    @jax.jit
    def stageB(qslot_flat, fidx, inb):
        qs = qslot_flat[fidx]                                  # param idx
        qs = jnp.where(inb, qs, -1)
        mask = qs >= 0
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)     # 1-based
        keep = mask & (rank <= min(SR, BP))
        oh = (keep[:, :, None]
              & (rank[:, :, None] == jnp.arange(1, BP + 1))).astype(
                  jnp.bfloat16)                                # [R, D, BP]
        d_sel = jnp.einsum(
            "rdb,d->rb", oh, jnp.arange(D, dtype=jnp.bfloat16)
        ).astype(jnp.int32)                                    # exact < 256
        # qslot values reach ~2^18 — not bf16-exact, so f32 one-hot here
        q_sel = jnp.einsum(
            "rdb,rd->rb", oh.astype(jnp.float32),
            qs.astype(jnp.float32)).astype(jnp.int32)
        cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)         # [R]
        off = jnp.cumsum(cnt) - cnt
        sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
        dest = jnp.where(sloti < cnt[:, None], off[:, None] + sloti, M)
        rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
        sel_ray = jnp.zeros((M,), jnp.int32).at[dest].set(rayi, mode="drop")
        sel_d = jnp.zeros((M,), jnp.int32).at[dest].set(
            d_sel, mode="drop")
        sel_slot = jnp.zeros((M,), jnp.int32).at[dest].set(
            sloti, mode="drop")
        qslot_c = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.maximum(q_sel, 0), mode="drop")
        total = jnp.minimum(jnp.sum(cnt), M)
        mask_c = jnp.arange(M, dtype=jnp.int32) < total
        return qslot_c, sel_ray, sel_d, sel_slot, mask_c, cnt

    # ---------------- stage C ----------------
    num_shells = (q.kernel_size[0] + 1) // 2

    @jax.jit
    def stageC(cand_fat, qslot_c, sel_ray, sel_d, sel_slot, mask_c, cnt,
               raydirs, params, Rw2c):
        rows = cand_fat[qslot_c]                               # param idx
        rows3 = rows.reshape(M, CAND, ROWW)
        cxyz = rows3[..., :3]
        meta = jax.lax.bitcast_convert_type(rows3[..., 3], jnp.int32)
        attrs = jax.lax.bitcast_convert_type(
            rows3[..., 4:], jnp.bfloat16).reshape(M, CAND, AW)
        pidx_f = jnp.floor_divide(meta, 4).astype(jnp.float32)
        shell = (meta & 3).astype(jnp.int32)

        rd_sel = raydirs[sel_ray]                              # param idx
        t_mid = near + (sel_d.astype(jnp.float32) + 0.5) * step_t
        locs = campos + rd_sel * t_mid[:, None]                # [M, 3]

        d2 = jnp.sum((cxyz - locs[:, None, :]) ** 2, -1)       # [M, C]
        ok = (meta >= 0) & mask_c[:, None]
        if radius2 > 0:
            ok = ok & (d2 <= radius2)
        # layered shell eligibility
        eligible = shell == 0
        before = jnp.zeros((M, 1), jnp.int32)
        for s in range(1, num_shells):
            before = before + jnp.sum(
                (ok & (shell == s - 1)).astype(jnp.int32), -1, keepdims=True)
            eligible = eligible | ((shell == s) & (before < K))
        ok = ok & eligible

        # iterative top-K by distance; accumulate one-hot rows
        x = jnp.where(ok, d2, jnp.inf)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, CAND), 1)
        oh_list = []
        kmask = []
        for _ in range(K):
            am = jnp.argmin(x, axis=-1)
            hit = jnp.take_along_axis(x, am[:, None], -1)[:, 0] < jnp.inf
            ohk = (col == am[:, None]) & ok
            oh_list.append(ohk)
            kmask.append(hit)
            x = jnp.where(col == am[:, None], jnp.inf, x)
        oh8 = jnp.stack(oh_list, 1).astype(jnp.bfloat16)       # [M, K, C]
        pnt_mask = jnp.stack(kmask, 1)                         # [M, K]

        nxyz = jnp.einsum("mkc,mcd->mkd", oh8.astype(jnp.float32), cxyz)
        nattr = jnp.einsum("mkc,mca->mka", oh8, attrs)         # [M, K, AW]
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
            cfg.agg, emb, dists, pnt_mask, max(q.scaled_vsize))
        vd = jnp.sum(rd_sel[..., :, None] * Rw2c, axis=-2)

        def one(args):
            return decode_radiance(
                params, cfg.agg, neigh_emb=args[0], neigh_color=args[1],
                neigh_dir=args[2], dists=args[3], weight=args[4],
                pnt_mask=args[5], viewdirs=args[6], Rw2c=Rw2c)

        if DC and M > DC:
            n = (M + DC - 1) // DC
            pad = n * DC - M

            def cpad(x):
                return jnp.pad(
                    x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                ).reshape((n, DC) + x.shape[1:])

            mapped = [emb2, ncol, ndir, dists, weight, pnt_mask, vd]
            sig, rgb = jax.lax.map(one, tuple(cpad(x) for x in mapped))
            sig = sig.reshape(n * DC)[:M]
            rgb = rgb.reshape(n * DC, 3)[:M]
        else:
            sig, rgb = one([emb2, ncol, ndir, dists, weight, pnt_mask, vd])

        slot_ok = mask_c & jnp.any(pnt_mask, -1)
        sig = sig * slot_ok.astype(sig.dtype)
        dest2 = jnp.where(slot_ok, sel_ray * BP + sel_slot, R * BP)
        sig_rb = jnp.zeros((R * BP,), sig.dtype).at[dest2].set(
            sig, mode="drop").reshape(R, BP)
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
        bg = jnp.asarray(cfg.bg_color, jnp.float32)
        color = (jnp.sum(blend[..., None] * rgb_rb, -2)
                 + (1 - acc)[..., None] * bg)
        ray_found = jnp.any(valid_rb, -1)
        color = jnp.where(ray_found[:, None], color, bg)
        return color, ray_found, acc

    def staged_render(raydirs):
        fidx, inb = stageA(raydirs)
        qslot_c, sel_ray, sel_d, sel_slot, mask_c, cnt = stageB(
            qslot_flat, fidx, inb)
        return stageC(cand_fat, qslot_c, sel_ray, sel_d, sel_slot,
                      mask_c, cnt, raydirs, params, cloud.Rw2c)

    rd = camera_rays(campos, camrot, 64, 512, 320.0)
    raydirs = jnp.concatenate([rd] * (R // rd.shape[0] + 1))[:R]

    # ---- validation vs existing renderer ----
    nearj, farj = jnp.asarray(near), jnp.asarray(far)

    @jax.jit
    def full(raydirs, grid, cloud, params):
        o = render_rays(params, cloud, grid, campos, camrot, raydirs,
                        nearj, farj, cfg)
        return o.coarse_raycolor, o.ray_mask

    c_ref, m_ref = jax.block_until_ready(full(raydirs, grid, cloud, params))
    c_new, m_new, acc = jax.block_until_ready(staged_render(raydirs))
    c_ref, m_ref = np.asarray(c_ref), np.asarray(m_ref)
    c_new, m_new = np.asarray(c_new), np.asarray(m_new)
    print(f"mask agreement: {(m_ref == m_new).mean():.5f} "
          f"({m_ref.sum()} vs {m_new.sum()})")
    both = m_ref & m_new
    diff = np.abs(c_ref[both] - c_new[both])
    print(f"color |diff| mean {diff.mean():.5f} max {diff.max():.5f}")

    # ---- timing: chained, varied rays ----
    ray_vars = []
    for i in range(4):
        r = rd + 1e-4 * jax.random.normal(jax.random.PRNGKey(i), rd.shape)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        ray_vars.append(jax.block_until_ready(
            jnp.concatenate([r] * (R // r.shape[0] + 1))[:R]))

    def timeit(fn, n=8):
        jax.block_until_ready(fn(ray_vars[0]))
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(ray_vars[i % 4])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    t_old = timeit(lambda r: full(r, grid, cloud, params))
    print(f"single-program render: {t_old*1e3:7.1f} ms "
          f"-> {R/t_old:,.0f} rays/s")
    t_new = timeit(staged_render)
    print(f"staged render:         {t_new*1e3:7.1f} ms "
          f"-> {R/t_new:,.0f} rays/s")

    # per-stage
    fidx, inb = jax.block_until_ready(stageA(raydirs))
    tA = timeit(lambda r: stageA(r))
    outB = jax.block_until_ready(stageB(qslot_flat, fidx, inb))
    tB = timeit(lambda r: stageB(qslot_flat, fidx, inb))
    tC = timeit(lambda r: stageC(cand_fat, *outB, raydirs, params,
                                 cloud.Rw2c))
    print(f"stageA {tA*1e3:.1f} ms  stageB {tB*1e3:.1f} ms  "
          f"stageC {tC*1e3:.1f} ms")


if __name__ == "__main__":
    main()
