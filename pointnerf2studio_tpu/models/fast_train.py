"""Differentiable fast TRAIN path: the eval fast-path structure with
gradients flowing into point attributes and the MLP tower.

The r1 fast path (models/fast_render.py) is eval-only: its fat cache
bakes bf16 point attributes into candidate rows, severing gradients.
Here the cache carries GEOMETRY ONLY — packed candidate ids + f32
offsets — and attributes are gathered differentiably from the cloud
AFTER K-NN selection ([M, K] packed row gathers whose backward is a
scatter-add into the attribute arrays). Selection (qslot lookup,
validity compaction, top-K) consists of integer comparisons and
argmax indices — non-differentiable by construction, so no
stop_gradient is needed and the autodiff graph stays thin.

Pipeline (identical selection semantics to models/render.py, which is
itself parity-tested against the reference):
  jittered raygen -> [R, D] qslot lookup -> per-ray one-hot slot
  compaction (cap SR) -> level-2 packed compaction to R*budget slots
  -> lax.map chunks (prefix-validity skip) of:
       geo-row gather -> layered K-NN top_k -> differentiable attr
       gather -> weights -> MLP decode
  -> packed scatter to [R, BP] slots -> compositing -> bg fill.

Reference counterpart: the same train forward as studio_model
get_outputs (pointnerf/nerfstudio/studio_model.py:263-399), trained by
Trainer.backward — reorganized for the TPU memory system.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.aggregator import (
    aggregation_weight, conf_gradient_clamp, decode_radiance)
from pointnerf2studio_tpu.models.fast_render import onehot_select_qd
from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
from pointnerf2studio_tpu.models.render import RenderOutput
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.compositing import (
    BLEND_FUNCTIONS, TONE_MAPS, ray_dist_from_sample_z)
from pointnerf2studio_tpu.ops.grid import PointGrid
from pointnerf2studio_tpu.ops.query import neighbor_offsets
from pointnerf2studio_tpu.ops.raygen import (
    near_far_disparity_linear_ray_generation,
    near_far_linear_ray_generation)

GEOW = 4      # f32 words per candidate: bitcast(meta), xyz_rel f32 x3


@struct.dataclass
class GeoCache:
    """Geometry-only candidate rows (see FatCache for the eval twin)."""
    coor_2_qslot: Optional[jnp.ndarray]  # [gx, gy, gz] int32, -1 = not
                                         # query; None in hash mode
    rows: jnp.ndarray              # [max_q, C*GEOW] f32
    n_q: jnp.ndarray               # [] int32
    # sparse front-end for huge-extent scenes (ops/hash_grid.py; same
    # contract as FatCache.hash_table/logical_dims)
    hash_table: Optional[jnp.ndarray] = None    # [B, S*5] int32
    logical_dims: Optional[jnp.ndarray] = None  # [3] int32
    # packed qslot + Chebyshev-distance field (ops/march.py) for the
    # jitter-aware train march; built when QueryConfig.march_steps is
    # set (dense grids only)
    march_table: Optional[jnp.ndarray] = None   # [gx, gy, gz] int32

    @property
    def cand(self) -> int:
        return self.rows.shape[1] // GEOW


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "max_q", "cand_cap", "chunk",
                              "cand_prune", "radius2", "knn_k"))
def build_geo_cache(
    grid: PointGrid,
    xyz: jnp.ndarray,
    kernel_size: Tuple[int, int, int],
    max_q: int,
    cand_cap: int = 64,
    chunk: int = 32768,
    cand_prune: bool = False,
    radius2: float = 0.0,
    knn_k: int = 8,
) -> GeoCache:
    """Per-query-voxel candidate geometry (rebuild on point moves)."""
    offs_np, shells_np = neighbor_offsets(kernel_size)
    offsets = jnp.asarray(offs_np)
    shells = jnp.asarray(shells_np)
    V = offsets.shape[0]
    P = grid.occ_2_pnts.shape[1]
    C = min(cand_cap, V * P)
    gx, gy, gz = grid.dims
    nvox = gx * gy * gz
    dims_arr = jnp.array(grid.dims, jnp.int32)
    N = xyz.shape[0]

    occ_flat = grid.coor_occ.reshape(-1)
    qslot = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    n_q = jnp.sum(occ_flat.astype(jnp.int32))
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
        cxyz = xyz[jnp.clip(cand, 0, N - 1)]
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
        sel_xyz = jnp.take_along_axis(
            cxyz.reshape(B, V * P, 3), top[..., None], 1)
        rel = sel_xyz - cw[:, None, :]                           # f32
        if cand_prune:
            # EXACT reduction — see build_fat_cache / ops/query.
            # candidate_keep_mask (the train rows keep f32 rel, so the
            # bounds use the stored value directly)
            from pointnerf2studio_tpu.ops.query import candidate_keep_mask
            num_shells_ = (kernel_size[0] + 1) // 2
            keep = candidate_keep_mask(
                rel, sel_sh, sel_ok, grid.scaled_vsize * 0.5, radius2,
                knn_k, max_shell=num_shells_ - 1)
            okey = jnp.where(keep, jnp.arange(C, dtype=jnp.int32), C + 1)
            _, pos = jax.lax.top_k(-okey, C)        # kept first, stable
            sel_ok = jnp.take_along_axis(keep, pos, -1)
            sel_pidx = jnp.take_along_axis(sel_pidx, pos, -1)
            sel_sh = jnp.take_along_axis(sel_sh, pos, -1)
            rel = jnp.take_along_axis(rel, pos[..., None], 1)
        meta = jnp.where(sel_ok, sel_pidx * 4 + sel_sh, -1)
        pack = jnp.concatenate([
            jax.lax.bitcast_convert_type(meta, jnp.float32)[..., None],
            rel,
        ], -1)
        return pack.reshape(B, C * GEOW)

    padded = (max_q + chunk - 1) // chunk * chunk
    pad = padded - max_q
    rows = jax.lax.map(one_chunk, (
        jnp.pad(q_coor, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(center_w, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(q_live, (0, pad)).reshape(-1, chunk)))

    return GeoCache(
        coor_2_qslot=coor_2_qslot,
        rows=rows.reshape(padded, C * GEOW)[:max_q],
        n_q=n_q)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "max_q", "cand_cap", "chunk"))
def build_geo_cache_hash(
    hg,                          # ops/hash_grid.HashGrid
    xyz: jnp.ndarray,
    kernel_size: Tuple[int, int, int],
    max_q: int,
    cand_cap: int = 64,
    chunk: int = 32768,
) -> GeoCache:
    """Geometry cache over a sparse HashGrid — rows identical to
    build_geo_cache (same qslot numbering and candidate ordering; see
    models/fast_render.build_fat_cache_hash for the argument)."""
    from pointnerf2studio_tpu.ops.hash_grid import W as HW
    from pointnerf2studio_tpu.ops.hash_grid import hash_lookup

    offs_np, shells_np = neighbor_offsets(kernel_size)
    offsets = jnp.asarray(offs_np)
    shells = jnp.asarray(shells_np)
    V = offsets.shape[0]
    P = hg.occ_2_pnts.shape[1]
    C = min(cand_cap, V * P)
    N = xyz.shape[0]

    tbl = hg.table.reshape(-1, HW)
    qv = tbl[:, 4]
    live = (tbl[:, 0] >= 0) & (qv >= 0) & (qv < max_q)
    dest = jnp.where(live, qv, max_q)
    q_coor = jnp.full((max_q, 3), -1, jnp.int32).at[
        dest[:, None],
        jnp.broadcast_to(jnp.arange(3), (tbl.shape[0], 3)),
    ].set(tbl[:, :3], mode="drop")
    q_live = jnp.zeros((max_q,), jnp.bool_).at[dest].set(
        live, mode="drop")
    center_w = (hg.ranges_min
                + (q_coor.astype(jnp.float32) + 0.5) * hg.scaled_vsize)

    def one_chunk(args):
        # identical packing tail to build_geo_cache's one_chunk; only
        # the neighbor occ lookup goes through the hash table
        qc, cw, live_c = args
        B = qc.shape[0]
        nb = qc[:, None, :] + offsets[None]
        _, slot, _ = hash_lookup(hg, nb)
        slot_ok = live_c[:, None] & (slot >= 0)
        cand = hg.occ_2_pnts[jnp.where(slot_ok, slot, 0)]    # [B, V, P]
        ok = slot_ok[..., None] & (cand >= 0)
        cxyz = xyz[jnp.clip(cand, 0, N - 1)]
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
        rel = sel_xyz - cw[:, None, :]                       # f32
        pack = jnp.concatenate([
            jax.lax.bitcast_convert_type(meta, jnp.float32)[..., None],
            rel,
        ], -1)
        return pack.reshape(B, C * GEOW)

    padded = (max_q + chunk - 1) // chunk * chunk
    pad = padded - max_q
    rows = jax.lax.map(one_chunk, (
        jnp.pad(q_coor, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(center_w, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(q_live, (0, pad)).reshape(-1, chunk)))

    return GeoCache(
        coor_2_qslot=None,
        rows=rows.reshape(padded, C * GEOW)[:max_q],
        n_q=hg.n_q,
        hash_table=hg.table,
        logical_dims=hg.dims,
    )


def make_hash_geo_scene(cfg: PointNerfConfig, cloud: NeuralPointCloud,
                        hg, max_q: Optional[int] = None):
    """Hash-backed geometry cache; drop-in for make_geo_scene on
    huge-extent scenes. Returns (geo, ranges_min, scaled_vsize)."""
    from pointnerf2studio_tpu.ops.grid import localize_tree_for_build
    cloud, hg = localize_tree_for_build((cloud, hg))
    if max_q is None:
        nq = int(jax.device_get(hg.n_q))
        max_q = (nq + 32767) // 32768 * 32768
    geo = build_geo_cache_hash(hg, cloud.xyz, cfg.query.kernel_size,
                               max_q, cfg.query.cand_cap)
    return geo, hg.ranges_min, hg.scaled_vsize


def fast_train_render(
    params,
    points: NeuralPointCloud,
    geo: GeoCache,
    campos: jnp.ndarray,
    camrotc2w: jnp.ndarray,
    raydirs: jnp.ndarray,           # [R, 3]
    near,
    far,
    cfg: PointNerfConfig,
    ranges_min: jnp.ndarray,
    scaled_vsize: jnp.ndarray,
    key: Optional[jax.Array] = None,
    training: bool = True,
    bg_ray_colors: Optional[jnp.ndarray] = None,
    jitter_u: Optional[jnp.ndarray] = None,   # [R, D] precomputed
                                              # jitter draws (rb path)
    ray_live: Optional[jnp.ndarray] = None,   # [R] bool real-ray rows
                                              # (rb packing pads with
                                              # dups of row 0; the
                                              # march skips them)
    debug_prefix: Optional[str] = None,       # perf probes only:
                                              # cumulative cutoffs
                                              # "raygen" | "front" |
                                              # "gather" | "knn" |
                                              # "attrs" | "decode" —
                                              # WRONG outputs, real
                                              # timing of the prefix
) -> RenderOutput:
    q = cfg.query
    R = raydirs.shape[0]
    D = q.z_depth_dim
    SR, K = q.SR, q.K
    BP = min(q.ray_slot_budget or SR, SR)
    budget = q.compact_budget if q.compact_budget > 0 else SR
    M = min(R * budget, R * D)
    radius2 = q.radius_limit ** 2
    CAND = geo.cand
    hash_mode = geo.hash_table is not None
    if hash_mode:
        # sparse front-end: logical bounds are a device value, qslot
        # lookups go through the bucket table (ops/hash_grid.py)
        dims_arr = geo.logical_dims
        dims_f = geo.logical_dims.astype(jnp.float32)
        gy = gz = None
        qslot_flat = None
    else:
        dims = geo.coor_2_qslot.shape
        gy, gz = dims[1], dims[2]
        dims_arr = jnp.array(dims, jnp.int32)
        dims_f = jnp.array(dims, jnp.float32)
        qslot_flat = geo.coor_2_qslot.reshape(-1)
    num_shells = (q.kernel_size[0] + 1) // 2

    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    jit_amount = cfg.train.jitter if training else 0.0

    if q.ray_budget > 0:
        # ---- ray packing (the eval fast path's rb reducer, made
        # differentiable): only box-hitting rays enter the front-end.
        # A miss ray has qs == -1 at every sample, renders exact
        # background (a constant — zero gradient), and occupies no
        # compacted slots, so packing the first RB hitting rays and
        # scattering per-ray outputs back is EXACT (forward AND
        # gradients) while rb_overflow == 0. Jitter is drawn on the
        # FULL ray set and gathered so packing is bit-exact vs the
        # unpacked path under the same key. Per-slot loss tensors
        # (conf/pnt_mask/weight) stay packed: the unpacked path's
        # compacted axis holds exactly the same hit-ray slots.
        import dataclasses as _dc
        RB = min(q.ray_budget, R)
        rmax = ranges_min + dims_f * scaled_vsize
        step_t = (far - near) / D
        safe = jnp.where(jnp.abs(raydirs) < 1e-9,
                         jnp.where(raydirs >= 0, 1e-9, -1e-9), raydirs)
        inv = 1.0 / safe
        ta = (ranges_min - campos) * inv
        tb = (rmax - campos) * inv
        t_enter = jnp.max(jnp.minimum(ta, tb), -1)
        t_exit = jnp.min(jnp.maximum(ta, tb), -1)
        # margins: jittered segment lengths cumsum, so the LAST
        # midpoint can overshoot far by up to jitter/2 * (far - near);
        # the first midpoint never precedes near. One extra sample
        # spacing on both ends for float safety.
        far_slack = jit_amount * 0.5 * (far - near) + step_t
        hit = ((t_exit + step_t >= t_enter)
               & (t_exit >= near - step_t)
               & (t_enter <= far + far_slack))
        iota = jnp.arange(R, dtype=jnp.int32)
        top = jax.lax.top_k(jnp.where(hit, -iota, -(R + 1)), RB)[0]
        valid = top >= -R
        ray_ids = jnp.where(valid, -top, 0)
        rb_overflow = jnp.maximum(jnp.sum(hit.astype(jnp.int32)) - RB, 0)

        u_full = None
        if jit_amount > 0.0 and key is not None and jitter_u is None:
            from pointnerf2studio_tpu.ops.raygen import jitter_uniform
            u_full = jitter_uniform(key, (R, D))
        elif jitter_u is not None:
            u_full = jitter_u
        if debug_prefix == "draw":
            # probe cutoff: the PRNG draw + rb slab/pack alone
            z = (jnp.zeros((), jnp.float32) if u_full is None
                 else u_full.sum())
            return RenderOutput(
                coarse_raycolor=jnp.broadcast_to(
                    z * 1e-6 + ray_ids.astype(jnp.float32).sum() * 1e-9,
                    (R, 3)),
                ray_mask=valid[:R] if valid.shape[0] >= R
                else jnp.zeros((R,), bool),
                acc=jnp.zeros((R,), jnp.float32),
                depth=jnp.zeros((R,), jnp.float32),
                conf_coefficient=jnp.zeros((1, K), jnp.float32),
                pnt_mask=jnp.zeros((1, K), bool),
                weight=jnp.zeros((1, K), jnp.float32))

        cfg0 = _dc.replace(cfg, query=_dc.replace(q, ray_budget=0))
        sub = fast_train_render(
            params, points, geo, campos, camrotc2w, raydirs[ray_ids],
            near, far, cfg0, ranges_min, scaled_vsize, key=key,
            training=training,
            bg_ray_colors=(None if bg_ray_colors is None
                           else bg_ray_colors[ray_ids]),
            jitter_u=(None if u_full is None else u_full[ray_ids]),
            ray_live=valid, debug_prefix=debug_prefix)

        ids_s = jnp.where(valid, ray_ids, R)    # padding rows drop
        bg = (bg_ray_colors if bg_ray_colors is not None
              else jnp.broadcast_to(
                  jnp.asarray(cfg.bg_color, jnp.float32), (R, 3)))
        color = bg.astype(jnp.float32).at[ids_s].set(
            sub.coarse_raycolor, mode="drop")
        ray_mask = jnp.zeros((R,), jnp.bool_).at[ids_s].set(
            sub.ray_mask, mode="drop")
        acc = jnp.zeros((R,), sub.acc.dtype).at[ids_s].set(
            sub.acc, mode="drop")
        depth = jnp.zeros((R,), sub.depth.dtype).at[ids_s].set(
            sub.depth, mode="drop")
        return RenderOutput(
            coarse_raycolor=color, ray_mask=ray_mask, acc=acc,
            depth=depth, conf_coefficient=sub.conf_coefficient,
            pnt_mask=sub.pnt_mask, weight=sub.weight,
            rb_overflow=rb_overflow, mc_overflow=sub.mc_overflow)

    raygen = (near_far_disparity_linear_ray_generation if cfg.inverse
              else near_far_linear_ray_generation)
    raypos, _, mid_ts = raygen(
        campos, raydirs, D, near=near, far=far,
        jitter=jit_amount, key=key, jitter_u=jitter_u)  # [R, D, 3]

    def _fake_output(color, mask=None):
        # shape-correct RenderOutput from a prefix reduction (probes)
        return RenderOutput(
            coarse_raycolor=jnp.broadcast_to(color, (R, 3)),
            ray_mask=(jnp.zeros((R,), bool) if mask is None else mask),
            acc=jnp.zeros((R,), jnp.float32),
            depth=jnp.zeros((R,), jnp.float32),
            conf_coefficient=jnp.zeros((M, K), jnp.float32),
            pnt_mask=jnp.zeros((M, K), bool),
            weight=jnp.zeros((M, K), jnp.float32))

    if debug_prefix == "mid":
        # draw + jitter cumsum (mid_ts) WITHOUT materializing the
        # [R, D, 3] raypos (DCE'd: nothing reads it on this cut)
        return _fake_output(
            jnp.broadcast_to(mid_ts.sum() * 1e-6, (3,)))
    if debug_prefix == "raygen":
        return _fake_output(raypos.sum((0, 1)) + mid_ts.sum() * 1e-6)

    from pointnerf2studio_tpu.models.fast_render import march_active
    use_march = (march_active(q) and not hash_mode
                 and geo.march_table is not None and not cfg.inverse)
    mc_overflow = None
    if use_march:
        # jitter-aware distance-field march (ops/march.py): tests each
        # sample's TRUE jittered position via the mid_ts table, so the
        # emitted (ray, d) set equals the dense path's first-cap valid
        # samples — the [R, D] qslot gather (the largest forward
        # stage at train scale) never materializes. Exact while
        # mc_overflow == 0; selection is integer so gradients are
        # untouched.
        if geo.rows.shape[0] > (1 << 22) - 2 or D > 512:
            raise ValueError("march packing needs max_q < 2^22 - 1 "
                             "and z_depth_dim <= 512")
        from pointnerf2studio_tpu.ops.march import march_rays
        from pointnerf2studio_tpu.ops.select import rank_gather_pack
        cap = min(SR, BP, D)
        step_t = (far - near) / D
        emit, cnt, mc_overflow = march_rays(
            geo.march_table.reshape(-1), dims_arr, gy, gz, ranges_min,
            scaled_vsize, campos, raydirs, near, far, step_t, D, cap,
            q.march_steps, q.march_buckets, t_tab=mid_ts,
            jitter=jit_amount, live=ray_live)
        ray_hit = cnt > 0
        iota_bp = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32), (R, cap))
        sel_ray, sel_slot, _, _, packed_m, mask_c = rank_gather_pack(
            emit, iota_bp, cnt, M)
        qslot_c = jnp.maximum((packed_m >> 9) - 1, 0)
        sel_d = packed_m & 511
        pack_end = jnp.cumsum(cnt)
        pack_cnt = cnt
    else:
        gc = jnp.floor(
            (raypos - ranges_min) / scaled_vsize).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        if hash_mode:
            from pointnerf2studio_tpu.ops.hash_grid import table_qslot
            qs = table_qslot(geo.hash_table, gc, inb)
        else:
            gcc = jnp.clip(gc, 0, dims_arr - 1)
            fidx = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
            qs = jnp.where(inb, qslot_flat[jnp.where(inb, fidx, 0)], -1)

        mask = qs >= 0
        ray_hit = jnp.any(mask, axis=-1)
    if use_march:
        pass                    # compaction produced above
    elif q.compact_mode == "topk":
        # top-k compaction + rank-gather pack shared with the eval
        # fast path (ops/select.py): selection via lax.top_k or the
        # Pallas row-compaction kernel, then [M]-row gathers instead
        # of the row-bound dest-scatter
        from pointnerf2studio_tpu.ops.select import (
            rank_gather_pack, select_first_cols)
        col_sel, cnt, _ = select_first_cols(
            qs, BP, min(SR, BP), q.select_mode)
        sel_ray, sel_slot, sel_d, _, qslot_c, mask_c = (
            rank_gather_pack(qs, col_sel, cnt, M))
        pack_end = jnp.cumsum(cnt)
        pack_cnt = cnt
    else:
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        keep = mask & (rank <= min(SR, BP))
        d_true = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (R, D))
        q_sel, d_sel = onehot_select_qd(keep, rank, qs, d_true, BP)
        cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)

        off = jnp.cumsum(cnt) - cnt
        sloti = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 1)
        dest = jnp.where(sloti < cnt[:, None], off[:, None] + sloti, M)
        rayi = jax.lax.broadcasted_iota(jnp.int32, (R, BP), 0)
        sel_ray = jnp.zeros((M,), jnp.int32).at[dest].set(rayi,
                                                          mode="drop")
        sel_d = jnp.zeros((M,), jnp.int32).at[dest].set(d_sel,
                                                        mode="drop")
        sel_slot = jnp.zeros((M,), jnp.int32).at[dest].set(sloti,
                                                           mode="drop")
        qslot_c = jnp.zeros((M,), jnp.int32).at[dest].set(
            jnp.maximum(q_sel, 0), mode="drop")
        total = jnp.minimum(jnp.sum(cnt), M)
        mask_c = jnp.arange(M, dtype=jnp.int32) < total

    if debug_prefix == "front":
        return _fake_output(
            jnp.stack([qslot_c.astype(jnp.float32).sum() * 1e-6,
                       sel_ray.astype(jnp.float32).sum() * 1e-6,
                       mask_c.astype(jnp.float32).sum() * 1e-6]),
            mask=ray_hit)

    # jittered sample positions for the compacted slots (gather, not
    # recompute: t is per-(ray, d) random)
    # gather the jittered t and RECOMPUTE positions per compacted slot
    # (campos + dir * t — the identical float expression raygen uses,
    # so values are bit-equal) instead of gathering rows of a
    # materialized [R, D, 3] raypos: in the march branch nothing else
    # reads raypos, so the 3x-wide table is never written (the r4c
    # prefix probes put the raygen phase at 11.1 of the 20.5 ms
    # forward)
    t_flat = mid_ts.reshape(R * D)
    sel_rd = jnp.minimum(sel_ray * D + sel_d, R * D - 1)

    attrs = jnp.concatenate(
        [points.points_embeding, points.points_conf, points.points_dir,
         points.points_color], -1)                              # [N, 39]
    CA = points.points_embeding.shape[-1]
    N = attrs.shape[0]

    CH = max(min(q.fast_chunk or 8192, M), min(2048, M))

    def chunk_body(args):
        qslot_cc, sel_ray_c, sel_rd_c, mask_cc = args
        Mc = qslot_cc.shape[0]
        rows3 = geo.rows[qslot_cc].reshape(Mc, CAND, GEOW)
        meta = jax.lax.bitcast_convert_type(rows3[..., 0], jnp.int32)
        shell = (meta & 3).astype(jnp.int32)
        rel = rows3[..., 1:]                                    # [Mc,C,3]
        if debug_prefix == "gather":
            z = rel.sum((-1, -2)) + meta.astype(jnp.float32).sum(-1)
            return (z, jnp.broadcast_to(z[:, None], (Mc, 3)), mask_cc,
                    jnp.zeros((Mc, K), jnp.float32),
                    jnp.zeros((Mc, K), bool),
                    jnp.zeros((Mc, K), jnp.float32))

        rd_sel0 = raydirs[sel_ray_c]
        locs = campos + rd_sel0 * t_flat[sel_rd_c][:, None]     # [Mc, 3]
        vox = jnp.floor((locs - ranges_min) / scaled_vsize)
        center = ranges_min + (vox + 0.5) * scaled_vsize
        cdelta = rel + (center - locs)[:, None, :]
        d2 = jnp.sum(cdelta ** 2, -1)
        ok = (meta >= 0) & mask_cc[:, None]
        if radius2 > 0:
            ok = ok & (d2 <= radius2)
        if q.layered_search and num_shells > 1:
            eligible = shell == 0
            before = jnp.zeros((Mc, 1), jnp.int32)
            for s in range(1, num_shells):
                before = before + jnp.sum(
                    (ok & (shell == s - 1)).astype(jnp.int32), -1,
                    keepdims=True)
                eligible = eligible | ((shell == s) & (before < K))
            ok = ok & eligible

        kkey = jnp.where(ok, d2, jnp.inf)
        neg_top, top_idx = jax.lax.top_k(-kkey, K)              # [Mc, K]
        pnt_mask = neg_top > -jnp.inf
        if debug_prefix == "knn":
            z = jnp.where(pnt_mask, -neg_top, 0.0).sum(-1)
            return (z, jnp.broadcast_to(z[:, None], (Mc, 3)),
                    jnp.any(pnt_mask, -1),
                    jnp.zeros((Mc, K), jnp.float32), pnt_mask,
                    jnp.zeros((Mc, K), jnp.float32))
        pidx = jnp.take_along_axis(meta >> 2, top_idx, -1)      # [Mc, K]
        nxyz = (jnp.take_along_axis(rel, top_idx[..., None], 1)
                + center[:, None, :])                           # [Mc,K,3]
        if training and cfg.train.remat == "selection":
            # cut the remat recompute graph here: the backward re-runs
            # only the [Mc, K] decode from these saved tensors, never
            # the [Mc, CAND] candidate stages (TrainConfig.remat)
            from jax.ad_checkpoint import checkpoint_name
            pnt_mask = checkpoint_name(pnt_mask, "knn_sel")
            pidx = checkpoint_name(pidx, "knn_sel")
            nxyz = checkpoint_name(nxyz, "knn_sel")

        # differentiable attribute gather (backward = scatter-add)
        vals = attrs[jnp.clip(pidx, 0, N - 1)]                  # [Mc,K,39]
        emb = vals[..., :CA]
        conf = vals[..., CA]
        ndir = vals[..., CA + 1:CA + 4]
        ncol = vals[..., CA + 4:CA + 7]

        if debug_prefix == "attrs":
            z = (vals.astype(jnp.float32).sum((-1, -2))
                 + nxyz.sum((-1, -2)))
            return (z, jnp.broadcast_to(z[:, None], (Mc, 3)),
                    jnp.any(pnt_mask, -1), conf, pnt_mask,
                    jnp.zeros((Mc, K), jnp.float32))

        rd_sel = rd_sel0
        nei_pers = w2pers(nxyz, camrotc2w, campos)
        lp = w2pers(locs, camrotc2w, campos)[..., None, :]
        pdist = jnp.stack(
            [nei_pers[..., 0] * nei_pers[..., 2] - lp[..., 0] * lp[..., 2],
             nei_pers[..., 1] * nei_pers[..., 2] - lp[..., 1] * lp[..., 2],
             nei_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([nxyz - locs[:, None, :], pdist], -1)
        weight, emb2 = aggregation_weight(
            cfg.agg, emb, dists, pnt_mask, max(q.scaled_vsize),
            params=params)
        conf_c = conf_gradient_clamp(conf) if training else conf
        if cfg.agg.conf_in_weight:
            weight = weight * conf_c

        if points.Rw2c.ndim == 3:
            raise NotImplementedError(
                "per-point Rw2c (edited scenes) uses the legacy path")
        vd = jnp.sum(rd_sel[..., :, None] * points.Rw2c, axis=-2)
        sig_c, rgb_c = decode_radiance(
            params, cfg.agg, neigh_emb=emb2, neigh_color=ncol,
            neigh_dir=ndir, dists=dists, weight=weight,
            pnt_mask=pnt_mask, viewdirs=vd, Rw2c=points.Rw2c)
        return (sig_c, rgb_c, jnp.any(pnt_mask, -1), conf_c,
                pnt_mask, weight)

    body = chunk_body
    if training and cfg.train.remat != "none":
        policy = (jax.checkpoint_policies.save_only_these_names(
            "knn_sel") if cfg.train.remat == "selection" else None)
        body = jax.checkpoint(chunk_body, policy=policy)

    def chunk_or_skip(args):
        CHc = args[0].shape[0]

        def skip(_):
            return (jnp.zeros((CHc,), jnp.float32),
                    jnp.zeros((CHc, 3), jnp.float32),
                    jnp.zeros((CHc,), jnp.bool_),
                    jnp.zeros((CHc, K), jnp.float32),
                    jnp.zeros((CHc, K), jnp.bool_),
                    jnp.zeros((CHc, K), jnp.float32))

        return jax.lax.cond(args[3][0], body, skip, args)

    if M > CH:
        n = (M + CH - 1) // CH
        pad = n * CH - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),)).reshape((n, CH))

        sig, rgb, found, conf_k, pm_k, w_k = jax.lax.map(
            chunk_or_skip, (cpad(qslot_c), cpad(sel_ray), cpad(sel_rd),
                            cpad(mask_c)))
        sig = sig.reshape(n * CH)[:M]
        rgb = rgb.reshape(n * CH, 3)[:M]
        found = found.reshape(n * CH)[:M]
        conf_k = conf_k.reshape(n * CH, K)[:M]
        pm_k = pm_k.reshape(n * CH, K)[:M]
        w_k = w_k.reshape(n * CH, K)[:M]
    else:
        sig, rgb, found, conf_k, pm_k, w_k = chunk_or_skip(
            (qslot_c, sel_ray, sel_rd, mask_c))

    if debug_prefix == "decode":
        return _fake_output(
            jnp.stack([sig.sum() * 1e-6, rgb.sum() * 1e-6,
                       found.astype(jnp.float32).sum() * 1e-6]),
            mask=ray_hit)

    # ---- composite ----
    slot_ok = mask_c & found
    sig = sig * slot_ok.astype(sig.dtype)
    bg = (bg_ray_colors if bg_ray_colors is not None
          else jnp.asarray(cfg.bg_color, jnp.float32))
    z_sel = w2pers(campos + raydirs[sel_ray] * t_flat[sel_rd][:, None],
                   camrotc2w, campos)[..., 2]
    if q.composite_mode == "packed" and q.compact_mode == "topk":
        # packed composite on the [M] compacted axis — no scatter-back
        # (ops/compositing.packed_alpha_composite); differentiable
        # (segmented scans are associative_scans)
        from pointnerf2studio_tpu.ops.compositing import (
            packed_alpha_composite)
        rgb_sum, acc, depth, ray_found = packed_alpha_composite(
            sig, rgb, z_sel, slot_ok, sel_ray, pack_end, pack_cnt,
            q.vsize[2], cfg.blend_func)
        color = rgb_sum + (1 - acc)[..., None] * bg
        color = TONE_MAPS[cfg.tonemap_func](color)
        ray_mask = ray_hit & ray_found
        color = jnp.where(ray_mask[:, None], color, bg)
        return RenderOutput(
            coarse_raycolor=color, ray_mask=ray_mask, acc=acc,
            depth=depth, conf_coefficient=conf_k,
            pnt_mask=pm_k & mask_c[:, None], weight=w_k,
            mc_overflow=mc_overflow)

    # ---- grid composite: scatter to [R, BP] slots ----
    dest2 = jnp.where(slot_ok, sel_ray * BP + sel_slot, R * BP)
    sig_rb = jnp.zeros((R * BP,), sig.dtype).at[dest2].set(
        sig, mode="drop").reshape(R, BP)
    rgb_rb = jnp.zeros((R * BP, 3), rgb.dtype).at[dest2].set(
        rgb, mode="drop").reshape(R, BP, 3)
    valid_rb = jnp.zeros((R * BP,), jnp.bool_).at[dest2].set(
        slot_ok, mode="drop").reshape(R, BP)
    z_rb = jnp.zeros((R * BP,), jnp.float32).at[dest2].set(
        z_sel, mode="drop").reshape(R, BP)

    z_masked = jnp.where(valid_rb, z_rb, -1e9)
    dist = ray_dist_from_sample_z(z_masked, valid_rb, q.vsize[2])
    opacity = 1.0 - jnp.exp(-sig_rb * dist)
    trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones((R, 1), trans.dtype), trans[:, :-1]], -1)
    blend = BLEND_FUNCTIONS[cfg.blend_func](opacity, trans)
    acc = jnp.sum(blend, -1)
    color = jnp.sum(blend[..., None] * rgb_rb, -2) + (1 - acc)[..., None] * bg
    color = TONE_MAPS[cfg.tonemap_func](color)
    depth = jnp.sum(blend * z_rb, -1)

    ray_found = jnp.any(valid_rb, -1)
    ray_mask = ray_hit & ray_found
    color = jnp.where(ray_mask[:, None], color, bg)
    return RenderOutput(
        coarse_raycolor=color, ray_mask=ray_mask, acc=acc, depth=depth,
        conf_coefficient=conf_k, pnt_mask=pm_k & mask_c[:, None],
        weight=w_k, mc_overflow=mc_overflow)


def make_geo_scene(cfg: PointNerfConfig, cloud: NeuralPointCloud,
                   grid: PointGrid, max_q: Optional[int] = None):
    """Build the geometry cache (rebuild on prune/grow/jitter)."""
    from pointnerf2studio_tpu.ops.grid import localize_tree_for_build
    cloud, grid = localize_tree_for_build((cloud, grid))
    if max_q is None:
        nq = int(jax.device_get(jnp.sum(
            grid.coor_occ.reshape(-1).astype(jnp.int32))))
        max_q = (nq + 32767) // 32768 * 32768
    # HBM feasibility fence (VERDICT r4 #3ii / weak #4): the r4
    # hole-wedge run RESOURCE_EXHAUSTed inside THIS rebuild mid-training
    # (logs_r4/queue_r4c.log:509-517) — a long run is exactly where an
    # unfenced structure rebuild hurts most. Training also holds the
    # full TrainState + both Adam moments, so the budget is tighter
    # than the eval-side fence's 60%.
    from pointnerf2studio_tpu.models.fast_render import fit_cand_cap
    cc = fit_cand_cap(max_q, cfg.query.cand_cap, row_words=GEOW,
                      what="train geo cache")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        print(f"geo rebuild: max_q={max_q} cand_cap={cc} "
              f"hbm_in_use={stats.get('bytes_in_use', 0) / 2**30:.2f} "
              f"GiB", flush=True)
    except Exception:
        pass

    def _build(cc_):
        return build_geo_cache(
            grid, cloud.xyz, cfg.query.kernel_size, max_q, cc_,
            cand_prune=cfg.query.cand_prune,
            radius2=float(cfg.query.radius_limit) ** 2,
            knn_k=cfg.query.K)

    # The capacity fence above cannot see bytes already in use (a
    # mid-training rebuild shares HBM with the train state, compiled
    # programs and whatever the previous eval left resident — the r4
    # AND r5 hole-wedge runs both RESOURCE_EXHAUSTED here at a scene
    # size the fence considers trivially feasible). Retry the build at
    # halved candidate widths on the ACTUAL OOM before giving up: a
    # degraded-width geo cache trains on (truncation semantics =
    # fit_cand_cap's), while a crash loses the whole run.
    geo = None
    while True:
        try:
            geo = _build(cc)
            break
        except Exception as e:  # jaxlib error types vary per backend
            if "RESOURCE_EXHAUSTED" not in str(e) or cc <= 8:
                raise
            cc //= 2
            print(f"geo rebuild OOM'd on device; retrying at "
                  f"cand_cap={cc} (degraded exactness: dense "
                  f"neighborhoods truncate to the {cc} nearest-to-"
                  f"center per shell)", flush=True)
    if cfg.query.cand_prune:
        C = geo.cand
        counts = jnp.sum((jax.lax.bitcast_convert_type(
            geo.rows.reshape(-1, C, GEOW)[..., 0], jnp.int32)
            >= 0).astype(jnp.int32), -1)
        c2 = int(jax.device_get(counts.max()))
        c2 = min(C, max(8, -(-c2 // 8) * 8))
        if c2 < C:
            geo = geo.replace(rows=geo.rows.reshape(
                -1, C, GEOW)[:, :c2].reshape(-1, c2 * GEOW))
        print(f"cand_prune(train): width {C} -> {c2}")
    if cfg.query.march_steps and geo.coor_2_qslot is not None:
        from pointnerf2studio_tpu.ops.march import build_march_table
        geo = geo.replace(
            march_table=build_march_table(geo.coor_2_qslot))
    return geo, grid.ranges_min, grid.scaled_vsize


def make_fast_train_step(cfg: PointNerfConfig):
    """Jitted train step through the fast differentiable path.

    Signature matches trainer.make_train_step with the grid argument
    replaced by (geo, ranges_min, scaled_vsize)."""
    import optax

    from pointnerf2studio_tpu.train.loss import compute_losses
    from pointnerf2studio_tpu.train.trainer import make_optimizers

    tx_f, tx_p = make_optimizers(cfg)

    @jax.jit
    def train_step(state, geo, ranges_min, scaled_vsize, campos,
                   camrotc2w, raydirs, gt_rgb, near, far, key,
                   bg_rgb=None, gt_mask=None):
        def loss_fn(params, point_trainables):
            points = state.points.with_trainable(point_trainables)
            out = fast_train_render(
                params, points, geo, campos, camrotc2w, raydirs,
                near, far, cfg, ranges_min, scaled_vsize, key=key,
                training=True, bg_ray_colors=bg_rgb)
            total, aux = compute_losses(out, gt_rgb, cfg.train,
                                        gt_mask=gt_mask)
            if out.rb_overflow is not None:
                # observability: nonzero = box-hitting rays (and their
                # gradients) were dropped this step — raise ray_budget
                aux = {**aux,
                       "rb_overflow": out.rb_overflow.astype(jnp.float32)}
            if out.mc_overflow is not None:
                # nonzero = the train march left rays unfinished this
                # step (samples + their gradients missing) — raise
                # march_steps / march_buckets
                aux = {**aux,
                       "mc_overflow": out.mc_overflow.astype(jnp.float32)}
            return total, aux

        (_, aux), (g_params, g_points) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.points.trainable())
        upd_f, opt_f = tx_f.update(g_params, state.opt_state_fields,
                                   state.params)
        params = optax.apply_updates(state.params, upd_f)
        pt = state.points.trainable()
        upd_p, opt_p = tx_p.update(g_points, state.opt_state_points, pt)
        points = state.points.with_trainable(optax.apply_updates(pt, upd_p))
        return state.replace(
            params=params, points=points,
            opt_state_fields=opt_f, opt_state_points=opt_p,
            step=state.step + 1), aux

    return train_step
