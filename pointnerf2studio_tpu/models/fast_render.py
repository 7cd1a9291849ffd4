"""Fast eval render path: fat candidate cache + one-hot compaction.

Measured-driven redesign of the render step for TPU v5e (the legacy
path lives in models/render.py and remains the training/prob-mode
path). Three findings shape it (tools/probe_decompose*.py, honest
varied-input timings at 32k rays, chair scale):

  1. XLA TPU gathers are BYTES-bound for fat rows (~200 GB/s) but
     ROW-overhead-bound for thin ones — so the candidate cache rows
     carry EVERYTHING per candidate (xyz f32, packed pidx+shell, all
     point attributes as bf16 pairs): ONE 6 KB-row gather replaces the
     thin-candidate gather + the per-neighbor attribute gather
     (8.1 ms vs 4.0 + 31.8 ms at bench scale).
  2. Per-ray one-hot-matmul slot compaction (rank == b einsums) is
     ~free on the MXU, vs ~30 ms for the flat cumsum+scatter over the
     [R*D] domain; compositing then runs on [R, B] slots instead of
     the full [R, D] sample grid.
  3. top_k once beats an 8-pass argmin loop for the K-of-C selection
     (42 ms of VPU/materialization traffic saved).

Per-ray slot budget B (`ray_slot_budget`): layout cap on shading slots
per ray. The semantic cap stays SR; rays with more than B valid samples
drop the tail (identical to SR when B >= SR — use that for parity
tests; B=32 measured indistinguishable on chair-scale scenes: mask
agreement 1.0, color diff = bf16 attr rounding).

Reference counterpart: the same pipeline as studio_model.get_outputs
(pointnerf/nerfstudio/studio_model.py:263-399) — reorganized around
the TPU memory system rather than translated.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.aggregator import (
    AggregatorParams, aggregation_weight, decode_radiance)
from pointnerf2studio_tpu.models.neural_points import NeuralPointCloud
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.compositing import (
    BLEND_FUNCTIONS, TONE_MAPS, ray_dist_from_sample_z)
from pointnerf2studio_tpu.ops.grid import PointGrid
from pointnerf2studio_tpu.ops.query import neighbor_offsets

PAYW = 44                # bf16 payload per candidate:
                          #   xyz_rel(3) + emb(32) + conf(1) + dir(3)
                          #   + color(3) + pad(2)
ROWW = 1 + PAYW // 2      # f32 words: bitcast(meta) + bf16 pairs


@struct.dataclass
class FatCache:
    """Per-query-voxel candidate rows carrying geometry + attributes.

    rows[max_q, C*ROWW] f32, per candidate:
      [bitcast(meta), 22 x bitcast(bf16 payload pair)]
    meta = pidx * 4 + shell, or -1 for an empty slot. Payload (bf16):
    xyz RELATIVE to the query-voxel center (range +-1.5 voxels, so the
    bf16 quantization is ~0.4% of a voxel), embedding(32), conf(1),
    dir(3), color(3), pad(2). All-bf16 payload means ONE one-hot
    einsum extracts everything (a separate f32 xyz einsum measured
    ~half the 43ms extract cost).

    Rebuild whenever points OR their attributes change (eval-time
    structure; training uses the thin cache + differentiable gathers).
    """
    coor_2_qslot: Optional[jnp.ndarray]  # [gx, gy, gz] int32, -1 = not
                                         # query; None in hash mode
    rows: jnp.ndarray              # [max_q, C*ROWW] f32
    n_q: jnp.ndarray               # [] int32
    # occupancy extra-dilated for the two-level sample test (see
    # QueryConfig.coarse_step); None when coarse masking is off
    coarse_occ: Optional[jnp.ndarray] = None   # [gx, gy, gz] bool
    # kernel-facing layout for knn_mode="fused" (ops/fused_select.py):
    # meta separated, payload channel-major; None in "xla" mode
    kmeta: Optional[jnp.ndarray] = None        # [max_q, C] int32
    kpay: Optional[jnp.ndarray] = None         # [max_q, PK, C] bf16
    # sparse front-end (ops/hash_grid.py) for huge-extent scenes whose
    # dense [gx, gy, gz] qslot table would not fit HBM: the bucketized
    # hash table replaces coor_2_qslot (one row gather either way) and
    # logical_dims carries the voxel bounds that are no longer a shape
    hash_table: Optional[jnp.ndarray] = None   # [B, S*5] int32
    logical_dims: Optional[jnp.ndarray] = None  # [3] int32
    # packed qslot + Chebyshev-distance field for the ray-march
    # front-end (ops/march.py); built when QueryConfig.march_steps is
    # set (dense grids only)
    march_table: Optional[jnp.ndarray] = None  # [gx, gy, gz] int32
    # per-point mlp_base layer-1 partial product (QueryConfig.
    # base_cache; models/aggregator.precompute_base_h) — gathered per
    # selected neighbor in the decode tail instead of re-encoding the
    # embedding per (slot, K) pair
    base_h: Optional[jnp.ndarray] = None       # [N, hidden] bf16
    # slim per-candidate selection view for extract_mode="krows":
    # words [bitcast(meta), bf16(x,y), bf16(z, emb0)] sliced from
    # `rows` at build — the d2/mask/shell/top_k stages gather 12 B per
    # candidate instead of the 92 B fat row; the K winners then gather
    # their payload rows directly from the flat [max_q*C, ROWW] view
    slim: Optional[jnp.ndarray] = None         # [max_q, C*3] f32

    @property
    def cand(self) -> int:
        return self.rows.shape[1] // ROWW


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "max_q", "cand_cap", "chunk",
                     "coarse_dilate", "layout", "cand_prune", "radius2",
                     "knn_k"))
def build_fat_cache(
    grid: PointGrid,
    cloud: NeuralPointCloud,
    kernel_size: Tuple[int, int, int],
    max_q: int,
    cand_cap: int = 64,
    chunk: int = 32768,
    coarse_dilate: int = 0,
    layout: str = "rows",
    cand_prune: bool = False,
    radius2: float = 0.0,
    knn_k: int = 8,
) -> FatCache:
    """Build the fat candidate cache (once per point/attr change).

    layout="rows" emits the packed f32 `rows` the XLA select path
    consumes; layout="fused" emits the kernel-facing (kmeta, kpay)
    pair for knn_mode="fused" DIRECTLY — never materializing `rows`
    (rows + kpay together at chair scale exceed v5e HBM; the packed
    layouts are ~92 vs ~100 bytes/candidate, so either alone fits
    wherever the other does). In fused layout `rows` is a 1-row
    placeholder kept only for the `cand` shape property."""
    offs_np, shells_np = neighbor_offsets(kernel_size)
    offsets = jnp.asarray(offs_np)
    shells = jnp.asarray(shells_np)
    V = offsets.shape[0]
    P = grid.occ_2_pnts.shape[1]
    C = min(cand_cap, V * P)
    gx, gy, gz = grid.dims
    nvox = gx * gy * gz
    dims_arr = jnp.array(grid.dims, jnp.int32)
    xyz = cloud.xyz
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

    attrs = jnp.concatenate(
        [cloud.points_embeding, cloud.points_conf, cloud.points_dir,
         cloud.points_color], -1).astype(jnp.bfloat16)         # [N, 39]

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
        # keep candidates ordered (shell, distance-to-center): layered
        # semantics survive cand_cap truncation
        key = (sh.reshape(B, V * P).astype(jnp.float32) * 1e12
               + jnp.minimum(d2c.reshape(B, V * P), 1e9))
        key = jnp.where(okf, key, jnp.inf)
        _, top = jax.lax.top_k(-key, C)
        sel_ok = jnp.take_along_axis(okf, top, -1)
        sel_pidx = jnp.take_along_axis(cand.reshape(B, V * P), top, -1)
        sel_sh = jnp.take_along_axis(sh.reshape(B, V * P), top, -1)
        sel_xyz = jnp.take_along_axis(
            cxyz.reshape(B, V * P, 3), top[..., None], 1)
        rel = (sel_xyz - cw[:, None, :]).astype(jnp.bfloat16)  # [B, C, 3]
        if cand_prune:
            # EXACT reduction (ops/query.candidate_keep_mask): bounds
            # are computed from the bf16-QUANTIZED rel — the value the
            # render's d2 actually uses — so lo/hi bracket the render
            # distances exactly. Kept candidates pack first in their
            # original order; make_*_scene slices the stored width to
            # the max kept count.
            from pointnerf2studio_tpu.ops.query import candidate_keep_mask
            num_shells_ = (kernel_size[0] + 1) // 2
            keep = candidate_keep_mask(
                rel.astype(jnp.float32), sel_sh, sel_ok,
                grid.scaled_vsize * 0.5, radius2, knn_k,
                max_shell=num_shells_ - 1)
            okey = jnp.where(keep, jnp.arange(C, dtype=jnp.int32), C + 1)
            _, pos = jax.lax.top_k(-okey, C)        # kept first, stable
            sel_ok = jnp.take_along_axis(keep, pos, -1)
            sel_pidx = jnp.take_along_axis(sel_pidx, pos, -1)
            sel_sh = jnp.take_along_axis(sel_sh, pos, -1)
            rel = jnp.take_along_axis(rel, pos[..., None], 1)
        meta = jnp.where(sel_ok, sel_pidx * 4 + sel_sh, -1)
        sel_attr = attrs[jnp.clip(sel_pidx, 0, N - 1)]         # [B, C, 39]
        payload = jnp.concatenate([
            rel, sel_attr,
            jnp.zeros((B, C, PAYW - 42), jnp.bfloat16)], -1)   # [B, C, 44]
        if layout == "fused":
            # kernel-facing: meta separate, payload channel-major and
            # padded to PK sublanes (same bytes pack_kernel_cache
            # would produce from the rows layout — bit-compat tested)
            from pointnerf2studio_tpu.ops.fused_select import PK
            pay = jnp.pad(payload, ((0, 0), (0, 0), (0, PK - PAYW)))
            return meta, jnp.transpose(pay, (0, 2, 1))
        payload_p = jax.lax.bitcast_convert_type(
            payload.reshape(B, C, PAYW // 2, 2), jnp.float32)
        pack = jnp.concatenate([
            jax.lax.bitcast_convert_type(meta, jnp.float32)[..., None],
            payload_p,
        ], -1)
        return pack.reshape(B, C * ROWW)

    padded = (max_q + chunk - 1) // chunk * chunk
    pad = padded - max_q
    map_args = (
        jnp.pad(q_coor, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(center_w, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(q_live, (0, pad)).reshape(-1, chunk))
    if layout == "fused":
        from pointnerf2studio_tpu.ops.fused_select import PK
        kmeta, kpay = jax.lax.map(one_chunk, map_args)
        kmeta = kmeta.reshape(padded, C)[:max_q]
        kpay = kpay.reshape(padded, PK, C)[:max_q]
        rows = jnp.zeros((1, C * ROWW), jnp.float32)
    else:
        rows = jax.lax.map(one_chunk, map_args)
        kmeta = kpay = None

    coarse_occ = None
    if coarse_dilate > 0:
        L = coarse_dilate
        coarse_occ = jax.lax.reduce_window(
            grid.coor_occ.astype(jnp.int32), 0, jax.lax.max,
            window_dimensions=(2 * L + 1,) * 3,
            window_strides=(1, 1, 1),
            padding=[(L, L)] * 3).astype(jnp.bool_)

    return FatCache(
        coor_2_qslot=coor_2_qslot,
        rows=(rows if layout == "fused"
              else rows.reshape(padded, C * ROWW)[:max_q]),
        n_q=n_q,
        coarse_occ=coarse_occ,
        kmeta=kmeta,
        kpay=kpay)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "max_q", "cand_cap", "chunk"))
def build_fat_cache_hash(
    hg,                         # ops/hash_grid.HashGrid
    cloud: NeuralPointCloud,
    kernel_size: Tuple[int, int, int],
    max_q: int,
    cand_cap: int = 64,
    chunk: int = 32768,
) -> FatCache:
    """Fat candidate cache over a sparse HashGrid (huge-extent scenes).

    Same rows as build_fat_cache — qslot numbering, candidate ordering
    and payload packing are identical (the hash build's (x, y, z)
    lexicographic qslots equal the dense row-major cumsum), so the two
    caches are interchangeable where both fit; only the voxel->qslot
    front-end lookup differs (table row gather vs dense gather).
    coarse_step and knn_mode="fused" stay dense-only for now.
    """
    from pointnerf2studio_tpu.ops.hash_grid import W as HW
    from pointnerf2studio_tpu.ops.hash_grid import hash_lookup

    offs_np, shells_np = neighbor_offsets(kernel_size)
    offsets = jnp.asarray(offs_np)
    shells = jnp.asarray(shells_np)
    V = offsets.shape[0]
    P = hg.occ_2_pnts.shape[1]
    C = min(cand_cap, V * P)
    xyz = cloud.xyz
    N = xyz.shape[0]

    # qslot -> voxel coords, scattered straight out of the bucket table
    tbl = hg.table.reshape(-1, HW)                       # [B*S, 5]
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

    attrs = jnp.concatenate(
        [cloud.points_embeding, cloud.points_conf, cloud.points_dir,
         cloud.points_color], -1).astype(jnp.bfloat16)   # [N, 39]

    def one_chunk(args):
        # identical packing tail to build_fat_cache's one_chunk; only
        # the neighbor-voxel occ lookup goes through the hash table
        qc, cw, live_c = args
        B = qc.shape[0]
        nb = qc[:, None, :] + offsets[None]              # [B, V, 3]
        _, slot, _ = hash_lookup(hg, nb)
        slot_ok = live_c[:, None] & (slot >= 0)
        cand = hg.occ_2_pnts[jnp.where(slot_ok, slot, 0)]  # [B, V, P]
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
        rel = (sel_xyz - cw[:, None, :]).astype(jnp.bfloat16)
        sel_attr = attrs[jnp.clip(sel_pidx, 0, N - 1)]
        payload = jnp.concatenate([
            rel, sel_attr,
            jnp.zeros((B, C, PAYW - 42), jnp.bfloat16)], -1)
        payload_p = jax.lax.bitcast_convert_type(
            payload.reshape(B, C, PAYW // 2, 2), jnp.float32)
        pack = jnp.concatenate([
            jax.lax.bitcast_convert_type(meta, jnp.float32)[..., None],
            payload_p,
        ], -1)
        return pack.reshape(B, C * ROWW)

    padded = (max_q + chunk - 1) // chunk * chunk
    pad = padded - max_q
    rows = jax.lax.map(one_chunk, (
        jnp.pad(q_coor, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(center_w, ((0, pad), (0, 0))).reshape(-1, chunk, 3),
        jnp.pad(q_live, (0, pad)).reshape(-1, chunk)))

    return FatCache(
        coor_2_qslot=None,
        rows=rows.reshape(padded, C * ROWW)[:max_q],
        n_q=hg.n_q,
        hash_table=hg.table,
        logical_dims=hg.dims,
    )


def fit_cand_cap(max_q: int, cand_cap: int, row_words: int = ROWW,
                 budget_bytes: Optional[int] = None,
                 what: str = "fat cache") -> int:
    """HBM feasibility fence for the candidate caches (the krows-fence
    pattern, VERDICT r3 #4): the ScanNet stress runs measured hash
    fat-cache builds at n_q ~3M x cand_cap 32 RESOURCE_EXHAUSTing the
    16 GB chip — and once hard-crashing the backend compiler — from a
    PUBLIC config with no guard. Degrades cand_cap (halving, floor 8)
    until rows + a build/working-set allowance fit the budget;
    actionable error when even 8 does not (-> the point-sharded slab
    cache over a "points" mesh axis, parallel/sharding.py).

    Budget default: 60% of the device's memory space (the render also
    needs the qslot/hash table, per-chunk intermediates, and the build
    holds one padded chunk of candidates), or 9.6 GB when the backend
    does not report memory."""
    if budget_bytes is None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            budget_bytes = int(stats.get("bytes_limit", 16 << 30) * 0.6)
        except Exception:
            budget_bytes = int((16 << 30) * 0.6)
    cc = cand_cap
    while cc > 8 and max_q * cc * row_words * 4 > budget_bytes:
        cc //= 2
    if max_q * cc * row_words * 4 > budget_bytes:
        raise ValueError(
            f"{what} infeasible: {max_q} query voxels x cand_cap {cc} "
            f"x {row_words * 4} B = "
            f"{max_q * cc * row_words * 4 / 2 ** 30:.1f} GiB exceeds the "
            f"{budget_bytes / 2 ** 30:.1f} GiB single-chip budget even at "
            f"the minimum candidate width; shard the cache over a "
            f"'points' mesh axis (parallel/sharding."
            f"make_sharded_fast_render_pt + shard_fat_cache) or coarsen "
            f"vsize/vox_res")
    if cc != cand_cap:
        print(f"{what}: cand_cap {cand_cap} -> {cc} to fit "
              f"{max_q} query voxels in "
              f"{budget_bytes / 2 ** 30:.1f} GiB (degraded EXACTNESS: "
              f"dense neighborhoods truncate to the {cc} nearest-to-"
              f"center per shell)")
    return cc


def make_hash_fast_scene(cfg: PointNerfConfig, cloud: NeuralPointCloud,
                         hg, max_q: Optional[int] = None,
                         params: Optional[AggregatorParams] = None):
    """Build the hash-backed fat cache; returns (cache, rmin, svs) —
    drop-in for make_fast_scene on huge-extent scenes."""
    from pointnerf2studio_tpu.ops.grid import localize_tree_for_build
    cloud, hg = localize_tree_for_build((cloud, hg))
    if max_q is None:
        nq = int(jax.device_get(hg.n_q))
        max_q = (nq + 32767) // 32768 * 32768
    if cfg.query.coarse_step > 1:
        raise NotImplementedError(
            "coarse_step needs a dense coarse-occupancy grid; off in "
            "hash mode")
    if cfg.query.knn_mode == "fused":
        raise NotImplementedError("knn_mode='fused' is dense-only")
    # Compiler-crash fence, separate from the HBM fence: the axon TPU
    # backend compiler hard-crashes (remote_compile HTTP 500) on hash
    # fat-cache BUILD programs past ~3M query voxels at EVERY candidate
    # width (r4 stress run: n_q=3.07M crashed at cand_cap 32/16/8 with
    # the 8.4/4.2/2.1 GiB rows all within budget). Env-overridable for
    # bisecting on other backends.
    import os as _os
    maxq_fence = int(_os.environ.get("PN2S_HASH_BUILD_MAXQ", 3_000_000))
    if max_q > maxq_fence and jax.default_backend() == "tpu":
        raise ValueError(
            f"hash fat-cache build at {max_q} query voxels exceeds the "
            f"TPU backend compiler's measured crash envelope "
            f"(~{maxq_fence}; r4 stress: HTTP 500 at n_q=3.07M for all "
            f"candidate widths). Coarsen vsize (x2 cuts n_q ~4-8x) or "
            f"voxel-downsample the cloud (vox_res), or shard the cache "
            f"over a 'points' mesh axis. PN2S_HASH_BUILD_MAXQ overrides "
            f"the fence for compiler bisects.")
    cc = fit_cand_cap(max_q, cfg.query.cand_cap,
                      what="hash fat cache")
    cache = build_fat_cache_hash(hg, cloud, cfg.query.kernel_size,
                                 max_q, cc)
    if cfg.query.base_cache:
        cache = cache.replace(base_h=_build_base_h(cfg, cloud, params))
    if cfg.query.extract_mode == "krows":
        cache = cache.replace(slim=_build_slim(cache))
    return cache, hg.ranges_min, hg.scaled_vsize


def onehot_select_qd(keep, rank, qs, d_true, BP):
    """Compact per-ray (qslot, d) pairs into the first BP slots via
    one-hot MXU einsums.

    qslot ids reach ~2^20 and d reaches D; TPU matmuls truncate f32
    operands to bf16 (integers exact only to 256), so extract base-128
    DIGITS — each digit is bf16-exact, and the one-hot guarantees a
    single nonzero product per output so the f32 accumulation is exact
    (the same hazard render.py's d_lo/d_hi split guards against).
    Exact for qs < 2^21, d < 2^14.
    """
    ohb = keep[:, :, None] & (rank[:, :, None] == jnp.arange(1, BP + 1))
    oh16 = ohb.astype(jnp.bfloat16)
    qsf = jnp.maximum(qs, 0)
    digits = jnp.stack(
        [qsf % 128, (qsf // 128) % 128, qsf // 16384,
         d_true % 128, d_true // 128], -1).astype(jnp.bfloat16)
    sel2 = jnp.einsum("rdb,rdt->rbt", oh16, digits).astype(jnp.int32)
    q_sel = sel2[..., 0] + sel2[..., 1] * 128 + sel2[..., 2] * 16384
    d_sel = sel2[..., 3] + sel2[..., 4] * 128
    return q_sel, d_sel


@struct.dataclass
class FastRenderOutput:
    coarse_raycolor: jnp.ndarray    # [R, 3]
    ray_mask: jnp.ndarray           # [R]
    acc: jnp.ndarray                # [R]
    depth: jnp.ndarray              # [R]
    # coarse_step only: number of TRUE positive windows dropped by the
    # coarse_win_budget / coarse_win_global layout caps this batch.
    # Nonzero means the two-level masking was NOT exact (samples were
    # lost) — raise the budgets. None when coarse masking is off.
    win_overflow: Optional[jnp.ndarray] = None
    # depth_window only: number of in-box samples past the window end
    # this batch (nonzero = the static window was too short; raise
    # QueryConfig.depth_window). None when the clip is off.
    dw_overflow: Optional[jnp.ndarray] = None
    # ray_budget only: number of box-hitting rays dropped because the
    # batch had more than QueryConfig.ray_budget of them (nonzero =
    # raise the budget). None when ray packing is off.
    rb_overflow: Optional[jnp.ndarray] = None
    # compact_budget only: number of valid samples dropped because the
    # batch had more than M = R * compact_budget of them (nonzero =
    # raise the budget). None when M cannot overflow (budget >= the
    # per-ray column cap).
    cb_overflow: Optional[jnp.ndarray] = None
    # march front-end only: rays whose in-box span was not fully
    # tested within the staged fuel/buckets (nonzero = raise
    # QueryConfig.march_steps / march_buckets — samples may be
    # missing). None when the march is off.
    mc_overflow: Optional[jnp.ndarray] = None
    # decode_mode="pair" only: valid (slot, K) pairs dropped because a
    # chunk held more than Mc * pair_budget of them (nonzero = raise
    # QueryConfig.pair_budget — neighbors were lost). None when the
    # budget cannot overflow (pair_budget >= K) or pair mode is off.
    pb_overflow: Optional[jnp.ndarray] = None
    # Occupancy counter (scalar int32): number of VALID compacted
    # sample slots this batch (the rows the decode tower actually
    # shades). Feeds the bench's analytic flops-per-ray so the MFU of
    # record derives from measured occupancy instead of a hardcoded
    # constant (utils/flops.py). None only on aggregation paths that
    # predate the counter (frame tiers).
    n_valid_slots: Optional[jnp.ndarray] = None
    # prob-mode outputs (point growing, prob=True only — the fast
    # twin of models/render.py's prob path; reference anchor:
    # neural_points_volumetric_model.py:331-362). Per ray: the
    # max-opacity shading location + conf-weighted neighbor averages
    # there. None unless prob=True.
    ray_max_shading_opacity: Optional[jnp.ndarray] = None   # [R]
    ray_max_sample_loc_w: Optional[jnp.ndarray] = None      # [R, 3]
    shading_avg_color: Optional[jnp.ndarray] = None         # [R, 3]
    shading_avg_dir: Optional[jnp.ndarray] = None           # [R, 3]
    shading_avg_conf: Optional[jnp.ndarray] = None          # [R, 1]
    shading_avg_embedding: Optional[jnp.ndarray] = None     # [R, F]


def counter_presence(q):
    """(has_win, has_dw, has_rb, has_cb, has_mc, has_pb) for
    fast_render_rays under this query config — mirrors the branch
    structure so shard_map out_specs can be declared without tracing."""
    pb = has_pb_overflow(q)
    if q.span_tiers:
        # the tiered branch always emits dw + rb (summed over tiers);
        # cb follows the per-tier scaled budgets; win only with coarse
        import dataclasses as _dc
        has_cb = False
        if q.compact_budget > 0:
            widths = tuple(int(w) for w in q.span_tiers)
            budgets = tuple(int(b) for b in q.span_tier_budgets)
            w_bar = (sum(b * wj for b, wj in zip(budgets, widths))
                     / max(sum(budgets), 1))
            for w in widths:
                cb_i = max(1, -(-q.compact_budget * w // int(w_bar)))
                cb_i = min(cb_i, q.SR,
                           q.ray_slot_budget or min(q.SR, 32), w)
                sub = _dc.replace(q, span_tiers=(),
                                  span_tier_budgets=(), ray_budget=0,
                                  depth_window=min(w, q.z_depth_dim),
                                  compact_budget=cb_i)
                has_cb = has_cb or has_cb_overflow(sub)
        return (q.coarse_step > 1, True, True, has_cb, False, pb)
    if march_active(q):
        return (False, False, q.ray_budget > 0, has_cb_overflow(q),
                True, pb)
    has_win = q.coarse_step > 1
    has_dw = q.depth_window > 0 and (
        not has_win or q.depth_window < q.z_depth_dim)
    has_rb = q.ray_budget > 0
    return has_win, has_dw, has_rb, has_cb_overflow(q), False, pb


def march_active(q) -> bool:
    """Whether this query config routes the front-end through the
    distance-field ray march (ops/march.py). Static (config-only) so
    shard_map out_specs can be declared without tracing; the runtime
    RAISES if a march config meets an ineligible cache (hash grid /
    missing table) instead of silently falling back."""
    return (len(q.march_steps) > 0 and not q.span_tiers
            and q.coarse_step <= 1 and q.compact_mode == "topk")


def has_pb_overflow(q) -> bool:
    """Whether fast_render_rays emits a pb_overflow counter for this
    query config (decode_mode="pair" with a pair budget that can drop
    valid (slot, K) pairs). Static, mirrors chunk_pipeline."""
    if q.decode_mode != "pair":
        return False
    PB = q.pair_budget if q.pair_budget > 0 else q.K
    return PB < q.K


def has_cb_overflow(q) -> bool:
    """Whether fast_render_rays emits a cb_overflow counter for this
    query config (i.e. the M = R*compact_budget cap can drop samples).
    Mirrors the Dax branch structure so shard_map out_specs can be
    declared without tracing."""
    D = q.z_depth_dim
    SR = q.SR
    BP = q.ray_slot_budget or min(SR, 32)
    budget = q.compact_budget if q.compact_budget > 0 else SR
    if march_active(q):
        # the march emits up to min(SR, BP) samples over the full D
        Dax = D
    elif q.coarse_step > 1:
        S = q.coarse_step
        DS = -(-D // S)
        BW = min(q.coarse_win_budget, DS)
        if q.depth_window > 0:
            BW = min(BW, min(DS, q.depth_window // S + 1))
        Dax = BW * S
    elif q.depth_window > 0:
        Dax = min(q.depth_window, D)
    else:
        Dax = D
    return min(budget, D) < min(SR, BP, Dax)


def fast_render_rays(
    params: AggregatorParams,
    Rw2c: jnp.ndarray,              # [3, 3] global rotation
    cache: FatCache,
    campos: jnp.ndarray,
    camrotc2w: jnp.ndarray,
    raydirs: jnp.ndarray,           # [R, 3]
    near,
    far,
    cfg: PointNerfConfig,
    ranges_min: jnp.ndarray,        # grid geometry ([3])
    scaled_vsize: jnp.ndarray,      # [3]
    debug_ablate: Optional[str] = None,   # perf probes only: "decode" |
                                          # "knn" | "qslot" skip stages
                                          # (WRONG output, real timing)
    bg_ray_colors: Optional[jnp.ndarray] = None,   # [R, 3] plane bg
    pshard_axis: Optional[str] = None,    # inside shard_map: cache.rows
                                          # is THIS device's qslot slab
                                          # (slab i of the named mesh
                                          # axis); per-slot outputs are
                                          # psum'd over it
    ray_live: Optional[jnp.ndarray] = None,   # [R] bool: real-ray rows
                                          # (the rb/tier packing pads
                                          # with dups of row 0; the
                                          # march must not walk them)
    prob: bool = False,                   # emit prob-mode outputs for
                                          # point growing (the fast
                                          # twin of render.py's prob
                                          # path; grid composite)
    premarch: Optional[jnp.ndarray] = None,  # [R, cap] packed
                                          # (qslot+1)<<9|d emit rows
                                          # from ops/raster (frame
                                          # front-end); replaces the
                                          # per-chunk ray march when
                                          # march_active(q)
) -> FastRenderOutput:
    q = cfg.query
    if prob and q.span_tiers:
        raise ValueError("prob mode + span_tiers not supported "
                         "(growth probes render plain chunks)")
    if isinstance(premarch, tuple):
        # (frame emit table [HW, cap], this chunk's frame ray ids [R])
        # — the row gather runs inside the jitted program instead of
        # as a separate eager dispatch per chunk
        _tbl, _ids = premarch
        premarch = _tbl[_ids]
    if premarch is not None and q.span_tiers:
        raise ValueError("premarch + span_tiers not supported")
    R = raydirs.shape[0]
    D = q.z_depth_dim
    SR, K = q.SR, q.K
    BP = q.ray_slot_budget or min(SR, 32)
    budget = q.compact_budget if q.compact_budget > 0 else SR
    M = min(R * budget, R * D)
    if q.base_cache and cache.base_h is None:
        raise ValueError(
            "base_cache is on but the cache has no base_h table — "
            "build it with make_fast_scene(..., params=params)")
    hash_mode = cache.hash_table is not None
    if hash_mode:
        # sparse front-end: voxel bounds are a device value, never a
        # shape (ops/hash_grid.py); the qslot lookup goes through the
        # bucket table instead of a dense [gx, gy, gz] gather
        dims_arr = cache.logical_dims
        dims_f = cache.logical_dims.astype(jnp.float32)
        gy = gz = None
    else:
        dims = cache.coor_2_qslot.shape
        gy, gz = dims[1], dims[2]
        dims_arr = jnp.array(dims, jnp.int32)
        dims_f = jnp.array(dims, jnp.float32)

    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    step_t = (far - near) / D

    if q.span_tiers:
        # ---- span-tiered ray packing (see QueryConfig.span_tiers) —
        # the ray_budget slab packing generalized to one packed group
        # per span tier, each rendered at its own depth_window width.
        # Rays are disjoint across tiers, so the per-tier scatters
        # never collide; misses render exact background as in the
        # single-budget branch below.
        import dataclasses as _dc
        widths = tuple(int(w) for w in q.span_tiers)
        budgets = tuple(int(b) for b in q.span_tier_budgets)
        assert len(widths) == len(budgets) and widths == tuple(
            sorted(widths)), (
            "span_tiers must be ascending with matching budgets")
        rmax = ranges_min + dims_f * scaled_vsize
        safe = jnp.where(jnp.abs(raydirs) < 1e-9,
                         jnp.where(raydirs >= 0, 1e-9, -1e-9), raydirs)
        inv = 1.0 / safe
        ta = (ranges_min - campos) * inv
        tb = (rmax - campos) * inv
        t_enter = jnp.max(jnp.minimum(ta, tb), -1)
        t_exit = jnp.min(jnp.maximum(ta, tb), -1)
        hit = ((t_exit + step_t >= t_enter)
               & (t_exit >= near - step_t)
               & (t_enter <= far + step_t))
        # in-box sample span — the same float math as the use_dwin
        # branch, so a tier-w ray's window provably covers its span
        d_lo = jnp.floor((t_enter - near) / step_t
                         - 0.5).astype(jnp.int32)
        d_hi = jnp.minimum(
            jnp.ceil((jnp.minimum(t_exit, far) - near) / step_t
                     - 0.5).astype(jnp.int32), D - 1)
        span = jnp.where((t_exit >= t_enter) & (d_hi >= 0),
                         d_hi - jnp.maximum(d_lo, 0) + 1, 0)
        ti = jnp.zeros((R,), jnp.int32)
        for w in widths[:-1]:
            ti = ti + (span > w).astype(jnp.int32)  # last tier catches
        iota = jnp.arange(R, dtype=jnp.int32)       # any longer span
        bg = (bg_ray_colors if bg_ray_colors is not None
              else jnp.broadcast_to(
                  jnp.asarray(cfg.bg_color, jnp.float32), (R, 3)))
        color = bg.astype(jnp.float32)
        ray_mask = jnp.zeros((R,), jnp.bool_)
        acc = jnp.zeros((R,), jnp.float32)
        depth = jnp.zeros((R,), jnp.float32)
        rb_overflow = jnp.zeros((), jnp.int32)
        dw_overflow = jnp.zeros((), jnp.int32)
        cb_list, win_list, pb_list, nv_list = [], [], [], []
        for i, w in enumerate(widths):
            in_t = hit & (ti == i)
            RB = min(budgets[i], R)
            top = jax.lax.top_k(jnp.where(in_t, -iota, -(R + 1)), RB)[0]
            valid = top >= -R
            rid = jnp.where(valid, -top, 0)
            rb_overflow = rb_overflow + jnp.maximum(
                jnp.sum(in_t.astype(jnp.int32)) - RB, 0)
            # Per-tier compacted-slot budget: valid samples per ray
            # scale with the in-box span, so a flat compact_budget
            # starves the long-span tier (its rays carry most of the
            # shading work). Distribute the global budget in
            # proportion to tier width (all static python values);
            # cb_overflow still counts any residual truncation.
            if q.compact_budget > 0:
                w_bar = (sum(b * wj for b, wj in zip(budgets, widths))
                         / max(sum(budgets), 1))
                cb_i = max(1, -(-q.compact_budget * w // int(w_bar)))
                cb_i = min(cb_i, SR, BP, w)
            else:
                cb_i = 0
            cfg_i = _dc.replace(cfg, query=_dc.replace(
                q, span_tiers=(), span_tier_budgets=(), ray_budget=0,
                depth_window=min(w, D), compact_budget=cb_i))
            sub = fast_render_rays(
                params, Rw2c, cache, campos, camrotc2w, raydirs[rid],
                near, far, cfg_i, ranges_min, scaled_vsize,
                debug_ablate=debug_ablate,
                bg_ray_colors=(None if bg_ray_colors is None
                               else bg_ray_colors[rid]),
                pshard_axis=pshard_axis, ray_live=valid)
            ids_s = jnp.where(valid, rid, R)
            color = color.at[ids_s].set(sub.coarse_raycolor,
                                        mode="drop")
            ray_mask = ray_mask.at[ids_s].set(sub.ray_mask, mode="drop")
            acc = acc.at[ids_s].set(sub.acc.astype(jnp.float32),
                                    mode="drop")
            depth = depth.at[ids_s].set(sub.depth.astype(jnp.float32),
                                        mode="drop")
            if sub.dw_overflow is not None:
                dw_overflow = dw_overflow + sub.dw_overflow
            if sub.cb_overflow is not None:
                cb_list.append(sub.cb_overflow)
            if sub.win_overflow is not None:
                win_list.append(sub.win_overflow)
            if sub.pb_overflow is not None:
                pb_list.append(sub.pb_overflow)
            nv_list.append(sub.n_valid_slots)
        return FastRenderOutput(
            coarse_raycolor=color, ray_mask=ray_mask, acc=acc,
            depth=depth,
            win_overflow=(sum(win_list) if win_list else None),
            dw_overflow=dw_overflow, rb_overflow=rb_overflow,
            cb_overflow=(sum(cb_list) if cb_list else None),
            pb_overflow=(sum(pb_list) if pb_list else None),
            n_valid_slots=sum(nv_list))

    if q.ray_budget > 0:
        # ---- ray packing: the front-end only sees box-hitting rays —
        # a ray whose chord misses the grid box (or lies outside
        # [near, far]) has qs == -1 at every sample and renders exact
        # background, so packing the first RB hitting rays and
        # scattering per-ray outputs back is EXACT while rb_overflow
        # == 0. The slab test is pure math; the [R, Dax] table gather,
        # the mask/top-k/pack machinery and the compacted budget M all
        # shrink to the hit count (~40-55% of an 800x800 frame at
        # chair geometry).
        import dataclasses as _dc
        RB = min(q.ray_budget, R)   # == R keeps the output pytree
                                    # static (rb_overflow present)
        rmax = ranges_min + dims_f * scaled_vsize
        safe = jnp.where(jnp.abs(raydirs) < 1e-9,
                         jnp.where(raydirs >= 0, 1e-9, -1e-9), raydirs)
        inv = 1.0 / safe
        ta = (ranges_min - campos) * inv
        tb = (rmax - campos) * inv
        t_enter = jnp.max(jnp.minimum(ta, tb), -1)
        t_exit = jnp.min(jnp.maximum(ta, tb), -1)
        # one-sample-spacing margin keeps boundary samples conservative
        hit = ((t_exit + step_t >= t_enter)
               & (t_exit >= near - step_t)
               & (t_enter <= far + step_t))
        iota = jnp.arange(R, dtype=jnp.int32)
        top = jax.lax.top_k(jnp.where(hit, -iota, -(R + 1)), RB)[0]
        valid = top >= -R
        ray_ids = jnp.where(valid, -top, 0)
        rb_overflow = jnp.maximum(
            jnp.sum(hit.astype(jnp.int32)) - RB, 0)

        cfg0 = _dc.replace(cfg, query=_dc.replace(q, ray_budget=0))
        sub = fast_render_rays(
            params, Rw2c, cache, campos, camrotc2w, raydirs[ray_ids],
            near, far, cfg0, ranges_min, scaled_vsize,
            debug_ablate=debug_ablate,
            bg_ray_colors=(None if bg_ray_colors is None
                           else bg_ray_colors[ray_ids]),
            pshard_axis=pshard_axis, ray_live=valid, prob=prob,
            premarch=(None if premarch is None else premarch[ray_ids]))

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
        prob_kw = {}
        if prob:
            def scat(x):       # miss rays keep zeros (opacity 0)
                z = jnp.zeros((R,) + x.shape[1:], x.dtype)
                return z.at[ids_s].set(x, mode="drop")
            prob_kw = {f: scat(getattr(sub, f)) for f in (
                "ray_max_shading_opacity", "ray_max_sample_loc_w",
                "shading_avg_color", "shading_avg_dir",
                "shading_avg_conf", "shading_avg_embedding")}
        return FastRenderOutput(
            coarse_raycolor=color, ray_mask=ray_mask, acc=acc,
            depth=depth, win_overflow=sub.win_overflow,
            dw_overflow=sub.dw_overflow, rb_overflow=rb_overflow,
            cb_overflow=sub.cb_overflow, mc_overflow=sub.mc_overflow,
            pb_overflow=sub.pb_overflow,
            n_valid_slots=sub.n_valid_slots, **prob_kw)

    qslot_flat = (None if hash_mode
                  else cache.coor_2_qslot.reshape(-1))

    def _voxelize(pos):
        gc = jnp.floor((pos - ranges_min) / scaled_vsize).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        fi = (gcc[..., 0] * gy + gcc[..., 1]) * gz + gcc[..., 2]
        return fi, inb

    def _qs_lookup(pos):
        """sample position -> (qslot or -1, in-bounds mask); the dense
        table gather or (hash mode) one bucket-table row gather."""
        if hash_mode:
            from pointnerf2studio_tpu.ops.hash_grid import table_qslot
            gc = jnp.floor(
                (pos - ranges_min) / scaled_vsize).astype(jnp.int32)
            inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
            return table_qslot(cache.hash_table, gc, inb), inb
        fi, inb = _voxelize(pos)
        return jnp.where(inb, qslot_flat[jnp.where(inb, fi, 0)], -1), inb

    use_march = (march_active(q)
                 and debug_ablate not in ("qslot", "compact", "selonly"))
    use_coarse = (not use_march and q.coarse_step > 1
                  and cache.coor_2_qslot is not None
                  and cache.coarse_occ is not None
                  and debug_ablate != "qslot")
    use_dwin = (not use_march and not use_coarse and q.depth_window > 0
                and debug_ablate != "qslot")
    mc_overflow = None
    if use_march:
        # ---- distance-field ray march (ops/march.py): tested rows
        # ~= steps taken instead of the dense [R, D(W)] table gather;
        # emits each ray's first-cap occupied samples directly, so the
        # select/compact machinery below is skipped too. Exact while
        # mc_overflow == 0. With `premarch` (ops/raster.py frame
        # front-end) the walk is skipped entirely: the caller already
        # binned this chunk's rays' first-cap occupied samples, in the
        # identical packed format (exact while the raster counters
        # read zero — asserted by the caller per frame).
        cap = min(SR, BP, D)
        from pointnerf2studio_tpu.ops.select import rank_gather_pack
        if premarch is not None:
            if premarch.shape != (R, cap):
                raise ValueError(
                    f"premarch shape {premarch.shape} != {(R, cap)}")
            emit = premarch
            cnt = jnp.sum((premarch != 0).astype(jnp.int32), -1)
            if ray_live is not None:
                cnt = jnp.where(ray_live, cnt, 0)
            mc_overflow = None
        else:
            if hash_mode or cache.march_table is None:
                raise ValueError(
                    "march_steps needs a dense-grid cache with "
                    "march_table (make_fast_scene builds it when "
                    "march_steps is set)")
            if cache.rows.shape[0] > (1 << 22) - 2 or D > 512:
                raise ValueError("march packing needs max_q < 2^22 - 1 "
                                 "and z_depth_dim <= 512")
            from pointnerf2studio_tpu.ops.march import march_rays
            emit, cnt, mc_overflow = march_rays(
                cache.march_table.reshape(-1), dims_arr, gy, gz,
                ranges_min, scaled_vsize, campos, raydirs, near, far,
                step_t, D, cap, q.march_steps, q.march_buckets,
                live=ray_live)
        ray_hit = cnt > 0
        iota_bp = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32), (R, cap))
        sel_ray, sel_slot, colm, _, packed_m, mask_c = rank_gather_pack(
            emit, iota_bp, cnt, M)
        qslot_c = jnp.maximum((packed_m >> 9) - 1, 0)
        sel_d = packed_m & 511
        pack_end = jnp.cumsum(cnt)
        pack_cnt = cnt
        cb_overflow = (jnp.maximum(pack_end[-1] - M, 0)
                       if M < R * cap else None)
        win_overflow = None
        dw_overflow = None
    elif use_coarse:
        # ---- two-level sample masking, window-expanded form ----
        # The [R, D] qslot table gather is the single largest stage of
        # the step (~89 ms of ~194 at bench scale) and is purely
        # row-ISSUE-bound (~7.8 ns/row on v5e regardless of index
        # locality — tools/probe_topk_pack.py qst/tg). The only lever
        # is fewer rows: test window CENTERS against an extra-dilated
        # occupancy ([R, ceil(D/S)] rows), keep the first BW positive
        # windows per ray via lax.top_k (measured ~free), and expand
        # them into a REGULAR compact fine domain [R, BW*S] that the
        # unchanged topk pack consumes with a materialized d_true.
        # Exact while every ray has <= BW positive windows; violations
        # are counted in win_overflow (raise coarse_win_budget).
        # An earlier scatter-heavy window design (r2, reverted)
        # measured SLOWER than no coarse masking at every S; this form
        # adds only the coarse gather + one top_k.
        S = q.coarse_step
        DS = -(-D // S)
        BW = min(q.coarse_win_budget, DS)
        coarse_flat = cache.coarse_occ.reshape(-1)
        dw_overflow = None
        if 0 < q.depth_window < D:
            # composed with the per-ray depth window: the coarse test
            # only covers windows overlapping [d0, d0 + DW) from the
            # ray's slab entry — [R, DW/S + 1] coarse rows instead of
            # [R, D/S]. Exactness split: dw_overflow counts in-box
            # samples past the window coverage, win_overflow counts
            # positive windows past BW (as before).
            DW = q.depth_window
            rmax = ranges_min + dims_f * scaled_vsize
            safe = jnp.where(jnp.abs(raydirs) < 1e-9,
                             jnp.where(raydirs >= 0, 1e-9, -1e-9),
                             raydirs)
            inv = 1.0 / safe
            ta = (ranges_min - campos) * inv
            tb = (rmax - campos) * inv
            t_enter = jnp.max(jnp.minimum(ta, tb), -1)
            t_exit = jnp.min(jnp.maximum(ta, tb), -1)
            d_lo = jnp.floor((t_enter - near) / step_t
                             - 0.5).astype(jnp.int32)
            d0 = jnp.clip(d_lo, 0, max(D - DW, 0))              # [R]
            d_hi = jnp.minimum(
                jnp.ceil((jnp.minimum(t_exit, far) - near) / step_t
                         - 0.5).astype(jnp.int32), D - 1)
            hit_box = (t_exit >= t_enter) & (d_hi >= 0)
            w0 = d0 // S
            DS2 = min(DS, DW // S + 1)
            wi = w0[:, None] + jnp.arange(DS2, dtype=jnp.int32)  # [R,DS2]
            w_in = wi < DS
            dw_overflow = jnp.sum(jnp.where(
                hit_box,
                jnp.maximum(d_hi - ((w0 + DS2) * S - 1), 0), 0))
        else:
            DS2 = DS
            wi = jnp.broadcast_to(
                jnp.arange(DS, dtype=jnp.int32), (R, DS))
            w_in = jnp.ones((R, DS), bool)
        t_c = near + (wi.astype(jnp.float32) * S
                      + (S - 1) / 2 + 0.5) * step_t              # [R,DS2]
        cfid, _ = _voxelize(
            campos + raydirs[:, None, :] * t_c[..., None])
        # test the CLAMPED center cell even when the center itself is
        # outside the grid: member samples can still be inside, and
        # clamping only shrinks the Chebyshev distance the dilation
        # covers (false positives are re-checked by the fine pass)
        cocc = coarse_flat[cfid] & w_in                          # [R,DS2]
        BW = min(BW, DS2)
        wneg = jax.lax.top_k(jnp.where(cocc, -wi, -(DS + 1)), BW)[0]
        w_sel = jnp.where(wneg >= -DS, -wneg, DS)               # [R, BW]
        win_overflow = jnp.sum(
            jnp.maximum(jnp.sum(cocc.astype(jnp.int32), -1) - BW, 0))

        # fine pass on the kept windows, kept per-ray regular
        D2 = BW * S
        d_true = (w_sel[:, :, None] * S
                  + jnp.arange(S)).reshape(R, D2)               # [R, D2]
        in_d = d_true < D
        t_f = near + (d_true.astype(jnp.float32) + 0.5) * step_t
        ffid, finb = _voxelize(
            campos + raydirs[:, None, :] * t_f[..., None])
        finb = finb & in_d
        qs = jnp.where(finb, qslot_flat[jnp.where(finb, ffid, 0)], -1)
        d_true = jnp.minimum(d_true, D - 1)
        Dax = D2
    elif use_dwin:
        # ---- per-ray depth-window clip ----
        # The qslot table is identically -1 outside the grid bounding
        # box, so per-sample lookups only matter on the ray's chord
        # through the box. A slab test gives the entry t; the lookup
        # domain becomes [R, DW] samples from there. Exact while DW
        # covers each ray's in-box span (dw_overflow counts dropped
        # in-box samples; suggest_depth_window bounds the span by the
        # box diagonal). This attacks the table gather's row count
        # (~7 ns/row, the largest stage of the step) with no window
        # budgets to overflow.
        DW = min(q.depth_window, D)
        rmax = ranges_min + dims_f * scaled_vsize
        safe = jnp.where(jnp.abs(raydirs) < 1e-9,
                         jnp.where(raydirs >= 0, 1e-9, -1e-9), raydirs)
        inv = 1.0 / safe
        ta = (ranges_min - campos) * inv                        # [R, 3]
        tb = (rmax - campos) * inv
        t_enter = jnp.max(jnp.minimum(ta, tb), -1)
        t_exit = jnp.min(jnp.maximum(ta, tb), -1)
        # first sample at/after entry: t(d) = near + (d + 0.5) * step;
        # floor(x - 0.5) starts one sample early for float safety
        d_lo = jnp.floor((t_enter - near) / step_t
                         - 0.5).astype(jnp.int32)
        d0 = jnp.clip(d_lo, 0, max(D - DW, 0))                  # [R]
        d_hi = jnp.minimum(
            jnp.ceil((jnp.minimum(t_exit, far) - near) / step_t
                     - 0.5).astype(jnp.int32), D - 1)
        hit_box = (t_exit >= t_enter) & (d_hi >= 0)
        dw_overflow = jnp.sum(jnp.where(
            hit_box, jnp.maximum(d_hi - (d0 + DW - 1), 0), 0))
        d_true = d0[:, None] + jnp.arange(DW, dtype=jnp.int32)  # [R, DW]
        t_f = near + (d_true.astype(jnp.float32) + 0.5) * step_t
        qs, _ = _qs_lookup(campos + raydirs[:, None, :] * t_f[..., None])
        Dax = DW
        win_overflow = None
    else:
        t_mid = near + (jnp.arange(D, dtype=jnp.float32) + 0.5) * step_t
        pos_mid = campos + raydirs[:, None, :] * t_mid[None, :, None]
        if debug_ablate == "qslot":
            fidx, inb = _voxelize(pos_mid)
            qs = jnp.where(inb, fidx % 97, -1)  # fake: no table gather
        else:
            qs, _ = _qs_lookup(pos_mid)
        d_true = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32), (R, D))
        Dax = D
        win_overflow = None
        dw_overflow = None

    if use_march:
        pass            # compaction outputs already produced above
    elif debug_ablate == "compact":
        # fabricate the compaction outputs (WRONG results, real
        # timing): measures the whole [R, Dax]-domain mask/rank/
        # one-hot/scatter machinery by removing it. Valid-slot count
        # mimics the bench scene (~3.4/ray) so chunk skipping and
        # decode work stay comparable.
        mi = jnp.arange(M, dtype=jnp.int32)
        sel_ray = jnp.minimum(mi // max(M // R, 1), R - 1)
        sel_d = (mi % max(M // R, 1)) * (D // max(M // R, 1))
        sel_slot = mi % BP
        qslot_c = (mi * 37) % jnp.maximum(cache.n_q, 1)
        mask_c = mi < (R * 34) // 10
        ray_hit = jnp.ones((R,), bool)
        cb_overflow = None
    elif q.compact_mode == "topk":
        # ---- top-k compaction: ONE scatter + [M]-row gathers ----
        # The one-hot design materializes [R, Dax, BP] one-hots and
        # runs FOUR [R*BP]-row scatters; the compact-skip ablation put
        # that machinery at ~129ms of the 209ms step. Here the first
        # min(SR, BP) valid sample COLUMNS per ray come from
        # lax.top_k (smallest column ids), one scatter packs the
        # combined (ray * Dax + col) id, and cheap [M]-row gathers
        # recover qslot / true d / slot. Selection is IDENTICAL.
        from pointnerf2studio_tpu.ops.select import (
            rank_gather_pack, select_first_cols)
        if debug_ablate == "selonly":
            # fake selection (WRONG output, real timing): measures the
            # top_k itself by replacing it with a static slice
            mask = qs >= 0
            ray_hit = jnp.any(mask, axis=-1)
            col_sel = jnp.broadcast_to(
                jnp.arange(BP, dtype=jnp.int32) * (Dax // BP), (R, BP))
            cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32), -1),
                              min(SR, BP, Dax))
        else:
            col_sel, cnt, ray_hit = select_first_cols(
                qs, BP, min(SR, BP, Dax), q.select_mode)
        sel_ray, sel_slot, colm, sel, qslot_c, mask_c = (
            rank_gather_pack(qs, col_sel, cnt, M))
        # without coarse windows, d_true[r, c] == c: skip the gather;
        # with a depth window, d_true[r, c] == d0[r] + c: one [M]-row
        # gather from the [R] window starts
        if use_coarse:
            sel_d = d_true.reshape(-1)[sel]
        elif use_dwin:
            sel_d = d0[sel_ray] + colm
        else:
            sel_d = colm
        # segment ends for the packed composite (CSEd with the pack's
        # internal cumsum)
        pack_end = jnp.cumsum(cnt)
        pack_cnt = cnt
        # exactness counter for the M budget (free: pack_end exists)
        cb_overflow = (jnp.maximum(pack_end[-1] - M, 0)
                       if M < R * min(SR, BP, Dax) else None)
    else:
        mask = qs >= 0
        ray_hit = jnp.any(mask, axis=-1)
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)      # 1-based
        keep = mask & (rank <= min(SR, BP))
        q_sel, d_sel = onehot_select_qd(keep, rank, qs, d_true, BP)
        cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)          # [R]

        # ---- level-2 global compaction to the M budget ----
        # (separate scalar-row scatters: a packed 4-lane variant
        # measured SLOWER on v5e — 248 vs 209 ms end-to-end)
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
        cb_overflow = (jnp.maximum(jnp.sum(cnt) - M, 0)
                       if M < R * min(SR, BP, Dax) else None)

    if pshard_axis is not None:
        # point-sharded fat cache: this device owns qslot slab
        # [off_q, off_q + n_local); it computes only its own slots
        # (foreign ones masked off -> skipped work) and the tiny
        # per-slot outputs ([M] sig + [M,3] rgb) reassemble with one
        # psum — each valid slot has exactly one owner. The front-end
        # (qslot table, coarse occupancy) stays replicated: it is
        # ~1/200th of the fat rows' bytes.
        n_local = cache.rows.shape[0]
        off_q = jax.lax.axis_index(pshard_axis) * n_local
        owned = (qslot_c >= off_q) & (qslot_c < off_q + n_local)
        res = chunk_pipeline(
            params, Rw2c, cache, raydirs, campos, camrotc2w, near,
            step_t, cfg, ranges_min, scaled_vsize,
            jnp.where(owned, qslot_c - off_q, 0), sel_ray, sel_d,
            mask_c & owned, debug_ablate=debug_ablate,
            skip_policy="any", want_attrs=prob)
        sig, rgb, found, pb = res[:4]
        attrs_m = res[4] if prob else None
        okl = (mask_c & owned & found).astype(sig.dtype)
        sig = jax.lax.psum(sig * okl, pshard_axis)
        rgb = jax.lax.psum(rgb * okl[:, None], pshard_axis)
        if prob:
            attrs_m = jax.lax.psum(
                attrs_m * okl[:, None].astype(attrs_m.dtype),
                pshard_axis)
        found = jax.lax.psum(found.astype(jnp.int32), pshard_axis) > 0
        pb = jax.lax.psum(pb, pshard_axis)
    else:
        res = chunk_pipeline(
            params, Rw2c, cache, raydirs, campos, camrotc2w, near,
            step_t, cfg, ranges_min, scaled_vsize, qslot_c, sel_ray,
            sel_d, mask_c, debug_ablate=debug_ablate, want_attrs=prob)
        sig, rgb, found, pb = res[:4]
        attrs_m = res[4] if prob else None
    pb_overflow = pb if has_pb_overflow(q) else None

    # ---- composite ----
    slot_ok = mask_c & found
    sig = sig * slot_ok.astype(sig.dtype)
    bg = (bg_ray_colors if bg_ray_colors is not None
          else jnp.asarray(cfg.bg_color, jnp.float32))
    use_packed = (q.composite_mode == "packed"
                  and q.compact_mode == "topk"
                  and debug_ablate != "compact"
                  and not prob)   # prob needs the [R, BP] slot grid
                                  # for the per-ray opacity argmax
    if use_packed:
        # packed composite on the [M] compacted axis — no scatter-back
        # (ops/compositing.packed_alpha_composite)
        from pointnerf2studio_tpu.ops.compositing import (
            packed_alpha_composite)
        t_sel = near + (sel_d.astype(jnp.float32) + 0.5) * step_t
        pos_m = campos + raydirs[sel_ray] * t_sel[:, None]
        z_m = w2pers(pos_m, camrotc2w, campos)[..., 2]
        rgb_sum, acc, depth, ray_found = packed_alpha_composite(
            sig, rgb, z_m, slot_ok, sel_ray, pack_end, pack_cnt,
            q.vsize[2], cfg.blend_func)
        color = rgb_sum + (1 - acc)[..., None] * bg
        color = TONE_MAPS[cfg.tonemap_func](color)
        ray_mask = ray_hit & ray_found
        color = jnp.where(ray_mask[:, None], color, bg)
        return FastRenderOutput(
            coarse_raycolor=color, ray_mask=ray_mask, acc=acc,
            depth=depth, win_overflow=win_overflow,
            dw_overflow=dw_overflow, cb_overflow=cb_overflow,
            mc_overflow=mc_overflow, pb_overflow=pb_overflow,
            n_valid_slots=jnp.sum(mask_c.astype(jnp.int32)))

    # ---- grid composite: scatter to [R, BP] slots ----
    if debug_ablate == "scatterback":
        # fake the [M]-row scatters to [R, BP] slots with broadcasts
        # (WRONG values, ~zero cost): isolates the scatter-back stage
        # while keeping the [R, BP] slot-grid composite real
        sig_rb = jnp.broadcast_to(sig[None, :BP], (R, BP))
        rgb_rb = jnp.broadcast_to(rgb[None, :BP], (R, BP, 3))
        valid_rb = jnp.broadcast_to(slot_ok[None, :BP], (R, BP))
        d_rb = jnp.broadcast_to(sel_d[None, :BP], (R, BP))
    else:
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
    z_rb = w2pers(pos_rb, camrotc2w, campos)[..., 2]
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
    prob_kw = {}
    if prob:
        # per-ray max-opacity shading slot + the conf-weighted
        # neighbor averages there — same semantics as render.py's
        # prob path (argmax over the [R, BP] slot grid; reference:
        # neural_points_volumetric_model.py:331-362)
        dest_a = jnp.where(slot_ok, sel_ray * BP + sel_slot, R * BP)
        attrs_rb = jnp.zeros((R * BP, attrs_m.shape[-1]),
                             attrs_m.dtype).at[dest_a].set(
            attrs_m, mode="drop").reshape(R, BP, -1)
        s_star = jnp.argmax(opacity, axis=-1)                   # [R]
        take = lambda x: jnp.take_along_axis(     # noqa: E731
            x, s_star[:, None, None] if x.ndim == 3
            else s_star[:, None], axis=1)
        max_op = take(opacity)[:, 0]
        loc_star = take(pos_rb)[:, 0]
        a_star = take(attrs_rb)[:, 0]                           # [R, AW]
        prob_kw = {
            "ray_max_shading_opacity": max_op,
            "ray_max_sample_loc_w": loc_star,
            "shading_avg_color": a_star[:, 0:3],
            "shading_avg_dir": a_star[:, 3:6],
            "shading_avg_conf": a_star[:, 6:7],
            "shading_avg_embedding": a_star[:, 7:],
        }
    return FastRenderOutput(
        coarse_raycolor=color, ray_mask=ray_mask, acc=acc, depth=depth,
        win_overflow=win_overflow, dw_overflow=dw_overflow,
        cb_overflow=cb_overflow, mc_overflow=mc_overflow,
        pb_overflow=pb_overflow,
        n_valid_slots=jnp.sum(mask_c.astype(jnp.int32)), **prob_kw)


def chunk_pipeline(params, Rw2c, cache, raydirs, campos, camrotc2w,
                   near, step_t, cfg, ranges_min, scaled_vsize,
                   qslot_c, sel_ray, sel_d, mask_c,
                   debug_ablate: Optional[str] = None,
                   skip_policy: str = "prefix",
                   want_attrs: bool = False):
    """Fat gather + K-NN + extract + decode, chunked over the [M]
    compacted slot axis (lax.map). Module-level so perf probes can time
    it against real precomputed compaction outputs.

    One chunk body does gather -> top_k -> one-hot extract -> weights
    -> MLP: bounds the unpacked-candidate intermediates ([CH, C, AW]
    etc.) that OOM HBM at full M, and the decode_chunk regalloc
    workaround comes along for free. Small chunks measured dramatically
    faster on v5e (65k -> 4k chunks: 222k -> 321k rays/s at bench
    scale): the per-chunk working set stays near VMEM and the
    tail-chunk skip quantizes finer. Floor of 2048 keeps GEMMs full.
    Returns (sig [M], rgb [M, 3], found [M], pb_overflow [] — dropped
    valid pairs under decode_mode="pair", 0 otherwise), plus a
    [M, 39] per-slot conf-weighted neighbor-average block (color 3,
    dir 3, conf 1, embedding 32) when `want_attrs` (prob-mode point
    growing; the fast twin of render.py's prob outputs)."""
    q = cfg.query
    M = qslot_c.shape[0]
    K = q.K
    radius2 = q.radius_limit ** 2
    CAND = cache.cand
    num_shells = (q.kernel_size[0] + 1) // 2
    DC = q.decode_chunk
    CH = max(min(q.fast_chunk or 8192, DC or M, M), min(2048, M))

    from pointnerf2studio_tpu.ops.fused_decode import fused_decode_eligible
    use_fused2 = (cfg.agg.fused_decode2
                  and fused_decode_eligible(cfg.agg, False, K)
                  and jax.default_backend() == "tpu")

    use_fused_chunk = False
    if q.chunk_mode == "fused" and debug_ablate is None:
        from pointnerf2studio_tpu.ops.fused_chunk import (
            fused_chunk_eligible)
        if cache.kmeta is None:
            raise ValueError(
                "chunk_mode='fused' needs the kernel-facing cache "
                "layout (make_fast_scene builds it when chunk_mode or "
                "knn_mode is 'fused')")
        use_fused_chunk = fused_chunk_eligible(
            cfg.agg, Rw2c.ndim == 4, K) and not use_fused2
    # an ineligible agg config under chunk_mode='fused' degrades to the
    # fused SELECT pass (the cache layout is kernel-facing either way)
    use_fused_sel = ((q.knn_mode == "fused" or q.chunk_mode == "fused")
                     and cache.kmeta is not None
                     and debug_ablate is None and not use_fused_chunk)
    use_pair = False
    PB_pair = min(q.pair_budget if q.pair_budget > 0 else K, K)
    if q.decode_mode == "pair" and debug_ablate is None:
        from pointnerf2studio_tpu.models.aggregator import (
            pair_decode_eligible)
        if use_fused_chunk or use_fused_sel or use_fused2:
            raise ValueError(
                "decode_mode='pair' requires knn_mode/chunk_mode 'xla' "
                "and fused_decode2 off")
        if not pair_decode_eligible(cfg.agg, Rw2c.ndim == 4):
            raise ValueError(
                "decode_mode='pair' requires agg_intrp_order >= 1 and "
                "a global Rw2c (per-point editing rotations decode on "
                "the lane layout)")
        use_pair = True
    zero_pb = jnp.zeros((), jnp.int32)
    AW = PAYW - 5    # avg-attrs width: color 3 + dir 3 + conf 1 + emb
    if want_attrs and (use_fused_chunk or use_fused_sel or use_pair
                       or q.extract_mode == "krows"
                       or debug_ablate is not None):
        raise ValueError(
            "prob-mode neighbor averages (want_attrs) need the default "
            "XLA one-hot decode path (knn_mode/chunk_mode 'xla', "
            "decode_mode 'lanes', extract_mode 'onehot'/'gather')")
    if (cache.kmeta is not None and not (use_fused_sel or use_fused_chunk)
            and cache.rows.shape[0] == 1 and cache.kmeta.shape[0] > 1):
        # fused-layout caches carry only a placeholder `rows`; the XLA
        # select path would silently read garbage from it
        raise ValueError(
            "cache was built with layout='fused' (placeholder rows); "
            "ablate/XLA-select probes need a layout='rows' cache")

    def chunk_body(args):
        qslot_cc, sel_ray_c, sel_d_c, mask_cc = args
        Mc = qslot_cc.shape[0]
        if use_fused_chunk:
            # ONE Pallas VMEM pass: select + extract + dists + weights
            # + decode; only per-slot (sigma, rgb, found) reach HBM
            # (ops/fused_chunk.py)
            from pointnerf2studio_tpu.ops.fused_chunk import (
                fused_chunk_decode)
            rd_sel = raydirs[sel_ray_c]
            t_sel = near + (sel_d_c.astype(jnp.float32) + 0.5) * step_t
            locs = campos + rd_sel * t_sel[:, None]
            vox = jnp.floor((locs - ranges_min) / scaled_vsize)
            center = ranges_min + (vox + 0.5) * scaled_vsize
            return (*fused_chunk_decode(
                params, Rw2c, camrotc2w, campos,
                cache.kmeta[qslot_cc], cache.kpay[qslot_cc],
                locs, center, rd_sel, mask_cc,
                K=K, radius2=radius2,
                num_shells=num_shells if q.layered_search else 1,
                nff=cfg.agg.num_feat_freqs,
                ndf=cfg.agg.num_dist_freqs,
                nvf=cfg.agg.num_viewdir_freqs,
                act_super=cfg.agg.act_super,
                block=q.fused_chunk_block,
                interpret=jax.default_backend() == "cpu"), zero_pb)
        if use_fused_sel:
            # ONE Pallas pass: d2 + masking + shells + K-select +
            # extract, VMEM-resident (ops/fused_select.py)
            from pointnerf2studio_tpu.ops.fused_select import (
                fused_candidate_select)
            rd_sel = raydirs[sel_ray_c]
            t_sel = near + (sel_d_c.astype(jnp.float32) + 0.5) * step_t
            locs = campos + rd_sel * t_sel[:, None]
            vox = jnp.floor((locs - ranges_min) / scaled_vsize)
            center = ranges_min + (vox + 0.5) * scaled_vsize
            nsel_f, pnt_mask = fused_candidate_select(
                cache.kmeta[qslot_cc], cache.kpay[qslot_cc],
                center - locs, mask_cc, K, radius2,
                num_shells if q.layered_search else 1,
                interpret=jax.default_backend() == "cpu")
            nsel = nsel_f[..., :PAYW].astype(jnp.bfloat16)
            return (*_decode_tail(nsel, pnt_mask, locs, center, rd_sel),
                    zero_pb)
        if q.extract_mode == "krows" and debug_ablate is None:
            # slim selection gather + direct K-row payload gather:
            # identical values (same selection keys from the same bf16
            # rel offsets; payload bits fetched, not extracted)
            if cache.slim is None:
                raise ValueError(
                    "extract_mode='krows' needs the slim cache view "
                    "(make_fast_scene builds it under this mode)")
            slim3 = cache.slim[qslot_cc].reshape(Mc, CAND, 3)
            meta = jax.lax.bitcast_convert_type(slim3[..., 0], jnp.int32)
            relw = jax.lax.bitcast_convert_type(
                slim3[..., 1:], jnp.bfloat16).reshape(Mc, CAND, 4)
            rd_sel = raydirs[sel_ray_c]
            t_sel = near + (sel_d_c.astype(jnp.float32) + 0.5) * step_t
            locs = campos + rd_sel * t_sel[:, None]
            vox = jnp.floor((locs - ranges_min) / scaled_vsize)
            center = ranges_min + (vox + 0.5) * scaled_vsize
            cdelta = (relw[..., :3].astype(jnp.float32)
                      + (center - locs)[:, None, :])
            d2 = jnp.sum(cdelta ** 2, -1)
            ok = (meta >= 0) & mask_cc[:, None]
            if radius2 > 0:
                ok = ok & (d2 <= radius2)
            if q.layered_search and num_shells > 1:
                shell = (meta & 3).astype(jnp.int32)
                eligible = shell == 0
                before = jnp.zeros((Mc, 1), jnp.int32)
                for s in range(1, num_shells):
                    before = before + jnp.sum(
                        (ok & (shell == s - 1)).astype(jnp.int32), -1,
                        keepdims=True)
                    eligible = eligible | ((shell == s) & (before < K))
                ok = ok & eligible
            key = jnp.where(ok, d2, jnp.inf)
            neg_top, top_idx = jax.lax.top_k(-key, K)           # [Mc, K]
            pnt_mask = neg_top > -jnp.inf
            if use_pair:
                def fetch_krows(seg, cand_p):
                    flat = qslot_cc[seg] * CAND + cand_p
                    kr = cache.rows.reshape(-1, ROWW)[flat]     # [MP,ROWW]
                    pay = jax.lax.bitcast_convert_type(
                        kr[..., 1:], jnp.bfloat16).reshape(-1, PAYW)
                    meta_p = jax.lax.bitcast_convert_type(
                        kr[..., 0], jnp.int32)
                    return pay, meta_p
                return _pair_tail(pnt_mask, top_idx, locs, center,
                                  rd_sel, fetch_krows)
            flat_ids = qslot_cc[:, None] * CAND + top_idx       # [Mc, K]
            krows = cache.rows.reshape(-1, ROWW)[flat_ids]      # [Mc,K,ROWW]
            nsel = jax.lax.bitcast_convert_type(
                krows[..., 1:], jnp.bfloat16).reshape(Mc, K, PAYW)
            nsel = nsel * pnt_mask[..., None].astype(nsel.dtype)
            sel_meta = None
            if cache.base_h is not None:
                sel_meta = jax.lax.bitcast_convert_type(
                    krows[..., 0], jnp.int32)
            return (*_decode_tail(nsel, pnt_mask, locs, center, rd_sel,
                                  sel_meta=sel_meta), zero_pb)
        if debug_ablate == "gather":
            # fake the fat-row gather with a broadcast of row 0 (WRONG
            # values, real timing elsewhere): isolates gather row cost
            rows3 = jnp.broadcast_to(
                cache.rows[0], (Mc, CAND * ROWW)).reshape(Mc, CAND, ROWW)
        else:
            rows3 = cache.rows[qslot_cc].reshape(Mc, CAND, ROWW)
        meta = jax.lax.bitcast_convert_type(rows3[..., 0], jnp.int32)
        shell = (meta & 3).astype(jnp.int32)
        payload = jax.lax.bitcast_convert_type(
            rows3[..., 1:], jnp.bfloat16).reshape(Mc, CAND, PAYW)
        if debug_ablate == "p_gather":
            # cumulative-prefix probe cutoff (tools/probe_chunk_stages):
            # fat gather + bitcasts only, reduced per sample (WRONG
            # output, real timing of the prefix)
            return (payload.astype(jnp.float32).sum((-1, -2)),
                    jnp.broadcast_to(meta.astype(jnp.float32)
                                     .sum(-1, keepdims=True), (Mc, 3)),
                    mask_cc, zero_pb)

        rd_sel = raydirs[sel_ray_c]
        t_sel = near + (sel_d_c.astype(jnp.float32) + 0.5) * step_t
        locs = campos + rd_sel * t_sel[:, None]                 # [Mc, 3]
        # candidate xyz = query-voxel center + bf16 relative offset
        vox = jnp.floor((locs - ranges_min) / scaled_vsize)
        center = ranges_min + (vox + 0.5) * scaled_vsize        # [Mc, 3]
        # center - locs is exact f32; only the bf16 rel quantizes
        cdelta = (payload[..., :3].astype(jnp.float32)
                  + (center - locs)[:, None, :])                # [Mc, C, 3]
        d2 = jnp.sum(cdelta ** 2, -1)                           # [Mc, C]
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
        if debug_ablate == "p_geom":
            # prefix cutoff: + cdelta / d2 / masking / shell eligibility
            return (d2.sum(-1) + ok.astype(jnp.float32).sum(-1),
                    jnp.broadcast_to(
                        cdelta.sum((-1, -2))[:, None], (Mc, 3)),
                    mask_cc, zero_pb)

        if debug_ablate == "knn":
            top_idx = jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32), (Mc, K))
            pnt_mask = jnp.take_along_axis(ok, top_idx, -1)
        else:
            key = jnp.where(ok, d2, jnp.inf)
            neg_top, top_idx = jax.lax.top_k(-key, K)           # [Mc, K]
            pnt_mask = neg_top > -jnp.inf
        if debug_ablate == "p_knn":
            # prefix cutoff: + the K-NN top_k select
            return (jnp.where(pnt_mask, -neg_top, 0.0).sum(-1),
                    jnp.broadcast_to(top_idx.astype(jnp.float32)
                                     .sum(-1, keepdims=True), (Mc, 3)),
                    jnp.any(pnt_mask, -1), zero_pb)
        if use_pair and debug_ablate is None:
            def fetch_fat(seg, cand_p):
                pay = payload.reshape(Mc * CAND, PAYW)[seg * CAND
                                                       + cand_p]
                meta_p = (meta.reshape(-1)[seg * CAND + cand_p]
                          if cache.base_h is not None else None)
                return pay, meta_p
            return _pair_tail(pnt_mask, top_idx, locs, center, rd_sel,
                              fetch_fat)
        sel_meta = None
        if cache.base_h is not None:
            # pidx of each selected neighbor for the base_h table
            # gather (a cheap [Mc, K] int gather from the already-
            # loaded candidate meta)
            sel_meta = jnp.take_along_axis(meta, top_idx, -1)
        if debug_ablate == "extract":
            nsel = payload[:, :K]               # fake: static slice
        elif q.extract_mode == "gather":
            nsel = jnp.take_along_axis(payload, top_idx[..., None], 1)
            nsel = nsel * pnt_mask[..., None].astype(nsel.dtype)
        else:
            # ONE bf16 one-hot einsum extracts the whole payload; the
            # single nonzero per (m, k) passes bf16 bits through the
            # f32 accumulator exactly
            oh8 = ((top_idx[..., None] == jnp.arange(CAND))
                   & pnt_mask[..., None])                       # [Mc, K, C]
            nsel = jnp.einsum("mkc,mca->mka", oh8.astype(jnp.bfloat16),
                              payload)                          # [Mc, K, PAYW]
        if debug_ablate == "p_extract":
            # prefix cutoff: + the payload extract
            Mc2 = nsel.shape[0]
            return (nsel.astype(jnp.float32).sum((-1, -2)),
                    jnp.broadcast_to(pnt_mask.astype(jnp.float32)
                                     .sum(-1, keepdims=True), (Mc2, 3)),
                    jnp.any(pnt_mask, -1), zero_pb)
        return (*_decode_tail(nsel, pnt_mask, locs, center, rd_sel,
                              sel_meta=sel_meta), zero_pb)

    def _decode_tail(nsel, pnt_mask, locs, center, rd_sel,
                     sel_meta=None):
        nxyz = (nsel[..., :3].astype(jnp.float32)
                + center[:, None, :])                           # [Mc, K, 3]
        # attr slices stay bf16 end-to-end: the decoder's compute dtype
        # is bf16 anyway, so f32 round-trips only cost HBM traffic
        emb = nsel[..., 3:35]
        conf = nsel[..., 35].astype(jnp.float32)
        ndir = nsel[..., 36:39]
        ncol = nsel[..., 39:42]

        nei_pers = w2pers(nxyz, camrotc2w, campos)
        lp = w2pers(locs, camrotc2w, campos)[..., None, :]
        pdist = jnp.stack(
            [nei_pers[..., 0] * nei_pers[..., 2] - lp[..., 0] * lp[..., 2],
             nei_pers[..., 1] * nei_pers[..., 2] - lp[..., 1] * lp[..., 2],
             nei_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([nxyz - locs[:, None, :], pdist], -1)
        if debug_ablate == "p_dists":
            # prefix cutoff: + attr slices / perspective offsets
            return (dists.astype(jnp.float32).sum((-1, -2))
                    + conf.sum(-1),
                    (emb.astype(jnp.float32).sum((-1, -2))[:, None]
                     + ncol.astype(jnp.float32).mean(-2)
                     + ndir.astype(jnp.float32).mean(-2)),
                    jnp.any(pnt_mask, -1))
        if debug_ablate == "weights":
            # fake the aggregation weights (WRONG values, real timing
            # elsewhere): isolates the inverse-distance weight stage
            weight = pnt_mask.astype(jnp.float32) * 0.1
            emb2 = emb
        else:
            weight, emb2 = aggregation_weight(
                cfg.agg, emb, dists, pnt_mask, max(q.scaled_vsize),
                params=params)
            if cfg.agg.conf_in_weight:
                weight = weight * conf
        vd = jnp.sum(rd_sel[..., :, None] * Rw2c, axis=-2)
        if debug_ablate == "decode":
            sig_c = (jnp.sum(weight * pnt_mask, -1) * 100.0
                     ).astype(jnp.float32)
            rgb_c = ncol.mean(-2).astype(jnp.float32)
        elif use_fused2:
            from pointnerf2studio_tpu.ops.encoding import (
                positional_encoding)
            from pointnerf2studio_tpu.ops.fused_decode import fused_decode2
            dists_rot = jnp.concatenate(
                [dists[..., :3] @ Rw2c, dists[..., 3:]], axis=-1)
            dir_enc = positional_encoding(
                vd, cfg.agg.num_viewdir_freqs, ori=True)
            ov, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]
            ndir_r = ndir.astype(jnp.float32) @ Rw2c
            dirdot = jnp.concatenate(
                [ndir_r - ov[:, None, :],
                 jnp.sum(ndir_r * ov[:, None, :], -1, keepdims=True)], -1)
            wk = weight * pnt_mask.astype(weight.dtype)
            sig_c, rgb_c = fused_decode2(
                params, emb2.astype(jnp.bfloat16), dists_rot,
                ncol.astype(jnp.bfloat16), dirdot, wk, dir_pe, K=K,
                num_feat_freqs=cfg.agg.num_feat_freqs,
                num_dist_freqs=cfg.agg.num_dist_freqs)
        else:
            base_h = None
            if cache.base_h is not None and sel_meta is not None:
                # meta = pidx * 4 + shell (>= 0 where valid); masked
                # slots gather row 0 harmlessly (zeroed by pnt_mask in
                # the K-aggregation)
                pidx = jnp.where(pnt_mask, sel_meta >> 2, 0)
                base_h = cache.base_h[pidx]                 # [Mc, K, H]
            sig_c, rgb_c = decode_radiance(
                params, cfg.agg, neigh_emb=emb2, neigh_color=ncol,
                neigh_dir=ndir, dists=dists, weight=weight,
                pnt_mask=pnt_mask, viewdirs=vd, Rw2c=Rw2c,
                base_h=base_h)
        if want_attrs:
            # conf-weighted neighbor averages for prob-mode growing —
            # the same wc = weight * conf the legacy prob path uses
            # (render.py prob_out; reference
            # neural_points_volumetric_model.py:331-362). weight
            # already folds conf when conf_in_weight, matching legacy.
            wc = (weight * conf * pnt_mask.astype(weight.dtype)
                  )[..., None].astype(jnp.float32)             # [Mc,K,1]
            attrs = jnp.concatenate([
                jnp.sum(ncol.astype(jnp.float32) * wc, -2),
                jnp.sum(ndir.astype(jnp.float32) * wc, -2),
                jnp.sum(conf[..., None] * wc, -2),
                jnp.sum(emb.astype(jnp.float32) * wc, -2)], -1)
            return sig_c, rgb_c, jnp.any(pnt_mask, -1), attrs
        return sig_c, rgb_c, jnp.any(pnt_mask, -1)

    def _pair_tail(pnt_mask, top_idx, locs, center, rd_sel, fetch_pay):
        """Valid-(slot, K)-pair packed decode (decode_mode="pair").

        pnt_mask's valid lanes are a K-prefix (top_k sorts the inf
        keys of invalid candidates last), so the k index of a slot's
        r-th valid pair IS r — the pack needs no per-lane rank
        machinery, only the histogram-inverted offset cumsum (the
        rank_gather_pack trick on the [Mc] slot axis).
        """
        from pointnerf2studio_tpu.models.aggregator import (
            decode_radiance_pairs, raw_aggregation_weight)
        Mc, Kk = pnt_mask.shape
        MP = Mc * PB_pair
        cntk = jnp.sum(pnt_mask.astype(jnp.int32), -1)      # [Mc]
        off_end = jnp.cumsum(cntk)
        off = off_end - cntk
        inc = jnp.zeros((MP + 1,), jnp.int32).at[
            jnp.minimum(off_end, MP)].add(1, mode="drop")
        pim = jnp.arange(MP, dtype=jnp.int32)
        seg = jnp.minimum(jnp.cumsum(inc)[:MP], Mc - 1)     # [MP]
        rank = pim - off[seg]
        pvalid = pim < jnp.minimum(off_end[-1], MP)
        pb_of = (jnp.maximum(off_end[-1] - MP, 0)
                 if PB_pair < Kk else jnp.zeros((), jnp.int32))
        cand_p = top_idx.reshape(-1)[
            seg * Kk + jnp.clip(rank, 0, Kk - 1)]           # [MP]
        pay, meta_p = fetch_pay(seg, cand_p)                # [MP, PAYW]
        pay = pay * pvalid[:, None].astype(pay.dtype)
        locs_p = locs[seg]
        nxyz = pay[..., :3].astype(jnp.float32) + center[seg]
        emb = pay[..., 3:35]
        conf = pay[..., 35].astype(jnp.float32)
        ndir = pay[..., 36:39]
        ncol = pay[..., 39:42]

        nei_pers = w2pers(nxyz, camrotc2w, campos)          # [MP, 3]
        lp = w2pers(locs, camrotc2w, campos)[seg]           # [MP, 3]
        pdist = jnp.stack(
            [nei_pers[..., 0] * nei_pers[..., 2]
             - lp[..., 0] * lp[..., 2],
             nei_pers[..., 1] * nei_pers[..., 2]
             - lp[..., 1] * lp[..., 2],
             nei_pers[..., 2] - lp[..., 2]], -1)
        dists = jnp.concatenate([nxyz - locs_p, pdist], -1)
        w_raw, emb2, nk = raw_aggregation_weight(
            cfg.agg, emb, dists, pvalid, max(q.scaled_vsize),
            params=params)

        def seg_sum(x):
            return jax.ops.segment_sum(x, seg, num_segments=Mc,
                                       indices_are_sorted=True)

        if nk == "norm":
            den = seg_sum(w_raw)
            weight = w_raw / jnp.maximum(den[seg], 1e-8)
        elif nk == "count":
            den = seg_sum(pvalid.astype(w_raw.dtype))
            weight = w_raw / jnp.maximum(den[seg], 1.0)
        else:
            weight = w_raw
        if cfg.agg.conf_in_weight:
            weight = weight * conf
        vd = jnp.sum(rd_sel[..., :, None] * Rw2c, axis=-2)  # [Mc, 3]
        base_h_p = None
        if cache.base_h is not None and meta_p is not None:
            pidx = jnp.where(pvalid, meta_p >> 2, 0)
            base_h_p = cache.base_h[pidx]                   # [MP, H]
        sig_c, rgb_c = decode_radiance_pairs(
            params, cfg.agg, pair_emb=emb2, pair_color=ncol,
            pair_dir=ndir, pair_dists=dists, weight=weight,
            pair_valid=pvalid, seg=seg, n_slots=Mc, viewdirs=vd,
            Rw2c=Rw2c, base_h=base_h_p)
        return sig_c, rgb_c, cntk > 0, pb_of

    def chunk_or_skip(args):
        # level-2 compaction packs valid slots FIRST, so validity is a
        # prefix: a chunk whose first slot is invalid is ALL padding —
        # skip its gather/K-NN/decode entirely. This makes the
        # compact_budget headroom nearly free (over-provisioned chunks
        # cost one scalar branch). With a point-sharded cache the
        # ownership mask breaks the prefix property — "any" tests the
        # whole chunk's mask instead (one [CH] reduce).
        CHc = args[0].shape[0]

        def skip(_):
            z = (jnp.zeros((CHc,), jnp.float32),
                 jnp.zeros((CHc, 3), jnp.float32),
                 jnp.zeros((CHc,), jnp.bool_))
            if want_attrs:
                z = z + (jnp.zeros((CHc, AW), jnp.float32),)
            return z + (jnp.zeros((), jnp.int32),)

        go = args[3][0] if skip_policy == "prefix" else jnp.any(args[3])
        return jax.lax.cond(go, chunk_body, skip, args)

    use_two_phase = (q.decode_chunk2 > 0 and debug_ablate is None
                     and not (use_fused_chunk or use_fused_sel
                              or use_pair or use_fused2)
                     and q.extract_mode != "krows"
                     and not want_attrs and cache.base_h is None
                     and M > CH)
    if use_two_phase:
        # ---- two-phase: candidate stages at CH rows (VMEM-bounded by
        # the [Mc, CAND] intermediates), then ONE wide decode pass at
        # decode_chunk2 rows so the tower's GEMMs batch far wider.
        # Identical math to the single-phase body — only the batching
        # differs (tests/test_raster.py::test_two_phase_parity).
        def front_body(args):
            qslot_cc, sel_ray_c, sel_d_c, mask_cc = args
            Mc = qslot_cc.shape[0]
            rows3 = cache.rows[qslot_cc].reshape(Mc, CAND, ROWW)
            meta = jax.lax.bitcast_convert_type(rows3[..., 0], jnp.int32)
            shell = (meta & 3).astype(jnp.int32)
            payload = jax.lax.bitcast_convert_type(
                rows3[..., 1:], jnp.bfloat16).reshape(Mc, CAND, PAYW)
            rd_sel = raydirs[sel_ray_c]
            t_sel = near + (sel_d_c.astype(jnp.float32) + 0.5) * step_t
            locs = campos + rd_sel * t_sel[:, None]
            vox = jnp.floor((locs - ranges_min) / scaled_vsize)
            center = ranges_min + (vox + 0.5) * scaled_vsize
            cdelta = (payload[..., :3].astype(jnp.float32)
                      + (center - locs)[:, None, :])
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
            key = jnp.where(ok, d2, jnp.inf)
            neg_top, top_idx = jax.lax.top_k(-key, K)
            pnt_mask = neg_top > -jnp.inf
            if q.extract_mode == "gather":
                nsel = jnp.take_along_axis(payload, top_idx[..., None],
                                           1)
                nsel = nsel * pnt_mask[..., None].astype(nsel.dtype)
            else:
                oh8 = ((top_idx[..., None] == jnp.arange(CAND))
                       & pnt_mask[..., None])
                nsel = jnp.einsum("mkc,mca->mka",
                                  oh8.astype(jnp.bfloat16), payload)
            return nsel, pnt_mask, locs, center, rd_sel

        def front_or_skip(args):
            CHc = args[0].shape[0]

            def skipf(_):
                return (jnp.zeros((CHc, K, PAYW), jnp.bfloat16),
                        jnp.zeros((CHc, K), jnp.bool_),
                        jnp.zeros((CHc, 3), jnp.float32),
                        jnp.zeros((CHc, 3), jnp.float32),
                        jnp.zeros((CHc, 3), jnp.float32))

            go = (args[3][0] if skip_policy == "prefix"
                  else jnp.any(args[3]))
            return jax.lax.cond(go, front_body, skipf, args)

        n = (M + CH - 1) // CH
        pad = n * CH - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),)).reshape((n, CH))

        fr = jax.lax.map(
            front_or_skip, (cpad(qslot_c), cpad(sel_ray), cpad(sel_d),
                            cpad(mask_c)))
        nsel_m = fr[0].reshape(n * CH, K, PAYW)
        pm_m = fr[1].reshape(n * CH, K)
        locs_m = fr[2].reshape(n * CH, 3)
        cen_m = fr[3].reshape(n * CH, 3)
        rd_m = fr[4].reshape(n * CH, 3)
        mk_m = jnp.pad(mask_c, ((0, pad),))

        DC2 = max(min(q.decode_chunk2, n * CH), 1)
        n2 = (n * CH + DC2 - 1) // DC2
        pad2 = n2 * DC2 - n * CH

        def dec_body(args):
            nsel_c, pm_c, locs_c, cen_c, rd_c = args
            return _decode_tail(nsel_c, pm_c, locs_c, cen_c, rd_c)

        def dec_or_skip(args4):
            args, mk_c = args4
            CHc = args[0].shape[0]

            def skipd(_):
                return (jnp.zeros((CHc,), jnp.float32),
                        jnp.zeros((CHc, 3), jnp.float32),
                        jnp.zeros((CHc,), jnp.bool_))

            go = mk_c[0] if skip_policy == "prefix" else jnp.any(mk_c)
            return jax.lax.cond(go, dec_body, skipd, args)

        def dpad2(x):
            flat = jnp.pad(
                x, ((0, pad2),) + ((0, 0),) * (x.ndim - 1))
            return flat.reshape((n2, DC2) + x.shape[1:])

        res2 = jax.lax.map(
            dec_or_skip,
            ((dpad2(nsel_m), dpad2(pm_m), dpad2(locs_m), dpad2(cen_m),
              dpad2(rd_m)), dpad2(mk_m)))
        sig = res2[0].reshape(n2 * DC2)[:M]
        rgb = res2[1].reshape(n2 * DC2, 3)[:M]
        found = res2[2].reshape(n2 * DC2)[:M]
        return sig, rgb, found, jnp.zeros((), jnp.int32)

    if M > CH:
        n = (M + CH - 1) // CH
        pad = n * CH - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),)).reshape((n, CH))

        res = jax.lax.map(
            chunk_or_skip, (cpad(qslot_c), cpad(sel_ray), cpad(sel_d),
                            cpad(mask_c)))
        sig, rgb, found = (res[0].reshape(n * CH)[:M],
                           res[1].reshape(n * CH, 3)[:M],
                           res[2].reshape(n * CH)[:M])
        attrs = (res[3].reshape(n * CH, AW)[:M] if want_attrs else None)
        pb = jnp.sum(res[-1])
    else:
        res = chunk_or_skip((qslot_c, sel_ray, sel_d, mask_c))
        sig, rgb, found = res[0], res[1], res[2]
        attrs = res[3] if want_attrs else None
        pb = res[-1]
    if want_attrs:
        return sig, rgb, found, pb, attrs
    return sig, rgb, found, pb


def suggest_depth_window(dims, scaled_vsize, near, far, D: int,
                         slack: int = 4) -> int:
    """Static depth-window length (samples) covering ANY chord of the
    grid bounding box: box diagonal / sample spacing, plus slack for
    the floor/ceil boundary samples. Use as QueryConfig.depth_window;
    FastRenderOutput.dw_overflow == 0 confirms coverage at run time."""
    import math
    diag = math.sqrt(sum((int(d) * float(v)) ** 2
                         for d, v in zip(dims, scaled_vsize)))
    step = (float(far) - float(near)) / D
    return min(D, int(math.ceil(diag / step)) + slack)


def frame_ray_spans(campos, raydirs, near, far, D: int,
                    ranges_min, dims, scaled_vsize):
    """NumPy per-ray in-box sample spans: (span [R] int64, hit [R]
    bool), via the same slab test the jitted depth-window clip uses
    (fast_render_rays' use_dwin branch). `hit` matches the ray_budget
    branch's conservative one-sample-margin slab test, so a False ray
    renders exact background. Pure NumPy — callable before any jit."""
    rd = np.asarray(raydirs, np.float64)
    cp = np.asarray(campos, np.float64).reshape(3)
    rmin = np.asarray(ranges_min, np.float64).reshape(3)
    rmax = rmin + np.asarray(dims, np.float64) * np.asarray(
        scaled_vsize, np.float64)
    near, far = float(near), float(far)
    step = (far - near) / D
    safe = np.where(np.abs(rd) < 1e-9,
                    np.where(rd >= 0, 1e-9, -1e-9), rd)
    inv = 1.0 / safe
    ta = (rmin - cp) * inv
    tb = (rmax - cp) * inv
    t_enter = np.minimum(ta, tb).max(-1)
    t_exit = np.maximum(ta, tb).min(-1)
    d_lo = np.floor((t_enter - near) / step - 0.5).astype(np.int64)
    d_hi = np.minimum(
        np.ceil((np.minimum(t_exit, far) - near) / step - 0.5),
        D - 1).astype(np.int64)
    span_hit = (t_exit >= t_enter) & (d_hi >= 0)
    span = np.where(span_hit, d_hi - np.maximum(d_lo, 0) + 1, 0)
    # conservative hit (one-sample margin, == fast_render_rays'
    # ray_budget test): a superset of span_hit
    hit = ((t_exit + step >= t_enter)
           & (t_exit >= near - step) & (t_enter <= far + step))
    return span, hit


def measured_depth_window(campos, raydirs, near, far, D: int,
                          ranges_min, dims, scaled_vsize,
                          slack: int = 4) -> int:
    """Tight static depth-window length for a KNOWN set of rays: the
    max in-box sample span over `raydirs`, plus slack. Tighter than
    suggest_depth_window's any-chord diagonal bound (the diagonal
    chord only occurs for rays nearly aligned with it);
    FastRenderOutput.dw_overflow == 0 still verifies coverage at run
    time. Pure NumPy — callable before any jit."""
    span, _ = frame_ray_spans(campos, raydirs, near, far, D,
                              ranges_min, dims, scaled_vsize)
    return int(min(D, int(span.max(initial=0)) + slack))


def measured_span_tiers(campos, raydirs, near, far, D: int,
                        ranges_min, dims, scaled_vsize,
                        widths=None, slack: int = 4,
                        round_to: int = 1024, chunk: int = 0):
    """(widths, budgets) for QueryConfig.span_tiers on a KNOWN ray set.

    Default widths are span-distribution quantiles (p50 / p85 / max,
    rounded up to 16) — measured 0.62-0.66x front-end rows on the
    chair frame vs the flat measured window. Budgets are per-tier ray
    counts (max over `chunk`-sized ray chunks when chunked rendering
    is used, +3% slack rounded to `round_to`), mirroring the bench's
    rb auto-sizing; device-side rb_overflow/dw_overflow == 0 re-verify
    both. Pure NumPy — callable before any jit."""
    span, hit = frame_ray_spans(campos, raydirs, near, far, D,
                                ranges_min, dims, scaled_vsize)
    s = span[hit & (span > 0)]
    smax = int(s.max(initial=1))
    if widths is None:
        p50, p85 = (int(np.percentile(s, 50)), int(np.percentile(s, 85))
                    ) if s.size else (1, 1)
        widths = [-(-p50 // 16) * 16, -(-p85 // 16) * 16]
    widths = sorted(set(
        min(int(w), D) for w in widths if int(w) < smax + slack))
    widths.append(min(smax + slack, D))
    # drop widths too close to the next one up — a 16-sample tier gap
    # saves fewer rows than its extra sub-pipeline costs
    widths = [w for w, nxt in zip(widths, widths[1:])
              if nxt - w >= 16] + [widths[-1]]
    warr = np.asarray(widths)
    # tier index per ray: smallest width covering the span (span 0 /
    # grazing-hit rays go to tier 0, matching the device assignment)
    ti = np.searchsorted(warr, span, side="left")
    ti = np.minimum(ti, len(widths) - 1)
    R = span.shape[0]
    chunk = chunk or R
    n_chunks = max(R // chunk, 1)
    budgets = []
    for i in range(len(widths)):
        cnt = (hit & (ti == i))[: n_chunks * chunk].reshape(
            n_chunks, chunk).sum(-1).max()
        budgets.append(int(min(
            chunk, max(round_to, (int(cnt * 1.03) + round_to - 1)
                       // round_to * round_to))))
    return tuple(widths), tuple(budgets)


def slab_hit_mask(campos, raydirs, near, far, D: int,
                  ranges_min, dims, scaled_vsize,
                  jitter: float = 0.0) -> np.ndarray:
    """[R] bool: which rays the fast path's ray packing treats as
    box-hitting (the same conservative slab test + one-sample margin as
    fast_render_rays' ray_budget branch). Size QueryConfig.ray_budget
    from the max per-chunk count; rb_overflow == 0 re-verifies on
    device. Pure NumPy.

    `jitter` (the TRAIN path's stratified-jitter fraction) widens the
    far margin by jitter/2 * (far - near): jittered segment lengths
    cumsum, so the last midpoint can overshoot far by that much —
    matches fast_train_render's ray_budget branch."""
    rd = np.asarray(raydirs, np.float32)
    cp = np.asarray(campos, np.float32).reshape(3)
    rmin = np.asarray(ranges_min, np.float32).reshape(3)
    rmax = rmin + np.asarray(dims, np.float32) * np.asarray(
        scaled_vsize, np.float32)
    near, far = np.float32(near), np.float32(far)
    step = (far - near) / np.float32(D)
    safe = np.where(np.abs(rd) < 1e-9,
                    np.where(rd >= 0, np.float32(1e-9),
                             np.float32(-1e-9)), rd)
    inv = np.float32(1.0) / safe
    ta = (rmin - cp) * inv
    tb = (rmax - cp) * inv
    t_enter = np.minimum(ta, tb).max(-1)
    t_exit = np.maximum(ta, tb).min(-1)
    far_slack = np.float32(jitter) * np.float32(0.5) * (far - near) + step
    return ((t_exit + step >= t_enter)
            & (t_exit >= near - step) & (t_enter <= far + far_slack))


def make_fast_scene(cfg: PointNerfConfig, cloud: NeuralPointCloud,
                    grid: PointGrid, max_q: Optional[int] = None,
                    near: Optional[float] = None,
                    far: Optional[float] = None,
                    params: Optional[AggregatorParams] = None):
    """Build the fat cache for a scene; returns (cache, geometry args).

    `near`/`far` (default cfg.near_plane/far_plane) size the coarse
    dilation when `coarse_step` is on: the coarse grid stays
    conservative for any render whose sample spacing <= (far-near)/D.

    `params` (the aggregator MLP weights) is required when
    cfg.query.base_cache is on: the per-point layer-1 partial product
    is part of the cache and depends on mlp_base's first kernel.
    """
    from pointnerf2studio_tpu.ops.grid import localize_tree_for_build
    cloud, grid = localize_tree_for_build((cloud, grid))
    if max_q is None:
        nq = int(jax.device_get(jnp.sum(
            grid.coor_occ.reshape(-1).astype(jnp.int32))))
        max_q = (nq + 32767) // 32768 * 32768
    coarse_dilate = 0
    if cfg.query.coarse_step > 1:
        import math
        dt = ((far if far is not None else cfg.far_plane)
              - (near if near is not None else cfg.near_plane))             / cfg.query.z_depth_dim
        coarse_dilate = math.ceil(
            (cfg.query.coarse_step - 1) / 2 * dt
            / min(cfg.query.scaled_vsize))
    layout = ("fused" if "fused" in (cfg.query.knn_mode,
                                     cfg.query.chunk_mode) else "rows")
    prune = cfg.query.cand_prune and layout == "rows"
    cc_fit = fit_cand_cap(max_q, cfg.query.cand_cap)
    cache = build_fat_cache(
        grid, cloud, cfg.query.kernel_size, max_q, cc_fit,
        coarse_dilate=coarse_dilate, layout=layout,
        cand_prune=prune,
        radius2=float(cfg.query.radius_limit) ** 2,
        knn_k=cfg.query.K)
    if prune:
        # slice the candidate width to the max KEPT count: every stage
        # that scales with C (fat-row gather bytes, [Mc, C] geometry,
        # the one-hot extract einsum) shrinks by the same factor, with
        # selection provably unchanged (candidate_keep_mask)
        C = cache.cand
        counts = jnp.sum((jax.lax.bitcast_convert_type(
            cache.rows.reshape(-1, C, ROWW)[..., 0], jnp.int32)
            >= 0).astype(jnp.int32), -1)
        c2 = int(jax.device_get(counts.max()))
        c2 = min(C, max(8, -(-c2 // 8) * 8))
        if c2 < C:
            cache = cache.replace(rows=cache.rows.reshape(
                -1, C, ROWW)[:, :c2].reshape(-1, c2 * ROWW))
        print(f"cand_prune: width {C} -> {c2} "
              f"(max kept {int(jax.device_get(counts.max()))})")
    if march_active(cfg.query) and cache.coor_2_qslot is not None:
        from pointnerf2studio_tpu.ops.march import build_march_table
        cache = cache.replace(
            march_table=build_march_table(cache.coor_2_qslot))
    if cfg.query.base_cache:
        cache = cache.replace(base_h=_build_base_h(cfg, cloud, params))
    if cfg.query.extract_mode == "krows":
        cache = cache.replace(slim=_build_slim(cache))
    return cache, grid.ranges_min, grid.scaled_vsize


def _build_slim(cache: FatCache) -> jnp.ndarray:
    """Slice the [meta, bf16(x,y), bf16(z, emb0)] selection words out of
    the fat rows (extract_mode="krows")."""
    import os
    if (jax.default_backend() == "tpu"
            and not os.environ.get("PN2S_ALLOW_KROWS")):
        # reproduced twice (r3h tkkrmcmrbm/tkkrbhpemcmrbm, r4a
        # tkkrprmcmrbm): krows programs crash the axon TPU backend
        # compiler (remote_compile HTTP 500, tpu_compile_helper exit
        # 1). The mode also measured no path to a win (PERF.md r3i) —
        # fenced on TPU rather than left as a hard crash; CPU keeps it
        # for the bit-exactness tests. PN2S_ALLOW_KROWS=1 re-enables
        # for compiler bisects.
        raise NotImplementedError(
            "extract_mode='krows' is fenced on the TPU backend (known "
            "backend-compiler crash, PERF.md r4a); use the default "
            "'onehot' extract, or set PN2S_ALLOW_KROWS=1 to bisect")
    if cache.kmeta is not None and cache.rows.shape[0] == 1:
        raise ValueError("extract_mode='krows' needs the 'rows' cache "
                         "layout (knn_mode/chunk_mode 'xla')")
    C = cache.cand

    @jax.jit
    def slice_rows(r):
        return r.reshape(r.shape[0], C, ROWW)[..., :3].reshape(
            r.shape[0], C * 3)

    return slice_rows(cache.rows)


def _build_base_h(cfg: PointNerfConfig, cloud: NeuralPointCloud,
                  params: Optional[AggregatorParams]) -> jnp.ndarray:
    from pointnerf2studio_tpu.models.aggregator import precompute_base_h
    if params is None:
        raise ValueError(
            "QueryConfig.base_cache needs the aggregator params at "
            "scene build: make_fast_scene(..., params=params)")
    if cfg.agg.agg_intrp_order < 1:
        raise ValueError("base_cache requires agg_intrp_order >= 1 "
                         "(order 0 encodes the K-aggregated embedding)")
    if cfg.agg.fused_decode2:
        raise ValueError("base_cache is incompatible with fused_decode2")
    if "fused" in (cfg.query.knn_mode, cfg.query.chunk_mode):
        raise ValueError("base_cache requires knn_mode/chunk_mode 'xla'")
    return precompute_base_h(params, cfg.agg, cloud.points_embeding)


@functools.partial(jax.jit, static_argnames=("cfg", "prob"))
def fast_render_rays_jit(params, Rw2c, cache, campos, camrotc2w, raydirs,
                         near, far, cfg, ranges_min, scaled_vsize,
                         bg_ray_colors=None, prob=False, premarch=None):
    return fast_render_rays(params, Rw2c, cache, campos, camrotc2w,
                            raydirs, near, far, cfg, ranges_min,
                            scaled_vsize, bg_ray_colors=bg_ray_colors,
                            prob=prob, premarch=premarch)


def render_frame(params, Rw2c, cache, campos, camrotc2w, raydirs,
                 near, far, cfg: PointNerfConfig, ranges_min,
                 scaled_vsize, *, chunk: int = 65536,
                 render_maker=None, bg_ray_colors=None,
                 dw_slack: int = 4, tier_quant: int = 32,
                 budget_tier: int = 0,
                 program_cache: Optional[dict] = None,
                 host_rays: Optional[np.ndarray] = None,
                 raster: Optional[tuple] = None,
                 verbose: bool = False):
    """Full-frame render with frame-level ray packing + span-tiered
    depth windows. EXACT (same outputs as rendering the raw ray order
    with depth_window off) while every chunk's dw_overflow == 0.

    A frame's rays come from ONE camera, so ~40-55% miss the grid box
    entirely (chair geometry) and the rest have widely varying in-box
    chord lengths. Per-65k-dispatch packing (QueryConfig.ray_budget)
    can only exploit the slack WITHIN a chunk; packing at frame level
    removes whole chunks instead:

      1. slab-test every ray (pure NumPy math, frame_ray_spans);
      2. sort: box-hitting rays first, ascending in-box span — miss
         rays render exact background and never enter the pipeline;
      3. render ceil(n_hit/chunk) dense chunks, each compiled at the
         smallest depth-window tier (multiples of `tier_quant`)
         covering its max span + slack — span-sorted order makes the
         early chunks' tiers small;
      4. scatter per-ray outputs back through the sort permutation.

    `render_maker(cfg) -> fn(raydirs_chunk, bg_chunk_or_None)` builds
    the per-tier chunk renderer (the bench passes the shard_map'd
    renderer); tiers are memoized in `program_cache` (pass a dict to
    reuse compiled programs across frames, e.g. video rendering).
    Counters: returned dw_overflow/win_overflow are summed over
    chunks; rb_overflow is None (packing happens out here — the
    conservative slab test makes a dropped ray impossible, not merely
    counted).

    `budget_tier` > 0 (and < cfg.query.compact_budget) additionally
    renders every chunk at that lower compaction budget first and
    re-renders any chunk whose cb_overflow counter tripped at the full
    budget — still exact, one deferred device sync for the counters.
    Span-sorted order makes low-span chunks pass the low budget; only
    the dense tail pays the retry.
    """
    import dataclasses as _dc

    q = cfg.query
    D = q.z_depth_dim
    Rtot = raydirs.shape[0]
    if cache.coor_2_qslot is not None:
        dims = cache.coor_2_qslot.shape
    else:
        dims = tuple(int(x) for x in jax.device_get(cache.logical_dims))
    # the packing math is host-side NumPy; callers with a host copy of
    # the rays skip a device pull (significant over a remote tunnel)
    rd_np = (np.asarray(host_rays, np.float32) if host_rays is not None
             else np.asarray(jax.device_get(raydirs), np.float32))
    cp_np = np.asarray(jax.device_get(campos), np.float32)
    span, hit = frame_ray_spans(cp_np, rd_np, near, far, D,
                                jax.device_get(ranges_min), dims,
                                jax.device_get(scaled_vsize))
    # miss rays last; hits ascending span
    order = np.lexsort((span, ~hit))
    n_hit = int(hit.sum())

    # ---- raster frame front-end (ops/raster.py): with a pinhole
    # pixel-grid frame (`raster` = (H, W, focal-or-(fx,fy,cx,cy))) and
    # a march config, ONE sort-based binning program produces every
    # chunk's packed emit rows up front — the per-chunk walk is
    # skipped. Exact while the raster counters read zero (checked per
    # frame; any violation falls back to the walk for this frame).
    # Emit programs are keyed by their auto-measured footprint ladder
    # in `program_cache`, so orbit/video frames reuse compilations.
    emit_tbl = None
    if (raster is not None and render_maker is None
            and march_active(q) and cache.coor_2_qslot is not None
            and not q.span_tiers):
        try:
            from pointnerf2studio_tpu.ops.raster import (
                _voxel_footprint, build_qvox, make_raster_program)
            Hr, Wr, foc = raster
            if Hr * Wr != Rtot:
                raise ValueError(f"raster frame {Hr}x{Wr} != {Rtot}")
            pcache = program_cache if program_cache is not None else {}
            qv = pcache.get(("raster_qvox", id(cache)))
            if qv is None:
                qv = build_qvox(cache.coor_2_qslot, cache.rows.shape[0])
                pcache[("raster_qvox", id(cache))] = qv
            near_j = jnp.float32(float(near))
            step_j = jnp.float32((float(far) - float(near)) / D)
            fw, fh, fnd, fok = jax.jit(lambda qq: (
                lambda r: (r[3], r[4], r[5], r[6]))(_voxel_footprint(
                    qq, ranges_min, scaled_vsize, campos, camrotc2w,
                    Hr, Wr, foc, near_j, jnp.float32(float(far)), D,
                    step_j)))(qv)
            fok = np.asarray(jax.device_get(fok))
            fw = np.asarray(jax.device_get(fw))[fok]
            fh = np.asarray(jax.device_get(fh))[fok]
            fnd = np.asarray(jax.device_get(fnd))[fok]
            if fw.size == 0 or fw.max() >= (1 << 30):
                raise RuntimeError("camera inside/behind the grid box")
            cls_l = [tuple(int(np.percentile(a, p))
                           for a in (fw, fh, fnd))
                     for p in (55, 80, 95)]
            cls_l.append((int(fw.max()), int(fh.max()), int(fnd.max())))
            cls_l = tuple(dict.fromkeys(cls_l))
            rem = np.ones(fw.shape[0], bool)
            buds, rows_s = [], 0
            for (px, py, ndc) in cls_l:
                fits = rem & (fw <= px) & (fh <= py) & (fnd <= ndc)
                # quantized budgets => nearby frames reuse programs
                nb = -(-(int(fits.sum() * 1.2) + 2048) // 65536) * 65536
                buds.append(nb)
                rows_s += nb * px * py * ndc
                rem &= ~fits
            if rows_s > 40_000_000:
                raise RuntimeError(
                    f"emit ladder needs {rows_s:,} static rows")
            capr = min(SRq := q.SR, q.ray_slot_budget or min(q.SR, 32),
                       D)
            live_b = 4_194_304
            pkey = ("raster_prog", Hr, Wr, cls_l, tuple(buds), capr)
            prog = pcache.get(pkey)
            if prog is None:
                prog = make_raster_program(
                    Hr, Wr, foc, D, capr, classes=cls_l,
                    class_budgets=tuple(buds), live_budget=live_b)
                pcache[pkey] = prog
            emit_tbl, ctrs = prog(
                qv, ranges_min, scaled_vsize, campos, camrotc2w,
                jnp.asarray(raydirs), near_j, step_j,
                jnp.float32(np.random.default_rng().uniform()))
            ctrs = np.asarray(jax.device_get(ctrs))
            if ctrs.sum() != 0:
                if verbose:
                    import sys as _sys
                    print(f"render_frame: raster counters "
                          f"{ctrs.tolist()}; walking this frame",
                          file=_sys.stderr)
                emit_tbl = None
        except Exception as e:
            if verbose:
                import sys as _sys
                print(f"render_frame: raster disabled ({e})",
                      file=_sys.stderr)
            emit_tbl = None

    bg = (bg_ray_colors if bg_ray_colors is not None
          else jnp.broadcast_to(
              jnp.asarray(cfg.bg_color, jnp.float32), (Rtot, 3)))
    color = jnp.asarray(bg, jnp.float32)
    ray_mask = jnp.zeros((Rtot,), jnp.bool_)
    acc = jnp.zeros((Rtot,), jnp.float32)
    depth = jnp.zeros((Rtot,), jnp.float32)
    dw_of = win_of = cb_of = pb_of = None

    n_chunks = (n_hit + chunk - 1) // chunk
    if n_chunks:
        n_used = n_chunks * chunk
        if n_used > Rtot:
            # pad with duplicates of the last ordered rays: identical
            # outputs scatter to identical targets — exact
            order = np.concatenate(
                [order, order[Rtot - (n_used - Rtot):]])
        perm = jnp.asarray(order[:n_used], jnp.int32)
        rays_p = jnp.asarray(raydirs)[perm]
        bg_p = (jnp.asarray(bg_ray_colors)[perm]
                if bg_ray_colors is not None else None)
        span_sorted = span[order[:n_used]]

        if render_maker is None:
            def render_maker(c):
                def fn(rays, bgc, pm=None):
                    return fast_render_rays_jit(
                        params, Rw2c, cache, campos, camrotc2w, rays,
                        near, far, c, ranges_min, scaled_vsize,
                        bg_ray_colors=bgc, premarch=pm)
                return fn
        else:
            _rm0 = render_maker

            def render_maker(c):          # adapt 2-arg custom makers
                _fn0 = _rm0(c)

                def fn(rays, bgc, pm=None):
                    return _fn0(rays, bgc)
                return fn

        programs = program_cache if program_cache is not None else {}

        def get_program(dw, b):
            if (dw, chunk, b) not in programs:
                if verbose:
                    import sys as _sys
                    import time as _time
                    print(f"render_frame: building tier dw={dw} "
                          f"budget={b} chunk={chunk} "
                          f"t={_time.strftime('%H:%M:%S')}",
                          file=_sys.stderr, flush=True)
                cfg_t = _dc.replace(cfg, query=_dc.replace(
                    q, depth_window=dw, ray_budget=0,
                    compact_budget=b))
                programs[(dw, chunk, b)] = render_maker(cfg_t)
            return programs[(dw, chunk, b)]

        b_full = q.compact_budget if q.compact_budget > 0 else q.SR
        b_cap = min(q.SR, q.ray_slot_budget or min(q.SR, 32))
        b_lo = (budget_tier if 0 < budget_tier < b_full else b_full)
        results, dws = [], []
        for i in range(n_chunks):
            smax = int(span_sorted[i * chunk:(i + 1) * chunk].max())
            tier = min(D, -(-(smax + dw_slack) // tier_quant)
                       * tier_quant)
            dw = tier if tier < D else 0
            dws.append(dw)
            sl = slice(i * chunk, (i + 1) * chunk)
            results.append(get_program(dw, b_lo)(
                rays_p[sl], None if bg_p is None else bg_p[sl],
                None if emit_tbl is None else (emit_tbl, perm[sl])))
        # Budget escalation: re-render any chunk whose cb_overflow
        # counter tripped at a doubled budget, up to the per-ray
        # column cap (where M cannot overflow). One deferred device
        # sync per escalation level — usually zero or one. Unlike the
        # plain chunk loop (which merely REPORTS cb_overflow), frame
        # renders never drop samples to the M cap.
        b_now = b_lo
        while b_now < b_cap:
            pend = [i for i, r in enumerate(results)
                    if r.cb_overflow is not None]
            if not pend:
                break
            cbs = jax.device_get([results[i].cb_overflow
                                  for i in pend])
            trip = [i for i, c in zip(pend, cbs) if int(c) > 0]
            if not trip:
                break
            b_now = min(max(2 * b_now, b_full), b_cap)
            for i in trip:
                sl = slice(i * chunk, (i + 1) * chunk)
                results[i] = get_program(dws[i], b_now)(
                    rays_p[sl], None if bg_p is None else bg_p[sl],
                    None if emit_tbl is None else (emit_tbl, perm[sl]))
        for i, res in enumerate(results):
            ids = perm[i * chunk:(i + 1) * chunk]
            color = color.at[ids].set(res.coarse_raycolor)
            ray_mask = ray_mask.at[ids].set(res.ray_mask)
            acc = acc.at[ids].set(res.acc.astype(jnp.float32))
            depth = depth.at[ids].set(res.depth.astype(jnp.float32))
            if res.dw_overflow is not None:
                dw_of = (res.dw_overflow if dw_of is None
                         else dw_of + res.dw_overflow)
            if res.win_overflow is not None:
                win_of = (res.win_overflow if win_of is None
                          else win_of + res.win_overflow)
            if res.cb_overflow is not None:
                cb_of = (res.cb_overflow if cb_of is None
                         else cb_of + res.cb_overflow)
            if res.pb_overflow is not None:
                pb_of = (res.pb_overflow if pb_of is None
                         else pb_of + res.pb_overflow)

    return FastRenderOutput(
        coarse_raycolor=color, ray_mask=ray_mask, acc=acc, depth=depth,
        win_overflow=win_of, dw_overflow=dw_of, rb_overflow=None,
        cb_overflow=cb_of, pb_overflow=pb_of)
