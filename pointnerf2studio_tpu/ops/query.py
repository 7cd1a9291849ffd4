"""Ray-sample masking, shading-slot compaction, and K-NN neighbor query.

TPU-native replacement for the reference CUDA kernels `mask_raypos`,
`get_shadingloc`, `query_neigh_along_ray_layered` and the host-side
orchestration `woord_query_grid_point_index_cuda`
(reference: pointnerf/models/neural_points/cuda/query_worldcoords.cu:165-433).

Key design change: the reference dynamically compacts rays twice
(device->host `.item()` syncs at query_worldcoords.cu:382,426). Here all
shapes are fixed — every ray keeps SR shading slots and K neighbor
slots, with validity masks (`ray_mask`, `sample_mask`, pidx >= 0)
instead of shrinking tensors. That makes the whole render step one
jitted XLA program.

Selection semantics preserved exactly:
  * shading slots hold the FIRST `SR` dilated-occupied samples along
    each ray (cumsum ranking, query_worldcoords.cu:390-391),
  * neighbor candidates are scanned shell-by-shell in Chebyshev layers;
    once the total candidate count reaches K at the end of a shell,
    outer shells are not searched (the `if (kid >= K) break` at
    query_worldcoords.cu:300). Within the searched shells, the K nearest
    within `radius_limit` win, earlier scan order breaking ties.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pointnerf2studio_tpu.ops.grid import PointGrid, voxel_coords


@struct.dataclass
class QueryResult:
    """Fixed-shape output of the neighbor query (padded + masked)."""
    sample_pidx: jnp.ndarray     # [R, SR, K] int32 point ids, -1 = empty
    sample_loc_w: jnp.ndarray    # [R, SR, 3] world shading locations (0 pad)
    sample_mask: jnp.ndarray     # [R, SR] bool: slot holds a shading point
    ray_mask: jnp.ndarray        # [R] bool: ray intersects occupied space
                                 #   AND at least one sample found neighbors


def neighbor_offsets(kernel_size: Tuple[int, int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """Static scan-ordered voxel offsets and their Chebyshev shell ids.

    Order matches the reference's layer/x/y/z loop nest
    (query_worldcoords.cu:256-263): shell 0 first, then each shell's
    offsets in x-major order, skipping interior cells.
    """
    num_layers = (kernel_size[0] + 1) // 2
    offs, shells = [], []
    for layer in range(num_layers):
        for x in range(-layer, layer + 1):
            for y in range(-layer, layer + 1):
                for z in range(-layer, layer + 1):
                    if max(abs(x), abs(y), abs(z)) != layer:
                        continue
                    offs.append((x, y, z))
                    shells.append(layer)
    return np.asarray(offs, np.int32), np.asarray(shells, np.int32)


def candidate_keep_mask(
    rel: jnp.ndarray,        # [B, C, 3] candidate offset from voxel CENTER
    shell: jnp.ndarray,      # [B, C] int32 Chebyshev shell per candidate
    valid: jnp.ndarray,      # [B, C] bool
    half: jnp.ndarray,       # [3] scaled_vsize / 2
    radius2: float,
    K: int,
    max_shell: int,
) -> jnp.ndarray:
    """EXACT build-time candidate pruning for the fat/geo caches.

    Keeps only candidates that can be among the K selected neighbors
    for SOME shading location inside the query voxel. Two provably
    safe rules (render selection: in-radius + shell-eligible + K
    nearest by distance, models/fast_render.chunk_pipeline):

    1. radius prune (any shell): lo_p^2 > radius2, where lo_p is the
       candidate's MIN distance to the voxel cube — such a candidate is
       never in-radius, and since `ok` includes the radius test it also
       never contributes to shell-eligibility `before` counts.
    2. domination prune (OUTERMOST shell only): if K valid radius-
       feasible candidates q satisfy hi_q < lo_p (their MAX cube
       distance below p's min), then wherever p is ok all K are ok,
       strictly closer, and eligible whenever p is (shell_q <=
       shell_p) — p never reaches the top-K. Restricted to the
       outermost shell because inner-shell candidates feed the
       `before` eligibility counts of outer shells; dropping one
       could flip an outer candidate eligible and change the selected
       set. Outermost-shell candidates feed no such count.

    Survivors keep their relative order, so re-packing them first
    leaves the render's tie-breaking identical: the selection over the
    kept set is BIT-EXACT vs the unpruned cache
    (tests/test_candidate_cache.py)."""
    a = jnp.abs(rel)
    lo = jnp.linalg.norm(jnp.maximum(a - half, 0.0), axis=-1)   # [B, C]
    hi = jnp.linalg.norm(a + half, axis=-1)
    feasible = valid
    if radius2 > 0:
        feasible = feasible & (lo * lo <= radius2)
    # dom_cnt[b, p] = #{q: feasible, hi_q < lo_p}
    dom = (hi[:, None, :] < lo[:, :, None]) & feasible[:, None, :]
    dom_cnt = jnp.sum(dom.astype(jnp.int32), -1)
    return feasible & ~((shell >= max_shell) & (dom_cnt >= K))


def mask_raypos(grid: PointGrid, raypos: jnp.ndarray) -> jnp.ndarray:
    """[R, D] bool: sample position lies in a dilated-occupied voxel."""
    dims = jnp.array(grid.dims, jnp.int32)
    gcoor = voxel_coords(raypos, grid.ranges_min, grid.scaled_vsize)
    inb = jnp.all((gcoor >= 0) & (gcoor < dims), axis=-1)
    gc = jnp.clip(gcoor, 0, dims - 1)
    occ = grid.coor_occ[gc[..., 0], gc[..., 1], gc[..., 2]]
    return inb & occ


def compact_shading_locs(
    raypos: jnp.ndarray,       # [R, D, 3]
    raypos_mask: jnp.ndarray,  # [R, D] bool
    SR: int,
    extra: Optional[jnp.ndarray] = None,   # [R, D] int payload (e.g. qslot)
):
    """Gather the first SR masked samples of each ray into fixed slots.

    jit-safe equivalent of `get_shadingloc` (query_worldcoords.cu:192-214
    with host-side rank prep at :390-391). Implemented as a per-ray
    partial sort (`top_k` over the D sample indices) + gather rather
    than a cumsum + scatter: TPU scatters over the [R, D] domain were
    the top cost of the whole render step (~1s at R=32k, D=400 —
    tools/profile_render2.py), while row-wise top_k + row gathers
    vectorize cleanly.
    Returns (sample_loc_w, sample_mask[, extra_slots]).
    """
    R, D, _ = raypos.shape
    # valid samples keep their depth index as the key, invalid sort last;
    # the SR smallest keys are exactly the first SR valid samples in order
    key = jnp.where(raypos_mask, jnp.arange(D, dtype=jnp.int32), D)
    neg_top, d_sel = jax.lax.top_k(-key, SR)                      # [R, SR]
    sample_mask = neg_top > -D
    sample_loc_w = jnp.take_along_axis(
        raypos, d_sel[..., None], axis=1
    ) * sample_mask[..., None].astype(raypos.dtype)
    if extra is None:
        return sample_loc_w, sample_mask
    extra_slots = jnp.where(
        sample_mask, jnp.take_along_axis(extra, d_sel, axis=1), -1)
    return sample_loc_w, sample_mask, extra_slots


def _knn_chunk(
    grid: PointGrid,
    xyz: jnp.ndarray,         # [N, 3] point positions
    locs: jnp.ndarray,        # [C, 3] shading locations
    loc_mask: jnp.ndarray,    # [C] bool
    offsets: jnp.ndarray,     # [V, 3] neighbor voxel offsets (scan order)
    shells: jnp.ndarray,      # [V] shell id per offset
    num_shells: int,
    K: int,
    radius2: float,
    layered: bool,
) -> jnp.ndarray:
    """K nearest live points for one chunk of shading locations -> [C, K]."""
    C = locs.shape[0]
    P = grid.occ_2_pnts.shape[1]
    V = offsets.shape[0]
    dims = jnp.array(grid.dims, jnp.int32)

    center = voxel_coords(locs, grid.ranges_min, grid.scaled_vsize)   # [C, 3]
    nb = center[:, None, :] + offsets[None, :, :]                     # [C, V, 3]
    nb_inb = jnp.all((nb >= 0) & (nb < dims), axis=-1)
    nbc = jnp.clip(nb, 0, dims - 1)
    occ_slot = grid.coor_2_occ[nbc[..., 0], nbc[..., 1], nbc[..., 2]]  # [C, V]
    slot_valid = nb_inb & (occ_slot >= 0) & loc_mask[:, None]

    cand = grid.occ_2_pnts[jnp.where(slot_valid, occ_slot, 0)]         # [C, V, P]
    cand_valid = slot_valid[..., None] & (cand >= 0)
    cand_xyz = xyz[jnp.clip(cand, 0, xyz.shape[0] - 1)]                # [C, V, P, 3]
    delta = cand_xyz - locs[:, None, None, :]
    d2 = jnp.sum(delta * delta, axis=-1)                               # [C, V, P]
    if radius2 > 0.0:
        cand_valid = cand_valid & (d2 <= radius2)

    cand_valid = cand_valid.reshape(C, V * P)
    d2 = d2.reshape(C, V * P)
    cand = cand.reshape(C, V * P)

    if layered:
        # A shell is searched only if the shells inside it yielded < K
        # candidates (reference early-exit at query_worldcoords.cu:300).
        # Counts via a small one-hot matmul (MXU) — scatter-adds over
        # the candidate domain were a top render-step cost.
        shell_per_cand = jnp.repeat(shells, P)                          # [V*P]
        onehot = (shell_per_cand[:, None]
                  == jnp.arange(num_shells)[None, :]).astype(jnp.float32)
        shell_counts = (cand_valid.astype(jnp.float32) @ onehot
                        ).astype(jnp.int32)                             # [C, S]
        before = jnp.cumsum(shell_counts, axis=-1) - shell_counts
        eligible = before[:, shell_per_cand] < K
        cand_valid = cand_valid & eligible

    key = jnp.where(cand_valid, d2, jnp.inf)
    top_key, top_idx = jax.lax.top_k(-key, K)                           # [C, K]
    top_pidx = jnp.take_along_axis(cand, top_idx, axis=-1)
    return jnp.where(top_key > -jnp.inf, top_pidx, -1)


def mask_raypos_qslot(grid: PointGrid, raypos: jnp.ndarray) -> jnp.ndarray:
    """[R, D] int32 query-slot id per sample (-1 = not in a dilated-
    occupied voxel). One gather replaces the separate occupancy lookup
    when the candidate cache is enabled."""
    dims = jnp.array(grid.dims, jnp.int32)
    gcoor = voxel_coords(raypos, grid.ranges_min, grid.scaled_vsize)
    inb = jnp.all((gcoor >= 0) & (gcoor < dims), axis=-1)
    gc = jnp.clip(gcoor, 0, dims - 1)
    q = grid.cache.coor_2_qslot[gc[..., 0], gc[..., 1], gc[..., 2]]
    return jnp.where(inb, q, -1)


def knn_from_cache(
    grid: PointGrid,
    qslot: jnp.ndarray,      # [M] query-voxel slot per shading point
    locs: jnp.ndarray,       # [M, 3]
    loc_mask: jnp.ndarray,   # [M] bool
    K: int,
    radius2: float,
    num_shells: int,
    layered: bool = True,
) -> jnp.ndarray:
    """Candidate-cache K-NN: one fat-row gather + dense select -> [M, K]."""
    cache = grid.cache
    rows = cache.cand_pack[jnp.clip(qslot, 0)]               # [M, C, 5]
    cxyz, pidx, shell = cache.unpack(rows)
    ok = (qslot >= 0)[:, None] & loc_mask[:, None] & (pidx >= 0)
    d2 = jnp.sum((cxyz - locs[:, None, :]) ** 2, axis=-1)
    if radius2 > 0.0:
        ok = ok & (d2 <= radius2)

    if layered:
        # a shell is searched only if inner shells yielded < K
        # candidates. Pure arithmetic per shell — a take_along_axis
        # gather over the [M, C] candidate domain cost ~770 ms at
        # bench scale (tools/probe_knn_decode.py), this costs ~nothing
        # (num_shells is 2-3).
        eligible = shell == 0
        before = jnp.zeros(pidx.shape[:1] + (1,), jnp.int32)
        for s in range(1, num_shells):
            before = before + jnp.sum(
                (ok & (shell == s - 1)).astype(jnp.int32), -1, keepdims=True)
            eligible = eligible | ((shell == s) & (before < K))
        ok = ok & eligible

    key = jnp.where(ok, d2, jnp.inf)
    top_key, top = jax.lax.top_k(-key, K)
    top_pidx = jnp.take_along_axis(pidx, top, axis=-1)
    return jnp.where(top_key > -jnp.inf, top_pidx, -1)


def knn_for_locs(
    grid: PointGrid,
    xyz: jnp.ndarray,         # [N, 3]
    locs: jnp.ndarray,        # [M, 3] shading locations (flat)
    loc_mask: jnp.ndarray,    # [M] bool
    K: int,
    radius2: float,
    kernel_size: Tuple[int, int, int],
    layered: bool = True,
    chunk: int = 8192,
) -> jnp.ndarray:
    """K nearest point ids for a flat list of locations -> [M, K].

    Chunked over `chunk`-sized pieces via `lax.map` to bound the
    candidate-tensor working set ([chunk, V*P] instead of [M, V*P]).
    """
    offs_np, shells_np = neighbor_offsets(kernel_size)
    offsets = jnp.asarray(offs_np)
    shells = jnp.asarray(shells_np)
    num_shells = int(shells_np.max()) + 1

    total = locs.shape[0]
    padded = (total + chunk - 1) // chunk * chunk
    locs_p = jnp.pad(locs, ((0, padded - total), (0, 0)))
    mask_p = jnp.pad(loc_mask, (0, padded - total))

    def one_chunk(args):
        lc, m = args
        return _knn_chunk(grid, xyz, lc, m, offsets, shells, num_shells,
                          K, radius2, layered)

    if padded == chunk:
        return one_chunk((locs_p, mask_p))[:total]
    return jax.lax.map(
        one_chunk,
        (locs_p.reshape(-1, chunk, 3), mask_p.reshape(-1, chunk)),
    ).reshape(padded, K)[:total]


@functools.partial(
    jax.jit,
    static_argnames=("SR", "K", "radius2", "layered", "kernel_size", "chunk"))
def query_grid_point_index(
    grid: PointGrid,
    xyz: jnp.ndarray,          # [N, 3]
    raypos: jnp.ndarray,       # [R, D, 3]
    SR: int,
    K: int,
    radius2: float,
    kernel_size: Tuple[int, int, int],
    layered: bool = True,
    chunk: int = 8192,
) -> QueryResult:
    """Full query pipeline: mask -> compact -> K-NN. Fixed shapes.

    The K-NN candidate tensor ([R*SR, V*P]) would be GBs at full batch
    size, so shading points are processed in `chunk`-sized pieces via
    `lax.map` — sequential in the program, pipelined by XLA.
    """
    R = raypos.shape[0]
    rp_mask = mask_raypos(grid, raypos)
    ray_hit = jnp.any(rp_mask, axis=-1)
    sample_loc_w, sample_mask = compact_shading_locs(raypos, rp_mask, SR)

    pidx = knn_for_locs(
        grid, xyz, sample_loc_w.reshape(R * SR, 3),
        sample_mask.reshape(R * SR), K, radius2, kernel_size,
        layered=layered, chunk=chunk).reshape(R, SR, K)

    # Drop rays whose shading points found no neighbors at all
    # (second compaction in the reference, query_worldcoords.cu:425-429).
    ray_found = jnp.any(pidx >= 0, axis=(-1, -2))
    return QueryResult(
        sample_pidx=pidx,
        sample_loc_w=sample_loc_w,
        sample_mask=sample_mask,
        ray_mask=ray_hit & ray_found,
    )
