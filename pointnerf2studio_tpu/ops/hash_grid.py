"""Sparse (bucketized-hash) voxel grid for huge-extent scenes.

The dense grid (ops/grid.py) materializes three [gx, gy, gz] tables
(coor_2_occ, dilated coor_occ, and the caches' coor_2_qslot). At the
reference's Tanks&Temples / ScanNet settings (vsize 0.002-0.008,
scene extents of meters) the logical dims reach 1000-3000 per axis:
dense tables would need tens of GB of HBM and flat voxel ids overflow
int32 — the reference sidesteps this only because its CUDA path also
allocates dense grids and simply cannot run those scenes at full
extent without its `ranges` crop (SURVEY.md §7 hard part 6).

TPU-native design — everything is fixed-shape sort/segment/scatter:

  * ONE open-addressed bucket table `[B, S*W]` int32 (W = 5 words per
    slot: x, y, z, occ_slot, qslot). A lookup is ONE row gather (the
    same row-issue-bound cost class as the dense table gather —
    fast-path measurements put gathers at ~7 ns/row regardless of row
    width at these sizes) followed by an in-register compare over the
    S slots. No probe loops, no chains.
  * Deterministic build with NO dense intermediates and NO flat ids:
    all sorts are lexicographic over (x, y, z) int32 key columns.
    qslot numbering = rank in (x, y, z) order, which is exactly the
    dense build's row-major cumsum numbering — the two grids are
    interchangeable on scenes where both fit.
  * Exact-with-counter capacity semantics (the codebase-wide pattern):
    a bucket receiving more than S entries counts into `overflow`;
    `build_hash_grid_from_points` doubles the bucket count and
    rebuilds until overflow == 0 (expected load is kept at <= S/4).

Reference counterpart: the CUDA grid-build kernels
(pointnerf/models/neural_points/cuda/query_worldcoords.cu:18-162) —
same occupancy/dilation semantics as ops/grid.py (whose docstring
documents the deliberate determinism differences), re-housed in a
hash table so multi-thousand-dim scenes fit in HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pointnerf2studio_tpu.config import QueryConfig
from pointnerf2studio_tpu.ops.grid import compute_grid_geometry, voxel_coords

W = 5          # int32 words per table slot: x, y, z, occ_slot, qslot


@struct.dataclass
class HashGrid:
    """Sparse voxel grid (all device arrays; B, S static via shapes)."""
    ranges_min: jnp.ndarray       # [3] f32 world coords of grid origin
    scaled_vsize: jnp.ndarray     # [3] f32 voxel edge lengths
    dims: jnp.ndarray             # [3] int32 LOGICAL bounds (not a shape)
    table: jnp.ndarray            # [B, S*W] int32; empty slots are -1
    occ_2_pnts: jnp.ndarray       # [max_o, P] int32 point ids, -1 padded
    occ_numpnts: jnp.ndarray      # [max_o] int32
    occ_2_coor: jnp.ndarray       # [max_o, 3] int32, -1 padded
    n_occ: jnp.ndarray            # [] int32 occupied voxels
    n_q: jnp.ndarray              # [] int32 dilated (query) voxels
    overflow: jnp.ndarray         # [] int32 entries dropped by bucket
                                  # capacity S (nonzero = rebuild bigger)

    @property
    def n_buckets(self) -> int:
        return self.table.shape[0]

    @property
    def bucket_slots(self) -> int:
        return self.table.shape[1] // W


def _mix_coords(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
                n_buckets: int) -> jnp.ndarray:
    """(x, y, z) int32 -> bucket id int32 in [0, n_buckets).

    Per-axis odd multipliers + a murmur3-style finalizer in uint32
    (int32 coords are non-negative in-grid, so the cast is lossless).
    n_buckets must be a power of two.
    """
    u = (x.astype(jnp.uint32) * np.uint32(0x9E3779B1)
         ^ y.astype(jnp.uint32) * np.uint32(0x85EBCA77)
         ^ z.astype(jnp.uint32) * np.uint32(0xC2B2AE3D))
    u = u ^ (u >> 16)
    u = u * np.uint32(0x7FEB352D)
    u = u ^ (u >> 15)
    u = u * np.uint32(0x846CA68B)
    u = u ^ (u >> 16)
    return (u & np.uint32(n_buckets - 1)).astype(jnp.int32)


def _dilation_offsets(query_size: Tuple[int, int, int]) -> np.ndarray:
    """Offsets o such that `occupied at c` dilates `c + o` — matches
    ops/grid._dilate_occupancy's reduce_window footprint exactly:
    o in [-(q // 2), (q + 1) // 2 - 1] per axis."""
    axes = [np.arange(-(q // 2), (q + 1) // 2) for q in query_size]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    return grid.astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_buckets", "bucket_slots", "max_o", "P",
                     "query_size"))
def build_hash_grid(
    xyz: jnp.ndarray,            # [N, 3]
    alive: jnp.ndarray,          # [N] bool
    ranges_min: jnp.ndarray,     # [3]
    scaled_vsize: jnp.ndarray,   # [3]
    dims: jnp.ndarray,           # [3] int32 logical bounds (device)
    n_buckets: int,
    bucket_slots: int,
    max_o: int,
    P: int,
    query_size: Tuple[int, int, int],
) -> HashGrid:
    """Deterministic sparse grid build; one jitted call.

    Semantics match ops/grid.build_grid (first-P points per voxel by
    point index, first-max_o voxels in row-major (x, y, z) order,
    reduce_window-footprint dilation), expressed without any dense
    [gx, gy, gz] array or flat voxel id.
    """
    n = xyz.shape[0]
    B, S = n_buckets, bucket_slots
    dims = dims.astype(jnp.int32)
    BIG = jnp.int32(2**30)

    # ---- occupied voxels: lexicographic (x, y, z) sort, no flat ids
    gcoor = voxel_coords(xyz, ranges_min, scaled_vsize)
    inb = alive & jnp.all((gcoor >= 0) & (gcoor < dims), axis=-1)
    kx = jnp.where(inb, gcoor[:, 0], BIG)
    ky = jnp.where(inb, gcoor[:, 1], BIG)
    kz = jnp.where(inb, gcoor[:, 2], BIG)
    sx, sy, sz, spid = jax.lax.sort(
        (kx, ky, kz, jnp.arange(n, dtype=jnp.int32)),
        dimension=0, num_keys=3)
    valid = sx < BIG
    newv = (jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1])
                             | (sz[1:] != sz[:-1])]))
    head = valid & newv
    slot = jnp.cumsum(head.astype(jnp.int32)) - 1        # occ slot/entry
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, pos, 0))
    rank = pos - seg_start
    n_occ = jnp.sum(head.astype(jnp.int32))

    keep = valid & (slot < max_o)
    store = keep & (rank < P)
    occ_2_pnts = jnp.full((max_o, P), -1, jnp.int32).at[
        jnp.where(store, slot, max_o), jnp.where(store, rank, 0)
    ].set(spid, mode="drop")
    occ_numpnts = jnp.zeros((max_o,), jnp.int32).at[
        jnp.where(keep, slot, max_o)
    ].add(1, mode="drop")
    hp = head & (slot < max_o)
    occ_2_coor = jnp.full((max_o, 3), -1, jnp.int32).at[
        jnp.where(hp, slot, max_o)[:, None],
        jnp.broadcast_to(jnp.arange(3), (n, 3)),
    ].set(jnp.stack([sx, sy, sz], -1), mode="drop")

    # ---- dilated (query) voxel set: emit occupied x offsets, dedupe.
    # The o == 0 emission carries its occ slot; sorting with -occ_tag
    # as the 4th key puts it first in each duplicate group, so the
    # group head row knows the voxel's occ slot with no extra pass.
    offs = jnp.asarray(_dilation_offsets(query_size))     # [V, 3]
    V = offs.shape[0]
    zero_off = jnp.all(offs == 0, -1)                     # [V]
    live_o = occ_2_coor[:, 0] >= 0                        # [max_o]
    em = occ_2_coor[:, None, :] + offs[None]              # [max_o, V, 3]
    em_in = (live_o[:, None]
             & jnp.all((em >= 0) & (em < dims), -1))      # [max_o, V]
    occ_tag = jnp.where(
        zero_off[None] & em_in,
        jnp.broadcast_to(jnp.arange(max_o, dtype=jnp.int32)[:, None],
                         (max_o, V)), -1)
    E = max_o * V
    ex = jnp.where(em_in, em[..., 0], BIG).reshape(E)
    ey = jnp.where(em_in, em[..., 1], BIG).reshape(E)
    ez = jnp.where(em_in, em[..., 2], BIG).reshape(E)
    et = occ_tag.reshape(E)
    ex, ey, ez, negt = jax.lax.sort((ex, ey, ez, -et), dimension=0,
                                    num_keys=4)
    et = -negt
    evalid = ex < BIG
    enew = (jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             (ex[1:] != ex[:-1]) | (ey[1:] != ey[:-1])
                             | (ez[1:] != ez[:-1])]))
    ehead = evalid & enew
    qslot = jnp.cumsum(ehead.astype(jnp.int32)) - 1       # (x,y,z) order
    n_q = jnp.sum(ehead.astype(jnp.int32))

    # ---- hash insert of the unique dilated voxels
    bu = _mix_coords(ex, ey, ez, B)
    bu_k = jnp.where(ehead, bu, BIG)
    hx = jnp.where(ehead, ex, BIG)
    sbu, hx, hy, hz, hocc, hq = jax.lax.sort(
        (bu_k, hx, ey, ez, et, qslot), dimension=0, num_keys=4)
    hvalid = sbu < BIG
    bnew = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                            sbu[1:] != sbu[:-1]])
    bhead = hvalid & bnew
    epos = jnp.arange(E, dtype=jnp.int32)
    bstart = jax.lax.cummax(jnp.where(bhead, epos, 0))
    brank = epos - bstart
    put = hvalid & (brank < S)
    overflow = jnp.sum((hvalid & (brank >= S)).astype(jnp.int32))

    flat = jnp.full((B * S * W,), -1, jnp.int32)
    base = jnp.where(put, sbu * (S * W) + brank * W, B * S * W)
    for col, arr in enumerate((hx, hy, hz, hocc, hq)):
        flat = flat.at[jnp.where(put, base + col, B * S * W)].set(
            arr, mode="drop")
    table = flat.reshape(B, S * W)

    return HashGrid(
        ranges_min=ranges_min.astype(jnp.float32),
        scaled_vsize=scaled_vsize.astype(jnp.float32),
        dims=dims,
        table=table,
        occ_2_pnts=occ_2_pnts,
        occ_numpnts=occ_numpnts,
        n_occ=n_occ,
        n_q=n_q,
        occ_2_coor=occ_2_coor,
        overflow=overflow,
    )


def hash_lookup(hg: HashGrid, coords: jnp.ndarray):
    """Voxel coords [..., 3] int32 -> (found [...], occ_slot [...],
    qslot [...]) — found mirrors the dense grid's dilated `coor_occ`,
    occ_slot its `coor_2_occ` (-1 where unoccupied), qslot the caches'
    `coor_2_qslot` (-1 where not a query voxel).

    ONE [B, S*W] row gather per lookup + an in-register compare over
    the S bucket slots.
    """
    B, S = hg.n_buckets, hg.bucket_slots
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    inb = jnp.all((coords >= 0) & (coords < hg.dims), -1)
    bu = _mix_coords(x, y, z, B)
    row = hg.table[jnp.where(inb, bu, 0)]                 # [..., S*W]
    row = row.reshape(*row.shape[:-1], S, W)
    match = (inb[..., None]
             & (row[..., 0] == x[..., None])
             & (row[..., 1] == y[..., None])
             & (row[..., 2] == z[..., None]))
    found = jnp.any(match, -1)
    occ_slot = jnp.max(jnp.where(match, row[..., 3], -1), -1)
    qslot = jnp.max(jnp.where(match, row[..., 4], -1), -1)
    return found, occ_slot, qslot


def table_qslot(table: jnp.ndarray, coords: jnp.ndarray,
                inb: jnp.ndarray) -> jnp.ndarray:
    """qslot lookup against a bare bucket table (the fast paths carry
    the table without the full HashGrid): coords [..., 3] int32 +
    caller-computed in-bounds mask -> qslot [...] int32 (-1 = not a
    query voxel). ONE row gather."""
    B = table.shape[0]
    S = table.shape[1] // W
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    bu = _mix_coords(x, y, z, B)
    row = table[jnp.where(inb, bu, 0)]
    row = row.reshape(*row.shape[:-1], S, W)
    match = (inb[..., None]
             & (row[..., 0] == x[..., None])
             & (row[..., 1] == y[..., None])
             & (row[..., 2] == z[..., None]))
    return jnp.max(jnp.where(match, row[..., 4], -1), -1)


def mask_raypos_hash(hg: HashGrid, raypos: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] world sample positions -> bool dilated-occupancy mask
    (the sparse twin of ops/query.mask_raypos)."""
    coords = voxel_coords(raypos, hg.ranges_min, hg.scaled_vsize)
    return hash_lookup(hg, coords)[0]


def suggest_buckets(n_entries: int, bucket_slots: int = 16) -> int:
    """Power-of-two bucket count targeting mean load <= S/4 (at S=16 /
    load 4, the Poisson tail past 16 is ~1e-9/bucket — negligible even
    at millions of buckets; the caller still verifies overflow == 0
    and retries)."""
    target = max(1, (4 * n_entries) // max(bucket_slots, 1))
    return max(1024, int(2 ** int(np.ceil(np.log2(target)))))


def build_query_grid(xyz: jnp.ndarray, alive: jnp.ndarray,
                     cfg: QueryConfig):
    """Grid-backend selector (QueryConfig.grid_mode): returns a dense
    PointGrid or a sparse HashGrid. "auto" picks dense while the dense
    tables are feasible (ops/grid.dense_dims_feasible) and falls back
    to the hash grid for huge extents. Consumers branch with
    `isinstance(grid, HashGrid)`."""
    from pointnerf2studio_tpu.ops.grid import (
        build_grid_from_points, dense_dims_feasible)

    mode = cfg.grid_mode
    if mode == "dense":
        return build_grid_from_points(xyz, alive, cfg)
    if mode == "hash":
        return build_hash_grid_from_points(xyz, alive, cfg)
    if mode != "auto":
        raise ValueError(f"unknown grid_mode {mode!r}")
    big = jnp.float32(1e30)
    alive3 = alive[:, None]
    xyz_min = np.asarray(jnp.min(jnp.where(alive3, xyz, big), axis=0))
    xyz_max = np.asarray(jnp.max(jnp.where(alive3, xyz, -big), axis=0))
    _, dims = compute_grid_geometry(xyz_min, xyz_max, cfg)
    if dense_dims_feasible(dims):
        return build_grid_from_points(xyz, alive, cfg)
    return build_hash_grid_from_points(xyz, alive, cfg)


def build_hash_grid_from_points(
    xyz: jnp.ndarray, alive: jnp.ndarray, cfg: QueryConfig,
    bucket_slots: int = 16, max_attempts: int = 4,
) -> HashGrid:
    """Host wrapper: geometry from the live-point bbox (same as the
    dense build_grid_from_points, minus its dense-dims padding), then
    the jitted build, doubling the bucket count until overflow == 0.

    Unlike the dense path, `dims` here are LOGICAL bounds — they never
    size an allocation, so multi-thousand dims are fine.
    """
    from pointnerf2studio_tpu.ops.grid import localize_for_build
    xyz, alive = localize_for_build(xyz, alive)
    big = jnp.float32(1e30)
    alive3 = alive[:, None]
    xyz_min = np.asarray(jnp.min(jnp.where(alive3, xyz, big), axis=0))
    xyz_max = np.asarray(jnp.max(jnp.where(alive3, xyz, -big), axis=0))
    ranges_min, dims = compute_grid_geometry(xyz_min, xyz_max, cfg)

    # dilated-entry estimate: coherent surfaces dilate ~3-6x, far below
    # the max_o * V worst case; an underestimate shows up as bucket
    # overflow, which the doubling loop below corrects
    n_entries = min(cfg.max_o, int(xyz.shape[0])) * 6
    B = suggest_buckets(n_entries, bucket_slots)
    hg = None
    for _ in range(max_attempts):
        hg = build_hash_grid(
            xyz, alive, jnp.asarray(ranges_min),
            jnp.asarray(cfg.scaled_vsize, jnp.float32),
            jnp.asarray(dims, jnp.int32), B, bucket_slots,
            cfg.max_o, cfg.P, cfg.query_size)
        if int(jax.device_get(hg.overflow)) == 0:
            return hg
        B *= 2
    raise RuntimeError(
        f"hash grid bucket overflow persisted at B={B // 2} "
        f"(n_occ={int(jax.device_get(hg.n_occ))}); pathological "
        f"coordinate distribution?")
