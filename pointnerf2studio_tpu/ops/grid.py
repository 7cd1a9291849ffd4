"""Voxel-grid construction over a neural point cloud.

TPU-native replacement for the reference's CUDA grid-build kernels
`claim_occ` / `map_coor2occ` / `fill_occ2pnts`
(reference: pointnerf/models/neural_points/cuda/query_worldcoords.cu:18-162).

Design differences (deliberate, all documented):
  * atomics + wall-clock-seeded reservoir sampling -> a single stable
    sort by voxel id + segment ranking. Fully deterministic: when a voxel
    holds more than P points the first P by point index are kept, and
    when more than `max_o` voxels are occupied the first `max_o` in
    flat-id order are kept (the reference keeps a random subset).
  * the reference's `fill_occ2pnts` skips occupied-slot 0 entirely (an
    off-by-one: `if (voxel_idx > 0)` at query_worldcoords.cu:147); we do
    not reproduce that point-dropping quirk.
  * occupancy dilation (3-nested scatter loop in `map_coor2occ`) becomes
    one `lax.reduce_window` max-pool.
  * the grid is built once per point-cloud change (init/prune/grow), not
    on every forward pass as the reference does
    (pointnerf/models/neural_points/point_query.py:86-93).

Grid shapes are static per build; dims are padded up to a multiple of
`grid_dim_pad` so jit caches survive small point-cloud changes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pointnerf2studio_tpu.config import QueryConfig


@struct.dataclass
class PointGrid:
    """Dense voxel grid over the neural point cloud (all device arrays)."""
    ranges_min: jnp.ndarray        # [3] world coords of grid origin
    scaled_vsize: jnp.ndarray      # [3] voxel edge lengths
    coor_2_occ: jnp.ndarray        # [gx, gy, gz] int32: occupied-slot id or -1
    coor_occ: jnp.ndarray          # [gx, gy, gz] bool: dilated occupancy
    occ_2_pnts: jnp.ndarray        # [max_o, P] int32 point indices, -1 padded
    occ_numpnts: jnp.ndarray       # [max_o] int32 points per occupied voxel
    n_occ: jnp.ndarray             # [] int32 number of occupied voxels

    @property
    def dims(self) -> Tuple[int, int, int]:
        return self.coor_occ.shape


def compute_grid_geometry(
    xyz_min: np.ndarray,
    xyz_max: np.ndarray,
    cfg: QueryConfig,
) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Host-side grid origin + static dims from a point bounding box.

    Mirrors `NeuralPoints.get_hyperparameters`
    (reference: pointnerf/nerfstudio/studio_utils.py:115-127): clip the
    point bbox to config ranges, pad by kernel_size/2 voxels, divide by
    the scaled voxel size. Dims are rounded up to `grid_dim_pad` so the
    jitted query survives small bbox changes without recompiling.
    """
    ranges = np.asarray(cfg.ranges, np.float32)
    svsize = np.asarray(cfg.scaled_vsize, np.float32)
    ks = np.asarray(cfg.kernel_size, np.float32)
    lo = np.maximum(np.asarray(xyz_min, np.float32), ranges[:3]) - svsize * ks / 2
    hi = np.minimum(np.asarray(xyz_max, np.float32), ranges[3:]) + svsize * ks / 2
    vdim = (hi - lo) / np.asarray(cfg.vsize, np.float32)
    dims = np.ceil(vdim / np.asarray(cfg.vscale, np.float32)).astype(np.int64)
    pad = cfg.grid_dim_pad
    dims = np.maximum((dims + pad - 1) // pad * pad, pad)
    return lo, (int(dims[0]), int(dims[1]), int(dims[2]))


def voxel_coords(
    xyz: jnp.ndarray, ranges_min: jnp.ndarray, scaled_vsize: jnp.ndarray
) -> jnp.ndarray:
    """World position -> integer voxel coordinate (floor)."""
    return jnp.floor((xyz - ranges_min) / scaled_vsize).astype(jnp.int32)


def _dilate_occupancy(occ: jnp.ndarray, query_size: Tuple[int, int, int]) -> jnp.ndarray:
    """Mark every voxel within the query window of an occupied voxel.

    The reference scatters from each occupied voxel c over
    [c - qs/2, c + (qs+1)/2) (query_worldcoords.cu:105-113); gathering at
    q that is a max over input offsets [-(qs+1)/2 + 1, qs/2].
    """
    window = tuple(int(q) for q in query_size)
    padding = tuple(((q + 1) // 2 - 1, q // 2) for q in window)
    return jax.lax.reduce_window(
        occ.astype(jnp.int32), 0, jax.lax.max,
        window_dimensions=window, window_strides=(1, 1, 1), padding=padding,
    ).astype(jnp.bool_)


@functools.partial(
    jax.jit, static_argnames=("dims", "max_o", "P", "query_size"))
def build_grid(
    xyz: jnp.ndarray,          # [N, 3]
    alive: jnp.ndarray,        # [N] bool — live-point mask (static capacity)
    ranges_min: jnp.ndarray,   # [3]
    scaled_vsize: jnp.ndarray, # [3]
    dims: Tuple[int, int, int],
    max_o: int,
    P: int,
    query_size: Tuple[int, int, int],
) -> PointGrid:
    """Build the dense voxel grid. Deterministic, single jitted call."""
    n = xyz.shape[0]
    gx, gy, gz = dims
    nvox = gx * gy * gz

    gcoor = voxel_coords(xyz, ranges_min, scaled_vsize)
    inb = alive & jnp.all((gcoor >= 0) & (gcoor < jnp.array(dims, jnp.int32)), axis=-1)
    flat = gcoor[:, 0] * (gy * gz) + gcoor[:, 1] * gz + gcoor[:, 2]
    flat = jnp.where(inb, flat, nvox)  # out-of-grid/dead points sort last

    # Stable sort by voxel id; carries the original point index along.
    sflat, spid = jax.lax.sort(
        (flat, jnp.arange(n, dtype=jnp.int32)), dimension=0, num_keys=1)
    valid = sflat < nvox
    prev = jnp.concatenate([jnp.full((1,), -1, sflat.dtype), sflat[:-1]])
    head = valid & (sflat != prev)

    slot = jnp.cumsum(head.astype(jnp.int32)) - 1          # voxel slot per entry
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(head, pos, 0))
    rank = pos - seg_start                                  # index within voxel
    n_occ = jnp.sum(head.astype(jnp.int32))

    keep = valid & (slot < max_o)
    store = keep & (rank < P)
    occ_2_pnts = jnp.full((max_o, P), -1, jnp.int32).at[
        jnp.where(store, slot, max_o), jnp.where(store, rank, 0)
    ].set(spid, mode="drop")
    occ_numpnts = jnp.zeros((max_o,), jnp.int32).at[
        jnp.where(keep, slot, max_o)
    ].add(1, mode="drop")

    coor_2_occ_flat = jnp.full((nvox,), -1, jnp.int32).at[
        jnp.where(head & (slot < max_o), sflat, nvox)
    ].set(slot, mode="drop")
    coor_2_occ = coor_2_occ_flat.reshape(dims)
    coor_occ = _dilate_occupancy(coor_2_occ >= 0, query_size)

    return PointGrid(
        ranges_min=ranges_min.astype(jnp.float32),
        scaled_vsize=scaled_vsize.astype(jnp.float32),
        coor_2_occ=coor_2_occ,
        coor_occ=coor_occ,
        occ_2_pnts=occ_2_pnts,
        occ_numpnts=occ_numpnts,
        n_occ=n_occ,
    )


def build_grid_from_points(
    xyz: jnp.ndarray, alive: jnp.ndarray, cfg: QueryConfig
) -> PointGrid:
    """Convenience wrapper: host-side geometry, then the jitted build.

    Pulls the live-point bbox to the host once per build; grid builds
    happen only when points change (init/prune/grow), so this sync is
    off the training hot path.
    """
    big = jnp.float32(1e30)
    alive3 = alive[:, None]
    xyz_min = np.asarray(jnp.min(jnp.where(alive3, xyz, big), axis=0))
    xyz_max = np.asarray(jnp.max(jnp.where(alive3, xyz, -big), axis=0))
    ranges_min, dims = compute_grid_geometry(xyz_min, xyz_max, cfg)
    return build_grid(
        xyz, alive,
        jnp.asarray(ranges_min), jnp.asarray(cfg.scaled_vsize, jnp.float32),
        dims, cfg.max_o, cfg.P, cfg.query_size,
    )
