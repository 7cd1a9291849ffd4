"""Spatially-sharded voxel grid: halo-exchange-free exact K-NN for
point clouds whose dense grid + candidate structures exceed one chip.

The replicated-grid path (parallel/sharding.py) holds the full dense
`coor_occ`/`coor_2_occ` grids and the per-point voxel lists on every
chip — at ScanNet/T&T scale (vox dims ~900, max_o 1.6M; SURVEY.md §6
hard part 6) those are GBs per chip. Here the grid is partitioned into
x-axis SLABS over a "points" mesh axis:

  * every chip builds a grid ONLY over its slab plus a static HALO of
    (kernel_size-1)/2 + dilation voxels — the halo makes border queries
    exact without any neighbor communication during the query,
  * a ray sample is OWNED by exactly one slab (its voxel's x-coord);
    each chip masks + K-NNs only the samples it owns,
  * per-sample results merge with one `pmax` (empty = -1): the owning
    chip contributes real ids, everyone else -1.

xyz stays replicated (12 MB/M points) — only the dense grids, candidate
lists and point ATTRIBUTES (see gather_neighbors points_axis) scale
down 1/n. Exactness: identical results to the unsharded query for any
slab decomposition (tests/test_grid_shard.py).

Reference counterpart: none — the reference is single-GPU for the
query (cuda/query_worldcoords.cu); this is the TPU-native scale-out
design from SURVEY.md §2.3/§5.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pointnerf2studio_tpu.config import QueryConfig
from pointnerf2studio_tpu.ops.grid import (
    PointGrid, build_grid, compute_grid_geometry, voxel_coords)
from pointnerf2studio_tpu.ops.query import (
    compact_shading_locs, knn_for_locs, mask_raypos)


def slab_geometry(cfg: QueryConfig, xyz_min: np.ndarray, xyz_max: np.ndarray,
                  n_slabs: int) -> Tuple[np.ndarray, Tuple[int, int, int], int, int]:
    """Static slab decomposition of the global grid along x.

    Returns (global ranges_min, global dims, slab width in voxels
    [without halo], halo width in voxels). Every slab's LOCAL grid has
    dims (slab_w + 2*halo, gy, gz) — static, identical across chips.
    """
    ranges_min, dims = compute_grid_geometry(xyz_min, xyz_max, cfg)
    gx = dims[0]
    slab_w = -(-gx // n_slabs)                       # ceil
    # halo: neighbors searched over (kernel-1)/2 voxels; occupancy is
    # additionally dilated by query_size, so a border sample's mask can
    # depend on occupancy up to qs/2 + needs the points there too.
    halo = max((cfg.kernel_size[0] - 1) // 2 + 1,
               (cfg.query_size[0] + 1) // 2)
    return np.asarray(ranges_min, np.float32), dims, slab_w, halo


def build_slab_grid(
    xyz: jnp.ndarray,
    alive: jnp.ndarray,
    cfg: QueryConfig,
    ranges_min: jnp.ndarray,        # [3] GLOBAL grid origin
    dims: Tuple[int, int, int],     # global dims
    slab_w: int,
    halo: int,
    slab_idx: jnp.ndarray,          # [] int32 — this chip's slab
    max_o_local: int,
) -> Tuple[PointGrid, jnp.ndarray]:
    """One chip's local grid over [slab_idx*slab_w - halo, +slab_w+halo).

    Runs INSIDE shard_map (slab_idx = axis_index). Returns the local
    grid and the slab's first owned voxel x (for ownership tests).
    Points outside the slab+halo are masked dead for this chip's build.
    """
    svs = jnp.asarray(cfg.scaled_vsize, jnp.float32)
    x0 = slab_idx * slab_w - halo                   # local grid x origin
    local_rmin = jnp.stack(                         # only x shifts
        [ranges_min[0] + x0.astype(jnp.float32) * svs[0],
         ranges_min[1], ranges_min[2]])

    local_dims = (slab_w + 2 * halo, dims[1], dims[2])
    gc_x = voxel_coords(xyz, ranges_min, svs)[:, 0]
    in_local = alive & (gc_x >= x0) & (gc_x < x0 + local_dims[0])
    grid = build_grid(xyz, in_local, local_rmin, svs, local_dims,
                      max_o_local, cfg.P, cfg.query_size)
    return grid, x0


def make_sharded_query(
    cfg: QueryConfig,
    mesh: Mesh,
    ranges_min: np.ndarray,
    dims: Tuple[int, int, int],
    slab_w: int,
    halo: int,
    max_o_local: int,
    axis: str = "points",
) -> Callable:
    """Jitted exact K-NN query over a slab-sharded grid.

    query(xyz, alive, raypos [R, D, 3]) ->
        (sample_pidx [R, SR, K], sample_loc_w [R, SR, 3],
         sample_mask [R, SR], ray_mask [R])   — all replicated.

    Collectives: one [R, D] psum (sample-mask merge) + one [R, SR, K]
    pmax (neighbor-id merge). Everything else is slab-local.
    """
    SR, K = cfg.SR, cfg.K
    radius2 = cfg.radius_limit ** 2
    rmin = jnp.asarray(ranges_min)
    svs = jnp.asarray(cfg.scaled_vsize, jnp.float32)

    def local(xyz, alive, raypos):
        idx = jax.lax.axis_index(axis)
        grid, x0 = build_slab_grid(
            xyz, alive, cfg, rmin, dims, slab_w, halo, idx, max_o_local)

        # ownership: the sample's GLOBAL voxel x lies in this slab
        gc = voxel_coords(raypos, rmin, svs)
        own = ((gc[..., 0] >= idx * slab_w)
               & (gc[..., 0] < jnp.minimum((idx + 1) * slab_w, dims[0]))
               & (gc[..., 0] >= 0))

        rp_mask_local = mask_raypos(grid, raypos) & own        # [R, D]
        rp_mask = jax.lax.psum(
            rp_mask_local.astype(jnp.int32), axis) > 0         # merged
        ray_hit = jnp.any(rp_mask, axis=-1)
        sample_loc_w, sample_mask = compact_shading_locs(raypos, rp_mask, SR)

        # this chip K-NNs only the shading locs it owns
        loc_gc_x = voxel_coords(sample_loc_w, rmin, svs)[..., 0]
        loc_own = (sample_mask & (loc_gc_x >= idx * slab_w)
                   & (loc_gc_x < (idx + 1) * slab_w))
        R = raypos.shape[0]
        pidx_local = knn_for_locs(
            grid, xyz, sample_loc_w.reshape(R * SR, 3),
            loc_own.reshape(R * SR), K, radius2, cfg.kernel_size,
            layered=cfg.layered_search).reshape(R, SR, K)
        pidx = jax.lax.pmax(pidx_local, axis)                  # -1 = empty

        ray_found = jnp.any(pidx >= 0, axis=(-1, -2))
        return pidx, sample_loc_w, sample_mask, ray_hit & ray_found

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(fn)
