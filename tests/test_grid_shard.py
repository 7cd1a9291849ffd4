"""Slab-sharded (halo) voxel-grid K-NN == the unsharded query, exactly.

Runs on the 8-virtual-device CPU platform (conftest). The sharded query
partitions the grid into x slabs with halos; results must match the
replicated-grid `query_grid_point_index` bit-for-bit (same selection
and tie-break semantics — parallel/grid_shard.py docstring).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import QueryConfig
from pointnerf2studio_tpu.ops.grid import build_grid_from_points
from pointnerf2studio_tpu.ops.query import query_grid_point_index
from pointnerf2studio_tpu.parallel.grid_shard import (
    make_sharded_query, slab_geometry)
from pointnerf2studio_tpu.parallel.sharding import Mesh


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("points",))


@pytest.mark.parametrize("n_slabs", [2, 4])
def test_sharded_query_matches_unsharded(n_slabs):
    cfg = QueryConfig(
        vsize=(0.05, 0.05, 0.05), vscale=(1, 1, 1), SR=12, K=4, P=8,
        max_o=8192, z_depth_dim=40, use_cache=False, grid_dim_pad=8,
        ranges=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0))
    rng = np.random.default_rng(3)
    n = 4000
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = jnp.asarray(0.6 * v + 0.02 * rng.normal(size=(n, 3)).astype(
        np.float32))
    alive = jnp.ones((n,), bool)

    R, D = 64, cfg.z_depth_dim
    campos = jnp.asarray(np.array([0.0, 0.0, 1.8], np.float32))
    dirs = rng.normal(size=(R, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.linspace(0.9, 2.9, D, dtype=np.float32)
    raypos = jnp.asarray(
        campos[None, None, :] + dirs[:, None, :] * t[None, :, None])

    # unsharded reference
    grid = build_grid_from_points(xyz, alive, cfg)
    ref = query_grid_point_index(
        grid, xyz, raypos, cfg.SR, cfg.K, cfg.radius_limit ** 2,
        cfg.kernel_size, layered=cfg.layered_search)

    xyz_np = np.asarray(xyz)
    rmin, dims, slab_w, halo = slab_geometry(
        cfg, xyz_np.min(0), xyz_np.max(0), n_slabs)
    q = make_sharded_query(cfg, _mesh(n_slabs), rmin, dims, slab_w, halo,
                           max_o_local=cfg.max_o)
    pidx, loc, mask, ray_mask = q(xyz, alive, raypos)

    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref.sample_mask))
    np.testing.assert_allclose(np.asarray(loc), np.asarray(ref.sample_loc_w),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ray_mask), np.asarray(ref.ray_mask))
    # neighbor sets must agree per shading slot (order-insensitive:
    # equal-distance ties can legally order differently across slabs)
    a = np.sort(np.asarray(pidx), axis=-1)
    b = np.sort(np.asarray(ref.sample_pidx), axis=-1)
    np.testing.assert_array_equal(a, b)
