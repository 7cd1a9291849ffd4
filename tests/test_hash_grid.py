"""Sparse (bucketized-hash) grid vs the dense grid: identical
occupancy, dilation, qslot numbering, and per-voxel point lists on
scenes where both fit — plus a huge-extent build (logical dims far
past any dense table's HBM budget) that only the hash grid can
represent. Reference semantics anchor: the CUDA grid-build kernels
(pointnerf/models/neural_points/cuda/query_worldcoords.cu:18-162) as
re-specified by ops/grid.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import QueryConfig
from pointnerf2studio_tpu.ops.grid import build_grid_from_points
from pointnerf2studio_tpu.ops.hash_grid import (
    build_hash_grid_from_points, hash_lookup, mask_raypos_hash)


def _cfg(**kw):
    base = dict(vsize=(0.05, 0.05, 0.05), vscale=(2, 2, 2), SR=16, K=8,
                P=4, max_o=4096, z_depth_dim=32, use_cache=False)
    base.update(kw)
    return QueryConfig(**base)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    # clustered surface-ish cloud: points on a sphere shell + noise
    d = rng.normal(size=(3000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    xyz = d * 0.5 + rng.normal(scale=0.01, size=(3000, 3))
    alive = rng.random(3000) > 0.1
    return jnp.asarray(xyz, jnp.float32), jnp.asarray(alive)


def test_matches_dense_grid(cloud):
    xyz, alive = cloud
    cfg = _cfg()
    dense = build_grid_from_points(xyz, alive, cfg)
    hg = build_hash_grid_from_points(xyz, alive, cfg, bucket_slots=8)

    assert int(hg.overflow) == 0
    assert int(hg.n_occ) == int(dense.n_occ)

    # dense tables, flattened to (coords -> values) for comparison
    dd = np.asarray(dense.dims)
    occ_np = np.asarray(dense.coor_2_occ)
    dil_np = np.asarray(dense.coor_occ)
    qslot_np = np.cumsum(dil_np.reshape(-1).astype(np.int64)).reshape(
        dil_np.shape) - 1  # dense row-major qslot numbering

    # the hash grid's logical dims may differ from the dense dims only
    # by the dense build's grid_dim_pad rounding
    assert np.all(np.asarray(hg.dims) <= dd)

    # probe EVERY voxel of the dense grid through the hash table
    gx, gy, gz = dd
    coords = np.stack(np.meshgrid(np.arange(gx), np.arange(gy),
                                  np.arange(gz), indexing="ij"),
                      -1).reshape(-1, 3).astype(np.int32)
    found, occ_slot, qslot = jax.jit(hash_lookup)(hg, jnp.asarray(coords))
    found = np.asarray(found)
    occ_slot = np.asarray(occ_slot)
    qslot = np.asarray(qslot)

    dil_flat = dil_np.reshape(-1)
    occ_flat = occ_np.reshape(-1)
    q_flat = np.where(dil_flat, qslot_np.reshape(-1), -1)

    # voxels beyond the hash grid's (unpadded) logical dims are
    # unoccupied in the dense grid too, but dilation can reach them
    # only from in-bounds occupied voxels, which both builds share; the
    # dense pad region contains no points, so restrict to hash bounds
    hdims = np.asarray(hg.dims)
    inh = np.all(coords < hdims, axis=-1)
    np.testing.assert_array_equal(found[inh], dil_flat[inh])
    assert not np.any(found[~inh] & ~dil_flat[~inh].astype(bool))
    np.testing.assert_array_equal(occ_slot[inh], occ_flat[inh])
    np.testing.assert_array_equal(qslot[inh], q_flat[inh])

    # per-voxel point lists agree (same slot numbering: (x, y, z) order
    # == dense flat-id order)
    np.testing.assert_array_equal(np.asarray(hg.occ_2_pnts),
                                  np.asarray(dense.occ_2_pnts))
    np.testing.assert_array_equal(np.asarray(hg.occ_numpnts),
                                  np.asarray(dense.occ_numpnts))
    np.testing.assert_array_equal(np.asarray(hg.occ_2_coor),
                                  np.asarray(dense.occ_2_coor))


def test_mask_raypos_matches_dense(cloud):
    xyz, alive = cloud
    cfg = _cfg()
    dense = build_grid_from_points(xyz, alive, cfg)
    hg = build_hash_grid_from_points(xyz, alive, cfg)

    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 32, 3)),
                      jnp.float32)
    from pointnerf2studio_tpu.ops.grid import voxel_coords
    m_hash = np.asarray(jax.jit(mask_raypos_hash)(hg, pos))
    gc = np.asarray(voxel_coords(pos, dense.ranges_min,
                                 dense.scaled_vsize))
    dd = np.asarray(dense.dims)
    hd = np.asarray(hg.dims)
    inb = np.all((gc >= 0) & (gc < np.minimum(dd, hd)), -1)
    dil = np.asarray(dense.coor_occ)
    gcc = np.clip(gc, 0, dd - 1)
    m_dense = inb & dil[gcc[..., 0], gcc[..., 1], gcc[..., 2]]
    np.testing.assert_array_equal(m_hash & inb, m_dense)


def test_huge_extent_build():
    """Logical dims ~(4096)^3: a dense int32 table would need ~275 GB;
    the hash grid builds in MBs and answers lookups correctly (checked
    against a NumPy brute-force dilation of the same point set)."""
    rng = np.random.default_rng(2)
    n = 5000
    # points spread over a 100-unit extent at vsize 0.012*2 -> dims ~4166
    xyz = jnp.asarray(rng.uniform(-50, 50, size=(n, 3)), jnp.float32)
    alive = jnp.ones((n,), bool)
    cfg = _cfg(vsize=(0.012, 0.012, 0.012), max_o=8192,
               ranges=(-60.0,) * 3 + (60.0,) * 3)
    hg = build_hash_grid_from_points(xyz, alive, cfg)
    dims = np.asarray(hg.dims)
    assert np.all(dims > 3000), dims    # genuinely beyond dense reach
    assert int(hg.overflow) == 0
    assert int(hg.n_occ) <= n

    # NumPy brute force on the occupied set
    rmin = np.asarray(hg.ranges_min)
    svs = np.asarray(hg.scaled_vsize)
    vox = np.floor((np.asarray(xyz) - rmin) / svs).astype(np.int64)
    inb = np.all((vox >= 0) & (vox < dims), -1)
    occ = np.unique(vox[inb], axis=0)
    assert int(hg.n_occ) == occ.shape[0]
    occ_set = set(map(tuple, occ))
    dil_set = set()
    for o in occ:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    c = (o[0] + dx, o[1] + dy, o[2] + dz)
                    if all(0 <= c[i] < dims[i] for i in range(3)):
                        dil_set.add(c)
    assert int(hg.n_q) == len(dil_set)

    # occupied voxels answer found+occ_slot; their +x neighbor answers
    # dilated; a far-away voxel answers not-found
    probes = np.concatenate([occ, occ + np.array([1, 0, 0]),
                             occ + np.array([911, 0, 0])])
    probes = np.clip(probes, 0, dims - 1).astype(np.int32)
    found, occ_slot, qslot = jax.jit(hash_lookup)(
        hg, jnp.asarray(probes))
    found = np.asarray(found)
    occ_slot = np.asarray(occ_slot)
    k = occ.shape[0]
    assert found[:k].all()
    assert (occ_slot[:k] >= 0).all()
    # occ slots are the (x, y, z)-order ranks
    np.testing.assert_array_equal(occ_slot[:k], np.arange(k))
    for i in range(k):
        t = tuple(probes[k + i])
        assert found[k + i] == (t in dil_set)
    for i in range(k):
        t = tuple(probes[2 * k + i])
        assert found[2 * k + i] == (t in dil_set)
    # qslots are a permutation-free ranking over the dilated set
    qs = np.asarray(qslot)[:k]
    assert (qs >= 0).all() and qs.max() < len(dil_set)

    # memory sanity: table bytes stay in the tens of MBs
    assert hg.table.size * 4 < 64 * 2**20


def test_overflow_retry():
    """An adversarially tiny initial bucket count still converges via
    the doubling loop (monkeypatched suggest_buckets)."""
    import pointnerf2studio_tpu.ops.hash_grid as hgm
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(2000, 3)), jnp.float32)
    alive = jnp.ones((2000,), bool)
    orig = hgm.suggest_buckets
    try:
        hgm.suggest_buckets = lambda n, s=16: 1024   # deliberately tiny
        hg = hgm.build_hash_grid_from_points(
            xyz, alive, _cfg(), max_attempts=8)
        assert int(hg.overflow) == 0
        assert hg.n_buckets > 1024
    finally:
        hgm.suggest_buckets = orig
