"""Candidate-cache K-NN: equivalence with the exact scan search."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.config import QueryConfig
from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.render import render_rays_jit
from pointnerf2studio_tpu.ops.grid import build_grid_from_points
from pointnerf2studio_tpu.ops.query import (
    knn_for_locs, knn_from_cache, mask_raypos_qslot)


def small_cfg(**kw):
    base = dict(
        vsize=(0.1, 0.1, 0.1), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        ranges=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0),
        SR=8, K=4, max_o=512, P=4, z_depth_dim=32, grid_dim_pad=8,
        use_cache=True, cand_cap=512, max_q=16384,
    )
    base.update(kw)
    return QueryConfig(**base)


@pytest.fixture(scope="module")
def scene300(rng_mod=np.random.default_rng(3)):
    cfg = small_cfg()
    xyz = rng_mod.uniform(-0.8, 0.8, size=(300, 3)).astype(np.float32)
    grid = build_grid_from_points(
        jnp.asarray(xyz), jnp.ones(300, bool), cfg)
    return cfg, xyz, grid


class TestCacheStructure:
    def test_qslots_cover_dilated_voxels(self, scene300):
        cfg, xyz, grid = scene300
        q = np.asarray(grid.cache.coor_2_qslot)
        occ = np.asarray(grid.coor_occ)
        np.testing.assert_array_equal(q >= 0, occ)
        n_q = int(np.asarray(grid.cache.n_q))
        assert n_q == occ.sum()
        ids = np.sort(q[q >= 0])
        np.testing.assert_array_equal(ids, np.arange(n_q))

    def test_qslot_capacity_overflow_drops_voxels(self):
        cfg = small_cfg(max_q=64)
        rng = np.random.default_rng(5)
        xyz = rng.uniform(-0.8, 0.8, size=(300, 3)).astype(np.float32)
        grid = build_grid_from_points(jnp.asarray(xyz), jnp.ones(300, bool), cfg)
        q = np.asarray(grid.cache.coor_2_qslot)
        assert (q >= 0).sum() == 64          # capped deterministically
        assert q.max() == 63

    def test_cache_candidates_sorted_by_shell(self, scene300):
        cfg, xyz, grid = scene300
        pack = np.asarray(grid.cache.cand_pack)
        pidx = pack[..., 3].view(np.int32)
        shell = pack[..., 4]
        valid = pidx >= 0
        for qs in range(min(50, pack.shape[0])):
            sh = shell[qs][valid[qs]]
            assert np.all(np.diff(sh) >= 0), "shells not ascending"


class TestCacheEquivalence:
    def test_matches_exact_knn(self, scene300, rng):
        """With cand_cap >= 27*P (no truncation) the cache K-NN must
        select exactly the same neighbor sets as the scan search."""
        cfg, xyz, grid = scene300
        # random query locations inside the cloud
        locs = rng.uniform(-0.7, 0.7, size=(500, 3)).astype(np.float32)
        qslot = mask_raypos_qslot(grid, jnp.asarray(locs)[:, None, :])[:, 0]
        mask = qslot >= 0
        radius2 = cfg.radius_limit ** 2
        got = np.asarray(knn_from_cache(
            grid, qslot, jnp.asarray(locs), mask, cfg.K, radius2,
            num_shells=2, layered=True))
        expect = np.asarray(knn_for_locs(
            grid, jnp.asarray(xyz), jnp.asarray(locs), mask, cfg.K,
            radius2, cfg.kernel_size, layered=True, chunk=128))
        for i in range(500):
            assert sorted(p for p in got[i] if p >= 0) == \
                sorted(p for p in expect[i] if p >= 0), f"query {i}"

    def test_render_cache_vs_exact(self):
        """Full render with cache on vs off must agree."""
        scene = make_sphere_scene(n_points=3000, cfg=sphere_config(sr=16, d=48))
        cfg_off = dataclasses.replace(
            scene.cfg, query=dataclasses.replace(
                scene.cfg.query, use_cache=False))
        cfg_on = dataclasses.replace(
            scene.cfg, query=dataclasses.replace(
                scene.cfg.query, use_cache=True,
                cand_cap=324, max_q=400_000))
        raydirs = camera_rays(scene.campos, scene.camrotc2w, 10, 10, 12.0)
        grid_off = build_grid_from_points(
            scene.cloud.xyz, scene.cloud.alive, cfg_off.query)
        grid_on = build_grid_from_points(
            scene.cloud.xyz, scene.cloud.alive, cfg_on.query)
        o0 = render_rays_jit(scene.params, scene.cloud, grid_off,
                             scene.campos, scene.camrotc2w, raydirs,
                             scene.near, scene.far, cfg_off)
        o1 = render_rays_jit(scene.params, scene.cloud, grid_on,
                             scene.campos, scene.camrotc2w, raydirs,
                             scene.near, scene.far, cfg_on)
        np.testing.assert_array_equal(np.asarray(o0.ray_mask),
                                      np.asarray(o1.ray_mask))
        np.testing.assert_allclose(
            np.asarray(o0.coarse_raycolor), np.asarray(o1.coarse_raycolor),
            rtol=1e-4, atol=1e-5)
