"""Render-step tests: compaction equivalence, background fill, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import dataclasses

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.models.render import render_rays_jit


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(n_points=3_000, cfg=sphere_config(sr=16, d=48))


def _render(scene, cfg, raydirs):
    return render_rays_jit(scene.params, scene.cloud, scene.grid,
                           scene.campos, scene.camrotc2w, raydirs,
                           scene.near, scene.far, cfg)


class TestCompaction:
    def test_compacted_matches_uncompacted(self, scene):
        """With a budget large enough to hold all valid slots, the
        compacted path must reproduce the uncompacted one exactly."""
        raydirs = camera_rays(scene.campos, scene.camrotc2w, 12, 12, 14.0)
        cfg_off = dataclasses.replace(
            scene.cfg, query=dataclasses.replace(scene.cfg.query,
                                                 compact_budget=0))
        cfg_on = dataclasses.replace(
            scene.cfg, query=dataclasses.replace(scene.cfg.query,
                                                 compact_budget=16))
        out_off = _render(scene, cfg_off, raydirs)
        out_on = _render(scene, cfg_on, raydirs)
        np.testing.assert_array_equal(
            np.asarray(out_off.ray_mask), np.asarray(out_on.ray_mask))
        np.testing.assert_allclose(
            np.asarray(out_off.coarse_raycolor),
            np.asarray(out_on.coarse_raycolor), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out_off.acc), np.asarray(out_on.acc),
            rtol=1e-5, atol=1e-6)

    def test_small_budget_still_renders(self, scene):
        """A tight budget drops excess slots but stays valid + finite."""
        raydirs = camera_rays(scene.campos, scene.camrotc2w, 12, 12, 14.0)
        cfg_tight = dataclasses.replace(
            scene.cfg, query=dataclasses.replace(scene.cfg.query,
                                                 compact_budget=2))
        out = _render(scene, cfg_tight, raydirs)
        img = np.asarray(out.coarse_raycolor)
        assert np.all(np.isfinite(img))
        assert np.asarray(out.ray_mask).any()


class TestRenderSemantics:
    def test_miss_rays_get_background(self, scene):
        raydirs = jnp.asarray(  # from (0,0,2) heading +z: away from the sphere
            np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32))
        out = _render(scene, scene.cfg, raydirs)
        assert not np.asarray(out.ray_mask).any()
        np.testing.assert_allclose(np.asarray(out.coarse_raycolor), 1.0)

    def test_hit_rays_accumulate(self, scene):
        raydirs = camera_rays(scene.campos, scene.camrotc2w, 8, 8, 10.0)
        out = _render(scene, scene.cfg, raydirs)
        acc = np.asarray(out.acc).reshape(8, 8)
        mask = np.asarray(out.ray_mask).reshape(8, 8)
        assert mask[4, 4]
        assert acc[4, 4] > 0.3  # density head biased positive in fixture

    def test_depth_in_near_far_range(self, scene):
        raydirs = camera_rays(scene.campos, scene.camrotc2w, 8, 8, 10.0)
        out = _render(scene, scene.cfg, raydirs)
        mask = np.asarray(out.ray_mask)
        depth = np.asarray(out.depth)[mask]
        acc = np.asarray(out.acc)[mask]
        solid = acc > 0.9
        # camera is 2.0 from origin, sphere radius 0.5
        assert np.all(depth[solid] > 1.2) and np.all(depth[solid] < 2.8)

    def test_training_jitter_changes_with_key(self, scene):
        raydirs = camera_rays(scene.campos, scene.camrotc2w, 8, 8, 10.0)
        o1 = render_rays_jit(scene.params, scene.cloud, scene.grid,
                             scene.campos, scene.camrotc2w, raydirs,
                             scene.near, scene.far, scene.cfg,
                             key=jax.random.PRNGKey(0), training=True)
        o2 = render_rays_jit(scene.params, scene.cloud, scene.grid,
                             scene.campos, scene.camrotc2w, raydirs,
                             scene.near, scene.far, scene.cfg,
                             key=jax.random.PRNGKey(1), training=True)
        assert not np.array_equal(np.asarray(o1.coarse_raycolor),
                                  np.asarray(o2.coarse_raycolor))
