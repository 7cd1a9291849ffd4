"""Scene-editing tests: rigid transforms with per-point Rw2c.

The strong invariant: rendering an edited (rigidly rotated) scene from
a correspondingly rotated camera must reproduce the original render —
per-point Rw2c makes view-dependent features rotation-equivariant
(reference: run/editing.py:190-203, studio_model.py:303-312).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.data.synthetic import (
    camera_rays, make_sphere_scene, sphere_config)
from pointnerf2studio_tpu.edit import apply_rigid_transform, load_and_merge_parts
from pointnerf2studio_tpu.models import neural_points as npts
from pointnerf2studio_tpu.models.render import render_rays_jit
from pointnerf2studio_tpu.ops.grid import build_grid_from_points
from pointnerf2studio_tpu.utils import checkpoint_io as cio


def rot_z90():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    return T


class TestRigidTransform:
    def test_xyz_and_rw2c_composition(self, rng):
        xyz = rng.standard_normal((10, 3)).astype(np.float32)
        T = rot_z90()
        new_xyz, new_rw2c = apply_rigid_transform(xyz, np.eye(3, dtype=np.float32), T)
        np.testing.assert_allclose(new_xyz, xyz @ T[:3, :3].T, rtol=1e-6)
        assert new_rw2c.shape == (10, 3, 3)
        # Rw2c undoes the rotation: rotated world dir -> canonical frame
        v = rng.standard_normal(3).astype(np.float32)
        v_rot = T[:3, :3] @ v
        np.testing.assert_allclose(v_rot @ new_rw2c[0], v, atol=1e-5)


class TestMergeParts:
    def test_merge_two_parts(self, rng, tmp_path):
        import jax
        from pointnerf2studio_tpu.config import AggregatorConfig
        from pointnerf2studio_tpu.models.aggregator import init_aggregator_params

        params = init_aggregator_params(jax.random.PRNGKey(0), AggregatorConfig())

        def make_part(n, seed):
            r = np.random.default_rng(seed)
            return npts.from_arrays(
                r.standard_normal((n, 3)).astype(np.float32),
                r.standard_normal((n, 32)).astype(np.float32),
                r.uniform(size=(n, 1)).astype(np.float32),
                r.standard_normal((n, 3)).astype(np.float32),
                r.uniform(size=(n, 3)).astype(np.float32))

        pa = str(tmp_path / "a.pth")
        pb = str(tmp_path / "b.pth")
        cio.export_torch_checkpoint(params, make_part(30, 1), pa)
        cio.export_torch_checkpoint(params, make_part(20, 2), pb)
        tf = str(tmp_path / "t.npy")
        np.save(tf, rot_z90())

        p2, merged = load_and_merge_parts([pa, pb], [None, tf])
        assert merged.capacity == 50
        assert merged.Rw2c.ndim == 3 and merged.Rw2c.shape == (50, 3, 3)
        # part a untouched (identity Rw2c), part b rotated
        np.testing.assert_allclose(np.asarray(merged.Rw2c)[0], np.eye(3),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(merged.Rw2c)[35], np.eye(3))


class TestEquivariance:
    def test_rotated_scene_rotated_camera_matches(self):
        """render(scene, cam) == render(Rz90(scene), Rz90(cam))."""
        scene = make_sphere_scene(n_points=3000, cfg=sphere_config(sr=16, d=48))
        T = rot_z90()
        R = T[:3, :3]

        raydirs = camera_rays(scene.campos, scene.camrotc2w, 10, 10, 12.0)
        out0 = render_rays_jit(scene.params, scene.cloud, scene.grid,
                               scene.campos, scene.camrotc2w, raydirs,
                               scene.near, scene.far, scene.cfg)

        xyz_r, rw2c_r = apply_rigid_transform(
            np.asarray(scene.cloud.xyz), np.asarray(scene.cloud.Rw2c), T)
        # dirs are world-frame vectors: rotate them with the scene
        cloud_r = scene.cloud.replace(
            xyz=jnp.asarray(xyz_r),
            points_dir=jnp.asarray(np.asarray(scene.cloud.points_dir) @ R.T),
            Rw2c=jnp.asarray(rw2c_r))
        grid_r = build_grid_from_points(cloud_r.xyz, cloud_r.alive,
                                        scene.cfg.query)
        campos_r = jnp.asarray(R @ np.asarray(scene.campos))
        camrot_r = jnp.asarray(R @ np.asarray(scene.camrotc2w))
        raydirs_r = jnp.asarray(np.asarray(raydirs) @ R.T)
        out1 = render_rays_jit(scene.params, cloud_r, grid_r,
                               campos_r, camrot_r, raydirs_r,
                               scene.near, scene.far, scene.cfg)

        m0 = np.asarray(out0.ray_mask)
        m1 = np.asarray(out1.ray_mask)
        # grids are rebuilt in a rotated frame; allow boundary flips
        assert (m0 == m1).mean() > 0.95
        both = m0 & m1
        c0 = np.asarray(out0.coarse_raycolor)[both]
        c1 = np.asarray(out1.coarse_raycolor)[both]
        err = np.abs(c0 - c1).mean()
        assert err < 0.02, f"rotation equivariance broken: mean err {err}"
