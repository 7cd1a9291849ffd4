"""Plane background model (set_bg equivalent)."""

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.bg_plane import (
    fg_pixel_mask, plane_background_colors, project_points,
    ray_plane_intersection)

H = W = 16
F = 10.0
K = jnp.asarray([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], jnp.float32)
W2C = jnp.eye(4, dtype=jnp.float32)        # camera at origin, +z forward
CAMPOS = jnp.zeros(3)


def make_rays(n=5):
    """Rays fanning out around +z."""
    xs = np.linspace(-0.3, 0.3, n, dtype=np.float32)
    d = np.stack([xs, np.zeros_like(xs), np.ones_like(xs)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d)


class TestIntersection:
    def test_hits_plane_z3(self):
        rays = make_rays()
        pts, ok = ray_plane_intersection(
            CAMPOS, rays, jnp.array([0.0, 0.0, 3.0]),
            jnp.array([0.0, 0.0, 1.0]))
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(pts)[:, 2], 3.0, atol=1e-5)

    def test_parallel_ray_invalid(self):
        rays = jnp.asarray([[1.0, 0.0, 0.0]])
        pts, ok = ray_plane_intersection(
            CAMPOS, rays, jnp.array([0.0, 0.0, 3.0]),
            jnp.array([0.0, 0.0, 1.0]))
        assert not bool(ok[0])
        np.testing.assert_allclose(np.asarray(pts)[0], 0.0)


class TestProjection:
    def test_center_point(self):
        xy, inb = project_points(jnp.asarray([[0.0, 0.0, 2.0]]), W2C, K,
                                 (H, W))
        np.testing.assert_allclose(np.asarray(xy)[0], [W / 2, H / 2],
                                   atol=1e-5)
        assert bool(inb[0])

    def test_behind_camera_rejected(self):
        _, inb = project_points(jnp.asarray([[0.0, 0.0, -2.0]]), W2C, K,
                                (H, W))
        assert not bool(inb[0])


class TestFgMask:
    def test_projected_point_marks_pixel(self):
        pts = jnp.asarray([[0.0, 0.0, 1.0]])
        m = np.asarray(fg_pixel_mask(pts, W2C, K, (H, W)))
        assert m[H // 2, W // 2] == 1.0
        assert m.sum() == 1.0


class TestPlaneBackground:
    def test_plane_color_sampled(self):
        plane_color = jnp.asarray([0.5, 0.5, 0.5])
        images = jnp.full((1, H, W, 3), 0.5, jnp.float32)
        bg, valid = plane_background_colors(
            CAMPOS, make_rays(), jnp.array([0.0, 0.0, 3.0]),
            jnp.array([0.0, 0.0, 1.0]), plane_color,
            images, W2C[None], K[None])
        v = np.asarray(valid)
        assert v.any()
        np.testing.assert_allclose(np.asarray(bg)[v], 0.5, atol=1e-5)

    def test_wrong_color_rejected(self):
        plane_color = jnp.asarray([0.5, 0.5, 0.5])
        images = jnp.full((1, H, W, 3), 0.9, jnp.float32)  # off-plane color
        bg, valid = plane_background_colors(
            CAMPOS, make_rays(), jnp.array([0.0, 0.0, 3.0]),
            jnp.array([0.0, 0.0, 1.0]), plane_color,
            images, W2C[None], K[None])
        assert not np.asarray(valid).any()
        np.testing.assert_allclose(np.asarray(bg), 0.0)

    def test_foreground_blocks(self):
        plane_color = jnp.asarray([0.5, 0.5, 0.5])
        images = jnp.full((1, H, W, 3), 0.5, jnp.float32)
        # a dense blob of fg points in front of the central ray
        g = np.linspace(-0.05, 0.05, 5, dtype=np.float32)
        gx, gy = np.meshgrid(g, g)
        pts = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.ones(25, np.float32)], -1))
        rays = jnp.asarray([[0.0, 0.0, 1.0]])
        bg, valid = plane_background_colors(
            CAMPOS, rays, jnp.array([0.0, 0.0, 3.0]),
            jnp.array([0.0, 0.0, 1.0]), plane_color,
            images, W2C[None], K[None], points_xyz=pts)
        assert not np.asarray(valid)[0]
