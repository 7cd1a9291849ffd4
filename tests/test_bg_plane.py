"""Plane background model (set_bg equivalent) + end-to-end wiring."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.bg_plane import (
    create_all_bg, fg_pixel_mask, plane_background_colors,
    project_points, ray_plane_intersection)

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


class TestWiring:
    """cfg.bgmodel='plane' end-to-end: per-ray bg colors flow through
    render_rays / fast_render_rays and change the output vs the
    constant background (reference wiring:
    mvs_points_volumetric_model.py:272-310, train_ft.py:206-214)."""

    def _scene(self):
        from pointnerf2studio_tpu.data.synthetic import (
            camera_rays, make_sphere_scene, sphere_config)
        cfg = sphere_config(sr=16, d=48)
        s = make_sphere_scene(n_points=4000, cfg=cfg)
        rays = camera_rays(s.campos, s.camrotc2w, 16, 16, 12.0)
        return s, rays

    def test_render_uses_per_ray_bg(self):
        from pointnerf2studio_tpu.models.render import render_rays_jit
        s, rays = self._scene()
        base = render_rays_jit(s.params, s.cloud, s.grid, s.campos,
                               s.camrotc2w, rays, s.near, s.far, s.cfg)
        bg = jnp.broadcast_to(jnp.asarray([0.25, 0.5, 0.75]),
                              (rays.shape[0], 3))
        out = render_rays_jit(s.params, s.cloud, s.grid, s.campos,
                              s.camrotc2w, rays, s.near, s.far, s.cfg,
                              bg_ray_colors=bg)
        miss = ~np.asarray(base.ray_mask)
        assert miss.any() and (~miss).any()
        np.testing.assert_allclose(
            np.asarray(out.coarse_raycolor)[miss],
            np.broadcast_to([0.25, 0.5, 0.75], (miss.sum(), 3)),
            atol=1e-6)
        # hit rays blend (1-acc) of the new bg: differ from constant-bg
        hit_diff = np.abs(np.asarray(out.coarse_raycolor)
                          - np.asarray(base.coarse_raycolor))[~miss]
        assert hit_diff.max() > 1e-4

    def test_fast_render_uses_per_ray_bg(self):
        from pointnerf2studio_tpu.models.fast_render import (
            fast_render_rays_jit, make_fast_scene)
        s, rays = self._scene()
        cache, rmin, svs = make_fast_scene(s.cfg, s.cloud, s.grid)
        bg = jnp.broadcast_to(jnp.asarray([0.1, 0.2, 0.3]),
                              (rays.shape[0], 3))
        out = fast_render_rays_jit(
            s.params, s.cloud.Rw2c, cache, s.campos, s.camrotc2w, rays,
            s.near, s.far, s.cfg, rmin, svs, bg_ray_colors=bg)
        miss = ~np.asarray(out.ray_mask)
        assert miss.any()
        np.testing.assert_allclose(
            np.asarray(out.coarse_raycolor)[miss],
            np.broadcast_to([0.1, 0.2, 0.3], (miss.sum(), 3)), atol=1e-6)

    def test_create_all_bg_maps(self):
        """A plane-colored backdrop in the source views produces bg
        maps that differ from the constant background."""
        from pointnerf2studio_tpu.data.blender import BlenderDataset
        H = W = 24
        f = 20.0
        images = np.full((2, H, W, 3), 0.5, np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        poses[1, 0, 3] = 0.05
        intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                        np.float32)
        ds = BlenderDataset(images=images, poses=poses, intrinsics=intr,
                            near=1.0, far=5.0, split="train")
        cfg_obj = dataclasses.replace(
            __import__("pointnerf2studio_tpu.config",
                       fromlist=["PointNerfConfig"]).PointNerfConfig(),
            bgmodel="plane",
            bg_plane_pnt=(0.0, 0.0, 3.0),
            bg_plane_normal=(0.0, 0.0, 1.0),
            bg_plane_color=(0.5, 0.5, 0.5))
        maps = create_all_bg(cfg_obj, ds, chunk=256)
        assert maps.shape == (2, H, W, 3)
        center = maps[0, H // 2, W // 2]
        np.testing.assert_allclose(center, 0.5, atol=1e-5)
        # constant bg is white; the plane-sampled region is 0.5
        assert (np.abs(maps - 1.0) > 0.4).any()
