"""Metrics + full-image evaluator tests."""

import numpy as np
import pytest

from pointnerf2studio_tpu.utils import metrics as M


class TestMetrics:
    def test_psnr_known_value(self):
        a = np.zeros((8, 8, 3))
        b = np.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(M.psnr(a, b), 20.0, rtol=1e-6)
        assert M.psnr(a, a) == float("inf")

    def test_rmse(self):
        a = np.zeros((4, 4))
        b = np.full((4, 4), 0.5)
        np.testing.assert_allclose(M.rmse(a, b), 0.5, rtol=1e-9)

    def test_ssim_identity(self, rng):
        x = rng.uniform(size=(32, 32, 3))
        assert M.ssim(x, x) == pytest.approx(1.0, abs=1e-9)

    def test_ssim_decreases_with_noise(self, rng):
        x = rng.uniform(size=(32, 32, 3))
        s1 = M.ssim(x, np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1))
        s2 = M.ssim(x, np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1))
        assert 1 > s1 > s2 > 0

    def test_ssim_constant_offset_analytic(self):
        """For constant images x=c1, y=c2: variances are 0, so
        SSIM = (2 c1 c2 + C1) / (c1^2 + c2^2 + C1)."""
        c1v, c2v = 0.3, 0.5
        x = np.full((16, 16), c1v)
        y = np.full((16, 16), c2v)
        C1 = 0.01 ** 2
        expect = (2 * c1v * c2v + C1) / (c1v ** 2 + c2v ** 2 + C1)
        np.testing.assert_allclose(M.ssim(x, y), expect, rtol=1e-9)


class TestEvaluator:
    def test_full_image_eval_on_synthetic(self):
        from pointnerf2studio_tpu.data.synthetic import (
            camera_rays, make_sphere_scene, sphere_config)
        from pointnerf2studio_tpu.train.evaluator import (
            make_render_chunk_fn, render_image)

        scene = make_sphere_scene(n_points=2000, cfg=sphere_config(sr=8, d=32))
        h = w = 16
        rays = np.asarray(camera_rays(scene.campos, scene.camrotc2w, h, w, 10.0))
        fn = make_render_chunk_fn(scene.cfg)
        out = render_image(fn, scene.params, scene.cloud, scene.grid,
                           np.asarray(scene.campos),
                           np.asarray(scene.camrotc2w), rays, (h, w),
                           scene.near, scene.far, chunk=64)
        assert out["coarse_raycolor"].shape == (h, w, 3)
        assert out["ray_mask"].shape == (h, w)
        # center hits, corner misses (white)
        assert out["ray_mask"][h // 2, w // 2]
        np.testing.assert_allclose(out["coarse_raycolor"][0, 0], 1.0)
        m = M.compute_all(out["coarse_raycolor"],
                          np.ones((h, w, 3), np.float32))
        assert np.isfinite(m["psnr"]) and 0 < m["ssim"] <= 1

    def test_spherical_poses_look_at_origin(self):
        from pointnerf2studio_tpu.train.evaluator import spherical_poses
        poses = spherical_poses(8, radius=4.0)
        assert poses.shape == (8, 4, 4)
        for p in poses:
            campos, fwd = p[:3, 3], p[:3, 2]
            np.testing.assert_allclose(np.linalg.norm(campos), 4.0, rtol=1e-5)
            # +z column points at the origin
            np.testing.assert_allclose(
                fwd, -campos / np.linalg.norm(campos), atol=1e-5)
            # orthonormal rotation
            np.testing.assert_allclose(
                p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5)


def test_metrics_over_dirs(tmp_path):
    from PIL import Image
    from pointnerf2studio_tpu.utils.metrics import metrics_over_dirs
    rng = np.random.default_rng(0)
    (tmp_path / "pred").mkdir()
    (tmp_path / "gt").mkdir()
    for i in range(3):
        gt = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        noise = np.clip(gt.astype(int) + rng.integers(-5, 5, gt.shape),
                        0, 255).astype(np.uint8)
        Image.fromarray(gt).save(tmp_path / "gt" / f"{i:03d}.png")
        Image.fromarray(noise).save(tmp_path / "pred" / f"{i:03d}.png")
    m = metrics_over_dirs(str(tmp_path / "pred"), str(tmp_path / "gt"))
    assert m["n_images"] == 3
    assert m["psnr"] > 30
    assert 0.5 < m["ssim"] <= 1.0
    assert m["rmse"] < 0.05
