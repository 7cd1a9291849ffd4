"""Loss registry: color/miss/depth/bg/zero-one/sparse items.

Semantics from the reference's BaseRenderingModel.compute_losses
(reference: pointnerf/models/base_rendering_model.py:533-663).
"""

import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.config import TrainConfig
from pointnerf2studio_tpu.models.render import RenderOutput
from pointnerf2studio_tpu.train.loss import compute_loss, compute_losses

RNG = np.random.default_rng(3)
R, M, K = 16, 24, 4


def make_out():
    return RenderOutput(
        coarse_raycolor=jnp.asarray(RNG.random((R, 3)), jnp.float32),
        ray_mask=jnp.asarray(RNG.random(R) > 0.5),
        acc=jnp.asarray(RNG.random(R), jnp.float32),
        depth=jnp.asarray(RNG.random(R) * 3, jnp.float32),
        conf_coefficient=jnp.asarray(RNG.random((M, K)), jnp.float32),
        pnt_mask=jnp.asarray(RNG.random((M, K)) > 0.3),
        weight=jnp.asarray(RNG.random((M, K)), jnp.float32),
    )


OUT = make_out()
GT = jnp.asarray(RNG.random((R, 3)), jnp.float32)


class TestColorItems:
    def test_ray_masked_mse(self):
        t = TrainConfig(zero_one_loss_weight=0.0)
        total, parts = compute_losses(OUT, GT, t)
        m = np.asarray(OUT.ray_mask)
        ref = np.mean((np.asarray(OUT.coarse_raycolor)[m]
                       - np.asarray(GT)[m]) ** 2)
        np.testing.assert_allclose(
            float(parts["ray_masked_coarse_raycolor_loss"]), ref, rtol=1e-5)

    def test_ray_miss_scaled_by_count(self):
        t = TrainConfig(color_loss_items=("ray_miss_coarse_raycolor",),
                        color_loss_weights=(1.0,), zero_one_loss_weight=0.0)
        _, parts = compute_losses(OUT, GT, t)
        miss = ~np.asarray(OUT.ray_mask)
        d = (np.asarray(OUT.coarse_raycolor)[miss] - np.asarray(GT)[miss])
        ref = np.mean(d ** 2) * miss.sum()
        np.testing.assert_allclose(
            float(parts["ray_miss_coarse_raycolor_loss"]), ref, rtol=1e-5)

    def test_ray_depth_masked(self):
        """MSE over rays with valid GT depth (reference
        base_rendering_model.py:564-570: depth_gt > 0 per pixel)."""
        t = TrainConfig(
            color_loss_items=("ray_depth_masked_coarse_raycolor",),
            color_loss_weights=(1.0,), zero_one_loss_weight=0.0)
        gt_depth = jnp.asarray(
            np.where(RNG.random(R) > 0.5, RNG.random(R) * 3, 0.0),
            jnp.float32)
        _, parts = compute_losses(OUT, GT, t, gt_depth=gt_depth)
        dm = np.asarray(gt_depth) > 0
        ref = np.mean((np.asarray(OUT.coarse_raycolor)[dm]
                       - np.asarray(GT)[dm]) ** 2)
        np.testing.assert_allclose(
            float(parts["ray_depth_masked_coarse_raycolor_loss"]), ref,
            rtol=1e-5)
        # gt_mask fallback path (blender: alpha>0 == depth valid)
        _, parts2 = compute_losses(OUT, GT, t,
                                   gt_mask=jnp.asarray(dm))
        np.testing.assert_allclose(
            float(parts2["ray_depth_masked_coarse_raycolor_loss"]), ref,
            rtol=1e-5)

    def test_plain_mse(self):
        t = TrainConfig(color_loss_items=("coarse_raycolor",),
                        color_loss_weights=(2.0,), zero_one_loss_weight=0.0)
        total, parts = compute_losses(OUT, GT, t)
        ref = np.mean((np.asarray(OUT.coarse_raycolor) - np.asarray(GT)) ** 2)
        np.testing.assert_allclose(float(parts["coarse_raycolor_loss"]),
                                   ref, rtol=1e-5)
        np.testing.assert_allclose(float(total), 2 * ref + 1e-6, rtol=1e-5)


class TestAuxItems:
    def test_depth_and_bg(self):
        t = TrainConfig(color_loss_items=(), color_loss_weights=(),
                        zero_one_loss_weight=0.0,
                        depth_loss_weight=1.0, bg_loss_weight=1.0)
        gt_mask = jnp.asarray(RNG.random(R) > 0.4)
        gt_depth = jnp.asarray(RNG.random(R) * 3, jnp.float32)
        total, parts = compute_losses(OUT, GT, t, gt_mask=gt_mask,
                                      gt_depth=gt_depth)
        m = np.asarray(gt_mask).astype(np.float32)
        ref_d = np.mean(((np.asarray(OUT.depth) - np.asarray(gt_depth)) * m) ** 2)
        np.testing.assert_allclose(float(parts["depth_loss"]), ref_d, rtol=1e-5)
        bg = 1 - m
        ref_b = np.mean(((1 - np.asarray(OUT.acc)) * bg - bg) ** 2)
        np.testing.assert_allclose(float(parts["bg_loss"]), ref_b, rtol=1e-5)

    def test_sparse_loss(self):
        t = TrainConfig(color_loss_items=(), color_loss_weights=(),
                        zero_one_loss_weight=0.0, sparse_loss_weight=0.5)
        total, parts = compute_losses(OUT, GT, t)
        w = np.asarray(OUT.weight) * np.asarray(OUT.pnt_mask)
        conf = np.asarray(OUT.conf_coefficient)
        ref = (w * np.abs(1 - np.exp(-2 * conf))).sum() / (w.sum() + 1e-6)
        np.testing.assert_allclose(float(parts["sparse_loss"]), ref, rtol=1e-5)
        np.testing.assert_allclose(float(total), 0.5 * ref, rtol=1e-5)

    def test_zero_one_over_valid_slots(self):
        t = TrainConfig(color_loss_items=(), color_loss_weights=(),
                        zero_one_loss_weight=1e-2)
        _, parts = compute_losses(OUT, GT, t)
        v = np.clip(np.asarray(OUT.conf_coefficient), 1e-3, 1 - 1e-3)
        pm = np.asarray(OUT.pnt_mask)
        ref = (np.log(v) + np.log(1 - v))[pm].mean() * 1e-2
        np.testing.assert_allclose(float(parts["conf_coefficient_loss"]),
                                   ref, rtol=1e-5)


class TestBackwardCompat:
    def test_compute_loss_wrapper(self):
        total, parts = compute_loss(OUT, GT)
        assert "ray_masked_coarse_raycolor_loss" in parts
        assert "conf_coefficient_loss" in parts
        assert np.isfinite(float(total))
