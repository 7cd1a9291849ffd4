"""Training losses.

Reference: `PointNerf.get_loss_dict`
(pointnerf/nerfstudio/studio_model.py:415-431):
  * ray_masked MSE over rays that hit occupied space (+1e-6),
  * confidence zero-one regularizer mean(log v + log(1-v)) * 1e-4.

Fixed-shape version: the dynamic `masked_select` means become
mask-weighted sums divided by mask counts. One documented deviation:
the reference's zero-one term averages over ALL [R,SR,K] gathered conf
slots, including invalid slots that clamp-gather point 0's confidence
(biasing point 0); we average over valid neighbor slots only.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import TrainConfig
from pointnerf2studio_tpu.models.render import RenderOutput


def compute_losses(
    out: RenderOutput,
    gt_rgb: jnp.ndarray,                 # [R, 3]
    t: TrainConfig,
    gt_mask: Optional[jnp.ndarray] = None,    # [R] 1=foreground
    gt_depth: Optional[jnp.ndarray] = None,   # [R]
    psum_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The reference's full loss registry over the render output
    (reference: base_rendering_model.py:533-663), fixed-shape: every
    dynamic `masked_select` mean becomes a mask-weighted sum divided by
    a (psum-able) mask count.
    """
    def gsum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, psum_axis) if psum_axis else s

    parts: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros((), jnp.float32)
    ray_mask_f = out.ray_mask.astype(jnp.float32)[:, None]       # [R, 1]

    for name, wgt in zip(t.color_loss_items, t.color_loss_weights):
        if name.startswith("ray_masked_"):
            se = jnp.square(out.coarse_raycolor - gt_rgb) * ray_mask_f
            loss = gsum(se) / jnp.maximum(gsum(ray_mask_f) * 3.0, 1.0)
        elif name.startswith("ray_miss_"):
            # MSE over missed rays, scaled by the miss count
            # (reference :553-562 multiplies the mean back by N_miss)
            miss = 1.0 - ray_mask_f
            se = jnp.square(out.coarse_raycolor - gt_rgb) * miss
            loss = gsum(se) / 3.0
        elif name.startswith("ray_depth_masked_"):
            # MSE over rays whose GT depth is valid — the reference
            # indexes a per-pixel `depth_gt > 0` map by pixel id
            # (base_rendering_model.py:564-570; the map is set at
            # mvs_points_volumetric_model.py:129,339). On blender data
            # depth_gt>0 == the alpha-foreground mask, passed here as
            # gt_mask (or derived from gt_depth when provided).
            if gt_depth is not None:
                dm = (gt_depth > 0).astype(jnp.float32)[:, None]
            elif gt_mask is not None:
                dm = gt_mask.astype(jnp.float32)[:, None]
            else:
                dm = jnp.ones_like(ray_mask_f)
            se = jnp.square(out.coarse_raycolor - gt_rgb) * dm
            loss = gsum(se) / jnp.maximum(gsum(dm) * 3.0, 1.0)
        else:
            se = jnp.square(out.coarse_raycolor - gt_rgb)
            n = gsum(jnp.ones_like(se)) / 3.0
            loss = gsum(se) / jnp.maximum(n * 3.0, 1.0)
        total = total + loss * wgt + 1e-6
        parts[f"{name}_loss"] = loss

    if t.depth_loss_weight > 0.0 and gt_depth is not None:
        m = gt_mask.astype(jnp.float32) if gt_mask is not None else 1.0
        se = jnp.square((out.depth - gt_depth) * m)
        loss = gsum(se) / jnp.maximum(gsum(jnp.ones_like(se)), 1.0)
        total = total + loss * t.depth_loss_weight
        parts["depth_loss"] = loss

    if t.bg_loss_weight > 0.0 and gt_mask is not None:
        bgw = 1.0 - out.acc                                       # [R]
        bg = 1.0 - gt_mask.astype(jnp.float32)
        se = jnp.square(bgw * bg - bg)
        loss = gsum(se) / jnp.maximum(gsum(jnp.ones_like(se)), 1.0)
        total = total + loss * t.bg_loss_weight
        parts["bg_loss"] = loss

    if t.zero_one_loss_weight > 0.0:
        v = jnp.clip(out.conf_coefficient, t.zero_epsilon,
                     1.0 - t.zero_epsilon)
        pm = out.pnt_mask.astype(jnp.float32)
        zo = gsum((jnp.log(v) + jnp.log(1.0 - v)) * pm) / jnp.maximum(
            gsum(pm), 1.0)
        loss = zo * t.zero_one_loss_weight
        total = total + loss
        parts["conf_coefficient_loss"] = loss

    if t.sparse_loss_weight > 0.0 and out.weight is not None:
        # sum(w * |1 - exp(-2 conf)|) / sum(w)
        # (reference :652-662 — pushes conf toward 0 where weights live)
        w = out.weight * out.pnt_mask.astype(out.weight.dtype)
        num = gsum(w * jnp.abs(1.0 - jnp.exp(-2.0 * out.conf_coefficient)))
        loss = num / (gsum(w) + 1e-6)
        total = total + loss * t.sparse_loss_weight
        parts["sparse_loss"] = loss

    parts["total"] = total
    return total, parts


def compute_loss(
    out: RenderOutput,
    gt_rgb: jnp.ndarray,          # [R, 3]
    zero_epsilon: float = 1e-3,
    zero_one_weight: float = 1e-4,
    psum_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss (+parts). Inside `shard_map`, pass `psum_axis` so the
    masked means normalize by GLOBAL mask counts (sums psum'd over the
    ray axis before division — autodiff-safe, psum is linear)."""
    t = TrainConfig(zero_epsilon=zero_epsilon,
                    zero_one_loss_weight=zero_one_weight)
    return compute_losses(out, gt_rgb, t, psum_axis=psum_axis)


def masked_psnr(out: RenderOutput, gt_rgb: jnp.ndarray) -> jnp.ndarray:
    """PSNR over rays that hit the scene (reference's auto-PSNR for
    `*raycolor` visuals, utils/visualizer.py:142-152)."""
    m = out.ray_mask.astype(jnp.float32)[:, None]
    mse = jnp.sum(jnp.square(out.coarse_raycolor - gt_rgb) * m) / jnp.maximum(
        jnp.sum(m) * 3.0, 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
