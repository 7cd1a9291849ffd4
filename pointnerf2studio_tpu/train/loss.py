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

from pointnerf2studio_tpu.models.render import RenderOutput


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
    def gsum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, psum_axis) if psum_axis else s

    m = out.ray_mask.astype(jnp.float32)[:, None]               # [R, 1]
    se = jnp.square(out.coarse_raycolor - gt_rgb) * m
    n = jnp.maximum(gsum(m) * 3.0, 1.0)
    color_loss = gsum(se) / n + 1e-6

    v = jnp.clip(out.conf_coefficient, zero_epsilon, 1.0 - zero_epsilon)
    pm = out.pnt_mask.astype(jnp.float32)
    zo = gsum((jnp.log(v) + jnp.log(1.0 - v)) * pm) / jnp.maximum(
        gsum(pm), 1.0)
    conf_loss = zo * zero_one_weight

    total = color_loss + conf_loss
    return total, {
        "ray_masked_coarse_raycolor_loss": color_loss,
        "conf_coefficient_loss": conf_loss,
        "total": total,
    }


def masked_psnr(out: RenderOutput, gt_rgb: jnp.ndarray) -> jnp.ndarray:
    """PSNR over rays that hit the scene (reference's auto-PSNR for
    `*raycolor` visuals, utils/visualizer.py:142-152)."""
    m = out.ray_mask.astype(jnp.float32)[:, None]
    mse = jnp.sum(jnp.square(out.coarse_raycolor - gt_rgb) * m) / jnp.maximum(
        jnp.sum(m) * 3.0, 1.0)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
