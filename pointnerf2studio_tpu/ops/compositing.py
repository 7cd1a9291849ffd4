"""Volumetric alpha compositing over fixed-SR shading slots.

Reproduces the reference compositing math
(reference: pointnerf/nerfstudio/studio_model.py:368-390 and
pointnerf/models/rendering/diff_ray_marching.py:495-541):

  * per-slot step length = forward-diff of the running max of the
    camera-space z of shading locations (cummax collapses empty padded
    slots, whose z stays at the previous filled value -> dist 0 ->
    replaced by vsize_z and masked),
  * opacity = 1 - exp(-sigma * dist),
  * transmittance = exclusive cumprod(1 - opacity + 1e-10),
  * color = sum(blend_weight * rgb) + (1 - sum(blend_weight)) * background.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax


def ray_dist_from_sample_z(
    sample_z: jnp.ndarray,     # [..., SR] camera-space z of shading locations
    ray_valid: jnp.ndarray,    # [..., SR] bool validity of each slot
    vsize_z: float,
) -> jnp.ndarray:
    """Per-slot step lengths with the reference's cummax/clamp semantics."""
    zmax = jax.lax.cummax(sample_z, axis=sample_z.ndim - 1)
    dist = jnp.concatenate(
        [zmax[..., 1:] - zmax[..., :-1],
         jnp.full(zmax.shape[:-1] + (1,), vsize_z, zmax.dtype)],
        axis=-1,
    )
    degenerate = (dist < 1e-8) | (dist > 2.0 * vsize_z)
    dist = jnp.where(degenerate, vsize_z, dist)
    return dist * ray_valid.astype(dist.dtype)


def alpha_composite(
    sigma: jnp.ndarray,        # [..., SR] density per slot (already masked)
    rgb: jnp.ndarray,          # [..., SR, 3]
    dist: jnp.ndarray,         # [..., SR] step lengths
    background: jnp.ndarray,   # [3]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite to per-ray color; returns (color [..., 3], acc [...])."""
    opacity = 1.0 - jnp.exp(-sigma * dist)
    trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones(trans.shape[:-1] + (1,), trans.dtype), trans[..., :-1]], axis=-1
    )
    blend = opacity * trans                                  # [..., SR]
    color = jnp.sum(blend[..., None] * rgb, axis=-2)
    acc = jnp.sum(blend, axis=-1)
    color = color + (1.0 - acc)[..., None] * background
    return color, acc
