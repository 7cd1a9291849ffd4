"""Stratified ray sample generation.

Reproduces the reference `near_far_linear_ray_generation`
(reference: pointnerf/models/rendering/diff_ray_marching.py:292-336):
uniform [near, far] segments, each jittered by a +-jitter/2 fraction of
its own length, sample positions at jittered segment midpoints.

TPU-native differences: a `jax.random` key replaces torch's global RNG,
everything is shape-static and jit-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def near_far_linear_ray_generation(
    campos: jnp.ndarray,   # [3] or [B, 3]
    raydir: jnp.ndarray,   # [R, 3] or [B, R, 3], normalized
    num_samples: int,
    near: jnp.ndarray | float,
    far: jnp.ndarray | float,
    jitter: float = 0.0,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generate per-ray world-space sample positions.

    Returns:
      raypos:  [..., R, D, 3] sample positions (D = num_samples)
      seg_len: [..., R, D] jittered segment lengths (scaled by |raydir|)
      mid_ts:  [..., R, D] distances along the ray of each sample
    """
    squeeze = raydir.ndim == 2
    if squeeze:
        raydir = raydir[None]
        campos = campos[None] if campos.ndim == 1 else campos
    B, R, _ = raydir.shape
    D = num_samples
    dtype = raydir.dtype

    tvals = jnp.linspace(0.0, 1.0, D + 1, dtype=dtype)
    tvals = near * (1.0 - tvals) + far * tvals                     # [D+1]
    base_seg = tvals[1:] - tvals[:-1]                              # [D]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (B, R, D), dtype=dtype)
        seg = base_seg * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(base_seg, (B, R, D))

    end_ts = near + jnp.cumsum(seg, axis=-1)                       # [B, R, D]
    end_ts = jnp.concatenate(
        [jnp.full((B, R, 1), near, dtype=dtype), end_ts], axis=-1
    )
    mid_ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])            # [B, R, D]
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * mid_ts[..., None]
    seg = seg * jnp.linalg.norm(raydir, axis=-1)[..., None]

    if squeeze:
        return raypos[0], seg[0], mid_ts[0]
    return raypos, seg, mid_ts
