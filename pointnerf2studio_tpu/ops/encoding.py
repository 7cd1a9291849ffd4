"""NeRF-style sinusoidal positional encodings.

Semantics match the reference `PointNeRFEncoding`
(reference: pointnerf/nerfstudio/studio_utils.py:47-68): frequencies are
2**i for i in [0, F), applied per input channel with channel-major
interleaving (all frequencies of channel 0, then channel 1, ...).

Two layouts exist in the reference and both are reproduced exactly:
  * ori=False: stack([sin, cos], axis=-1) then flatten -> the sin/cos of
    each (channel, freq) pair are adjacent: [s00, c00, s01, c01, ...].
  * ori=True: concat([x, sin(all), cos(all)]) -> raw input first, then
    all sins, then all cosines.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int, ori: bool = False) -> jnp.ndarray:
    """Sinusoidal encoding of `x` (any leading shape, trailing channel dim).

    Args:
      x: [..., C] input.
      num_freqs: number of octaves F (frequencies 2**0 .. 2**(F-1)).
      ori: if True prepend the raw input and lay out [x, sin, cos];
        otherwise interleave sin/cos per (channel, freq) pair.

    Returns:
      [..., C + 2*C*F] if ori else [..., 2*C*F].
    """
    if num_freqs == 0:
        return x if ori else jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    freqs = (2.0 ** jnp.arange(num_freqs)).astype(x.dtype)  # [F]
    # [..., C, F] -> [..., C*F], channel-major.
    scaled = (x[..., None] * freqs).reshape(*x.shape[:-1], x.shape[-1] * num_freqs)
    if ori:
        return jnp.concatenate([x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    inter = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return inter.reshape(*scaled.shape[:-1], scaled.shape[-1] * 2)
