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


def positional_encoding(x: jnp.ndarray, num_freqs: int, ori: bool = False,
                        mode: str = "direct") -> jnp.ndarray:
    """Sinusoidal encoding of `x` (any leading shape, trailing channel dim).

    Args:
      x: [..., C] input.
      num_freqs: number of octaves F (frequencies 2**0 .. 2**(F-1)).
      ori: if True prepend the raw input and lay out [x, sin, cos];
        otherwise interleave sin/cos per (channel, freq) pair.
      mode: "direct" evaluates sin/cos at every octave (2*C*F
        transcendentals). "rec" evaluates only the base octave and
        derives the rest via the angle-doubling identities
        sin(2a) = 2*sin(a)*cos(a), cos(2a) = 1 - 2*sin(a)^2 — three
        f32 multiplies per extra octave instead of a polynomial sin
        expansion each. On TPU the VPU has no transcendental unit, so
        XLA expands each sin into a ~dozens-of-ops polynomial; the
        recurrence trades those for multiplies in the hot [M, K, *]
        encodings. Error grows ~2x per doubling from the f32 seed
        (~6e-8), so at F<=12 the result stays within ~1e-3 of direct
        even for multi-thousand-radian top octaves (where direct's own
        range reduction carries comparable error) — invisible under the
        bf16 compute dtype of the decode tower
        (tests/test_core_ops.py::test_pe_recurrence_matches).

    Returns:
      [..., C + 2*C*F] if ori else [..., 2*C*F].
    """
    if num_freqs == 0:
        return x if ori else jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    if mode == "rec":
        xf = x.astype(jnp.float32)
        s, c = jnp.sin(xf), jnp.cos(xf)
        sins, coss = [s], [c]
        for _ in range(num_freqs - 1):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        # [..., C, F] -> [..., C*F], channel-major (same layout as direct)
        flat = x.shape[:-1] + (x.shape[-1] * num_freqs,)
        sin_flat = jnp.stack(sins, axis=-1).astype(x.dtype).reshape(flat)
        cos_flat = jnp.stack(coss, axis=-1).astype(x.dtype).reshape(flat)
        if ori:
            return jnp.concatenate([x, sin_flat, cos_flat], axis=-1)
        inter = jnp.stack([sin_flat, cos_flat], axis=-1)
        return inter.reshape(*flat[:-1], flat[-1] * 2)
    freqs = (2.0 ** jnp.arange(num_freqs)).astype(x.dtype)  # [F]
    # [..., C, F] -> [..., C*F], channel-major.
    scaled = (x[..., None] * freqs).reshape(*x.shape[:-1], x.shape[-1] * num_freqs)
    if ori:
        return jnp.concatenate([x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    inter = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return inter.reshape(*scaled.shape[:-1], scaled.shape[-1] * 2)
