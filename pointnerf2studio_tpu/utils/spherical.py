"""Real spherical-harmonics basis evaluation.

TPU-native counterpart of the reference's `SphericalHarm` /
`SphericalHarm_table` (reference: pointnerf/utils/spherical.py:9-236),
used by the `sh_intrp` aggregation weight kernel
(pointnerf/models/aggregators/point_aggregators.py:458-469). The
reference precomputes sympy/scipy closures or hardcodes a table; here
the standard real SH polynomials (graphics convention, no
Condon-Shortley phase) are written out directly up to degree 5
(l = 0..4, 25 basis functions) — analytic, jit-friendly, branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_TOTAL_DEG = 5  # l in [0, 4] -> up to 25 basis values


def sh_basis(dirs: jnp.ndarray, total_deg: int) -> jnp.ndarray:
    """Evaluate the first `total_deg**2` real SH basis functions.

    Args:
      dirs: [..., 3] unit direction vectors (x, y, z).
      total_deg: number of bands (1..5); returns total_deg**2 values.

    Returns:
      [..., total_deg**2] basis values, band-major (l=0, l=1 m=-1..1, …).
    """
    if not 1 <= total_deg <= MAX_TOTAL_DEG:
        raise ValueError(f"total_deg must be in [1, {MAX_TOTAL_DEG}]")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, 0.28209479177387814, dirs.dtype)]
    if total_deg >= 2:
        c1 = 0.4886025119029199
        out += [c1 * y, c1 * z, c1 * x]
    if total_deg >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            1.0925484305920792 * xy,
            1.0925484305920792 * yz,
            0.31539156525252005 * (2.0 * zz - xx - yy),
            1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if total_deg >= 4:
        out += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            0.4570457994644658 * y * (4.0 * zz - xx - yy),
            0.3731763325901154 * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            0.4570457994644658 * x * (4.0 * zz - xx - yy),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    if total_deg >= 5:
        out += [
            2.5033429417967046 * xy * (xx - yy),
            1.7701307697799304 * yz * (3.0 * xx - yy),
            0.9461746957575601 * xy * (7.0 * zz - 1.0),
            0.6690465435572892 * yz * (7.0 * zz - 3.0),
            0.10578554691520431 * (35.0 * zz * zz - 30.0 * zz + 3.0),
            0.6690465435572892 * xz * (7.0 * zz - 3.0),
            0.47308734787878004 * (xx - yy) * (7.0 * zz - 1.0),
            1.7701307697799304 * xz * (xx - 3.0 * yy),
            0.6258357354491761 * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)
