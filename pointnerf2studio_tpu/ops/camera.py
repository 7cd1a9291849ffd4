"""Camera-space ("perspective") coordinate transforms.

`w2pers` maps world points into (x/z, y/z, z) with the camera-to-world
rotation `camrotc2w` and camera position `campos`; matches the reference
`NeuralPoints.w2pers` / `w2pers_loc`
(reference: pointnerf/nerfstudio/studio_utils.py:129-144) which both
compute camera coordinates as R^T (p - campos) and divide x,y by z.
"""

from __future__ import annotations

import jax.numpy as jnp


def world_to_cam(point_xyz_w: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """World -> camera frame: R_c2w^T @ (p - campos). Any leading shape.

    Written as broadcast multiply-add (VPU) rather than a matmul: a 3x3
    contraction gains nothing from the MXU and the MXU's bf16 default
    precision is unacceptable for geometry.
    """
    shift = point_xyz_w - campos
    return jnp.sum(shift[..., :, None] * camrotc2w, axis=-2)


def w2pers(point_xyz_w: jnp.ndarray, camrotc2w: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """World -> perspective (x/z, y/z, z) coordinates. Any leading shape [..., 3]."""
    xyz_c = world_to_cam(point_xyz_w, camrotc2w, campos)
    z = xyz_c[..., 2]
    return jnp.stack([xyz_c[..., 0] / z, xyz_c[..., 1] / z, z], axis=-1)
