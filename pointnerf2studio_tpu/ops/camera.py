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


def roll_pitch_yaw_to_rotation(rpy: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] roll/pitch/yaw (radians, applied x then y then z) ->
    [..., 3, 3] rotation matrices (standard ZYX Euler composition;
    reference: pointnerf/models/helpers/geometrics.py:45-70)."""
    cx, cy, cz = (jnp.cos(rpy[..., i]) for i in range(3))
    sx, sy, sz = (jnp.sin(rpy[..., i]) for i in range(3))
    rows = jnp.stack(
        [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
         sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
         -sy, cy * sx, cy * cx], axis=-1)
    return rows.reshape(rpy.shape[:-1] + (3, 3))


def world2local_dist(dists: jnp.ndarray, radii: jnp.ndarray,
                     rotations: jnp.ndarray) -> jnp.ndarray:
    """Rotate offsets into per-point local frames and scale each axis by
    1/radius — the anisotropic-gaussian footprint transform of the
    `gau_intrp` weight kernel (reference:
    pointnerf/models/helpers/geometrics.py:15-42).

    dists [..., 3], radii [..., 3], rotations [..., 3] -> [..., 3].
    """
    rot = roll_pitch_yaw_to_rotation(rotations)
    local = jnp.einsum("...ij,...j->...i", rot, dists)
    return local / (radii + 1e-8)
