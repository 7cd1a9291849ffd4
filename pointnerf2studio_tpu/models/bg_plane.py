"""Plane background model (`--bgmodel plane`).

TPU-native rebuild of the reference's background-plane pipeline
(reference: pointnerf/run/train_ft.py:206-214,290-301 driving
`MvsPointsVolumetricModel.set_bg`,
pointnerf/models/mvs_points_volumetric_model.py:272-310, with the
geometry helpers `gen_bg_points`/`get_rayplane_cross`/
`homo_warp_nongrid`/`homo_warp_fg_mask`/`extract_from_2d_grid` in
pointnerf/models/mvs/mvs_utils.py:299-427):

For every training ray, intersect it with a user-specified background
plane; reproject the intersection into every training view; sample the
view's image color there (bilinear); reject samples that fall on
foreground (pixels covered by projected neural points) or that don't
match the plane color within a threshold; per-ray max over views gives
a static background color that replaces the constant `bg_color` when
compositing.

All stages are fixed-shape jitted XLA (masks instead of the
reference's `masked_select`/index assignment); the foreground pixel
mask is a scatter of projected point pixels instead of the
reference's per-point python-side ceil/long indexing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.models.mvsnet.layers import bilinear_grid_sample


def ray_plane_intersection(
    campos: jnp.ndarray,        # [3]
    raydirs: jnp.ndarray,       # [R, 3]
    plane_pnt: jnp.ndarray,     # [3]
    plane_normal: jnp.ndarray,  # [3]
    epsilon: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World intersection of each ray with the plane; rays (near-)
    parallel to the plane return zeros + False
    (reference: mvs_utils.get_rayplane_cross:387-408)."""
    dot = jnp.sum(plane_normal * raydirs, axis=-1)            # [R]
    valid = dot >= epsilon
    w = campos - plane_pnt
    fac = -jnp.sum(plane_normal * w, axis=-1) / jnp.where(valid, dot, 1.0)
    pts = campos + raydirs * fac[..., None]
    return jnp.where(valid[..., None], pts, 0.0), valid


def project_points(
    xyz_w: jnp.ndarray,       # [N, 3] world points
    w2c: jnp.ndarray,         # [4, 4] world->cam
    intrinsic: jnp.ndarray,   # [3, 3]
    hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coords (x, y) + in-bounds mask
    (reference: mvs_utils.homo_warp_nongrid:299-316)."""
    H, W = hw
    ones = jnp.ones_like(xyz_w[..., :1])
    cam = jnp.concatenate([xyz_w, ones], -1) @ w2c.T          # [N, 4]
    z = jnp.where(jnp.abs(cam[..., 2:3]) < 1e-8, 1e-8, cam[..., 2:3])
    uv = (cam[..., :3] / z) @ intrinsic.T
    xy = uv[..., :2]
    inb = ((xy[..., 0] >= 0) & (xy[..., 0] <= W - 1)
           & (xy[..., 1] >= 0) & (xy[..., 1] <= H - 1)
           & (cam[..., 2] > 0))
    return xy, inb


def fg_pixel_mask(
    points_xyz: jnp.ndarray,  # [N, 3] neural point positions (world)
    w2c: jnp.ndarray,
    intrinsic: jnp.ndarray,
    hw: Tuple[int, int],
) -> jnp.ndarray:
    """[H, W] float mask of pixels covered by projected foreground
    points (reference: mvs_utils.homo_warp_fg_mask:318-345, which
    ceils projections and index-assigns 1s)."""
    H, W = hw
    xy, inb = project_points(points_xyz, w2c, intrinsic, hw)
    xi = jnp.clip(jnp.ceil(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.ceil(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    flat = yi * W + xi
    mask = jnp.zeros((H * W,), jnp.float32).at[flat].max(
        inb.astype(jnp.float32))
    return mask.reshape(H, W)


def plane_background_colors(
    campos: jnp.ndarray,            # [3] (of the target rays' camera)
    raydirs: jnp.ndarray,           # [R, 3]
    plane_pnt: jnp.ndarray,         # [3]
    plane_normal: jnp.ndarray,      # [3]
    plane_color: jnp.ndarray,       # [3]
    images: jnp.ndarray,            # [V, H, W, 3] training views
    w2cs: jnp.ndarray,              # [V, 4, 4]
    intrinsics: jnp.ndarray,        # [V, 3, 3]
    points_xyz: Optional[jnp.ndarray] = None,   # [N, 3] fg points
    fg_masks: Optional[jnp.ndarray] = None,     # [V, H, W] precomputed
    thresh: float = 0.03,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray background colors from the plane model.

    Returns (bg_color [R, 3], valid [R]); invalid rays keep zeros (the
    reference leaves them 0 as well and blends with the constant bg).
    Mirrors `set_bg` (mvs_points_volumetric_model.py:274-310): sample
    every view at the plane intersection, zero out samples off the
    plane color or on foreground, max over views.
    """
    V, H, W, _ = images.shape
    sect, sect_ok = ray_plane_intersection(
        campos, raydirs, plane_pnt, plane_normal)

    def per_view(img, w2c, K, fg):
        xy, inb = project_points(sect, w2c, K, (H, W))
        grid = jnp.stack([xy[..., 0] / ((W - 1.0) / 2.0) - 1.0,
                          xy[..., 1] / ((H - 1.0) / 2.0) - 1.0], -1)
        col = bilinear_grid_sample(img, grid, align_corners=True)  # [R, 3]
        # reject rays whose intersection lands on a foreground pixel
        xi = jnp.clip(jnp.ceil(xy[..., 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.ceil(xy[..., 1]).astype(jnp.int32), 0, H - 1)
        on_fg = fg[yi, xi] >= 1.0
        ok = inb & ~on_fg & sect_ok
        fits = jnp.all((col >= plane_color - thresh)
                       & (col <= plane_color + thresh), axis=-1)
        return col * (ok & fits)[..., None].astype(col.dtype)

    if fg_masks is None:
        if points_xyz is None:
            fg_masks = jnp.zeros((V, H, W), jnp.float32)
        else:
            fg_masks = jax.vmap(
                lambda w2c, K: fg_pixel_mask(points_xyz, w2c, K, (H, W)))(
                    w2cs, intrinsics)

    cols = jax.vmap(per_view)(images, w2cs, intrinsics, fg_masks)  # [V, R, 3]
    bg = jnp.max(cols, axis=0)                                     # [R, 3]
    valid = jnp.any(jnp.sum(cols, axis=-1) > 0, axis=0) & sect_ok
    return bg, valid


def create_all_bg(cfg, dataset, points_xyz=None, chunk: int = 16384,
                  views=None, src_dataset=None):
    """Precompute per-view background color maps [V, H, W, 3].

    The reference precomputes bg rays for every train/test image once
    before the loop (train_ft.py:604-612 create_all_bg) and indexes
    them per batch by pixel id; this is the same artifact, computed
    through `plane_background_colors`. Rays come from `dataset`
    (whatever split is being rendered); plane colors are sampled from
    `src_dataset` (default: `dataset` itself — pass the TRAIN split
    when computing bg for test/render poses, as the reference does
    with its img_lst). Invalid rays (no view agrees with the plane
    color, or the ray misses the plane) fall back to `cfg.bg_color`.
    """
    import numpy as np

    src = src_dataset if src_dataset is not None else dataset
    V = dataset.num_views
    VS = src.num_views
    H, W = dataset.hw
    views = list(range(V)) if views is None else views
    images = jnp.asarray(src.images)
    w2cs = jnp.asarray(np.linalg.inv(src.poses))
    intr = jnp.broadcast_to(jnp.asarray(src.intrinsics), (VS, 3, 3))
    plane_pnt = jnp.asarray(cfg.bg_plane_pnt, jnp.float32)
    plane_normal = jnp.asarray(cfg.bg_plane_normal, jnp.float32)
    plane_color = jnp.asarray(cfg.bg_plane_color, jnp.float32)
    const_bg = np.asarray(cfg.bg_color, np.float32)

    Hs, Ws = src.hw
    if points_xyz is not None:
        fg_masks = jax.vmap(
            lambda w2c, K: fg_pixel_mask(points_xyz, w2c, K, (Hs, Ws)))(
                w2cs, intr)
    else:
        fg_masks = jnp.zeros((VS, Hs, Ws), jnp.float32)

    @jax.jit
    def one_chunk(campos, raydirs):
        return plane_background_colors(
            campos, raydirs, plane_pnt, plane_normal, plane_color,
            images, w2cs, intr, fg_masks=fg_masks)

    maps = np.broadcast_to(const_bg, (V, H, W, 3)).copy()
    for v in views:
        rays = dataset.full_image_rays(v)
        total = rays.shape[0]
        padded = (total + chunk - 1) // chunk * chunk
        rays = np.pad(rays, ((0, padded - total), (0, 0)))
        campos = jnp.asarray(dataset.campos(v))
        bg_v, ok_v = [], []
        for i in range(0, padded, chunk):
            b, ok = one_chunk(campos, jnp.asarray(rays[i:i + chunk]))
            bg_v.append(np.asarray(b))
            ok_v.append(np.asarray(ok))
        bg_v = np.concatenate(bg_v)[:total].reshape(H, W, 3)
        ok_v = np.concatenate(ok_v)[:total].reshape(H, W)
        maps[v] = np.where(ok_v[..., None], bg_v, const_bg)
    return maps
