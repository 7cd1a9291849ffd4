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


def alpha_blend(opacity: jnp.ndarray, acc_transmission: jnp.ndarray) -> jnp.ndarray:
    """Standard emission-absorption blend weights
    (reference: diff_render_func.py:36-37)."""
    return opacity * acc_transmission


def alpha2_blend(opacity: jnp.ndarray, acc_transmission: jnp.ndarray) -> jnp.ndarray:
    """Collocated-light blend: transmission applied twice for the round
    trip camera->point->camera (reference: diff_render_func.py:40-45)."""
    return opacity * acc_transmission * acc_transmission


def radiance_render(ray_feature: jnp.ndarray) -> jnp.ndarray:
    """Color channels of the decoded per-slot feature (channels 1:4;
    reference: diff_render_func.py:49-50)."""
    return ray_feature[..., 1:4]


def white_color(ray_feature: jnp.ndarray) -> jnp.ndarray:
    """All-white albedo (silhouette renders;
    reference: diff_render_func.py:53-55)."""
    return jnp.ones_like(ray_feature[..., 1:4])


def simple_tone_map(color: jnp.ndarray, gamma: float = 2.2,
                    exposure: float = 1.0) -> jnp.ndarray:
    """Gamma tone map (reference: diff_render_func.py:58-59)."""
    return jnp.clip(jnp.power(color * exposure + 1e-5, 1.0 / gamma), 0.0, 1.0)


def normalize_tone_map(color: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize color to the unit sphere, remapped to [0, 1]
    (reference: diff_render_func.py:65-67)."""
    n = color / jnp.maximum(jnp.linalg.norm(color, axis=-1, keepdims=True),
                            1e-12)
    return n * 0.5 + 0.5


def no_tone_map(color: jnp.ndarray, **_) -> jnp.ndarray:
    return color


def segmented_scan(op, seg_start: jnp.ndarray, vals: jnp.ndarray):
    """Inclusive segmented scan of `vals` along axis 0 with the
    associative `op`, restarting wherever `seg_start` is True.

    Standard (flag, value) segmented-scan operator: associative for
    any associative op, so it runs as one lax.associative_scan (log2 M
    VPU passes) instead of a per-segment loop. Used by the packed
    compositing path where each ray's shading slots occupy a
    contiguous run of the [M] compacted axis.
    """
    if vals.ndim > 1:
        seg_start = seg_start.reshape(
            seg_start.shape + (1,) * (vals.ndim - 1))
    f = jnp.broadcast_to(seg_start, vals.shape)

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, op(va, vb))

    _, out = jax.lax.associative_scan(comb, (f, vals))
    return out


def segment_sums_contiguous(vals: jnp.ndarray, seg_start: jnp.ndarray,
                            off_end: jnp.ndarray,
                            cnt: jnp.ndarray) -> jnp.ndarray:
    """Per-segment sums of vals [M, L] for contiguous segments ending
    at off_end[r] (exclusive), with `seg_start` marking segment heads —
    one segmented add-scan + ONE [R]-row gather, no scatter.

    A global cumsum + hi-lo differencing is cheaper on paper but
    catastrophically cancels: the running sum grows to O(sum over all
    rays) and the per-ray difference inherits its absolute f32 error
    (measured 5e-5 at 1k rays, ~1e-3 at bench scale). The segmented
    scan restarts at every ray, so error stays at within-segment
    magnitude."""
    s = segmented_scan(jnp.add, seg_start, vals)
    out = s[jnp.maximum(off_end - 1, 0)]
    return jnp.where((cnt > 0)[:, None], out, jnp.zeros_like(out))


def packed_alpha_composite(
    sig: jnp.ndarray,          # [M] density, already zeroed on !slot_ok
    rgb: jnp.ndarray,          # [M, 3]
    z_m: jnp.ndarray,          # [M] camera-space z of shading locations
    slot_ok: jnp.ndarray,      # [M] bool slot validity
    sel_ray: jnp.ndarray,      # [M] owning ray (segments contiguous,
                               #     depth-ordered within a segment)
    pack_end: jnp.ndarray,     # [R] exclusive segment end offsets
    pack_cnt: jnp.ndarray,     # [R] per-ray slot counts
    vsize_z: float,
    blend_func: str,
):
    """Alpha-composite directly on the [M] compacted axis.

    The packed slots of each ray are CONTIGUOUS and depth-ordered, so
    the grid scatter-back ([M]-row scatters to an [R, BP] slot grid) is
    unnecessary: cummax-z / transmittance-cumprod become segmented
    scans that restart at ray boundaries, and the per-ray blend sums
    come from a segmented add-scan + one [R]-row gather. Reproduces
    ray_dist_from_sample_z + the exclusive-cumprod blend exactly up to
    the f32 reduction tree (invalid in-segment slots behave like the
    grid's z=-1e9 holes; tail slots beyond pack_end sum to nothing).

    Returns (rgb_sum [R, 3], acc [R], depth [R], ray_found [R]).
    """
    zm = jnp.where(slot_ok, z_m, -1e9)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sel_ray[1:] != sel_ray[:-1]])
    zcm = segmented_scan(jnp.maximum, seg_start, zm)
    same_next = jnp.concatenate(
        [sel_ray[1:] == sel_ray[:-1], jnp.zeros((1,), bool)])
    znext = jnp.concatenate([zcm[1:], zcm[-1:]])
    dist = jnp.where(same_next, znext - zcm, vsize_z)
    dist = jnp.where((dist < 1e-8) | (dist > 2.0 * vsize_z),
                     vsize_z, dist)
    dist = dist * slot_ok.astype(dist.dtype)
    opacity = 1.0 - jnp.exp(-sig * dist)
    cp = segmented_scan(jnp.multiply, seg_start, 1.0 - opacity + 1e-10)
    cp_prev = jnp.concatenate([jnp.ones((1,), cp.dtype), cp[:-1]])
    trans = jnp.where(seg_start, 1.0, cp_prev)
    blend = BLEND_FUNCTIONS[blend_func](opacity, trans)
    lanes = jnp.concatenate([
        blend[:, None] * rgb, blend[:, None],
        (blend * z_m)[:, None],
        slot_ok[:, None].astype(jnp.float32)], -1)          # [M, 6]
    sums = segment_sums_contiguous(lanes, seg_start, pack_end, pack_cnt)
    return sums[:, :3], sums[:, 3], sums[:, 4], sums[:, 5] > 0


BLEND_FUNCTIONS = {"alpha": alpha_blend, "alpha2": alpha2_blend}
RENDER_FUNCTIONS = {"radiance": radiance_render, "white": white_color}
TONE_MAPS = {"gamma": simple_tone_map, "normalize": normalize_tone_map,
             "off": no_tone_map}
