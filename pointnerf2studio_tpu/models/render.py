"""The jitted end-to-end render step.

One XLA program per batch of rays: stratified ray generation -> voxel
grid query -> neighbor gather -> MLP tower -> alpha compositing ->
background fill. Functional equivalent of the reference call stack
`PointNerf.get_outputs` -> `NeuralPoints.forward` -> CUDA query -> MLP
-> RGBRenderer (reference: pointnerf/nerfstudio/studio_model.py:263-399,
studio_utils.py:147-209), with fixed shapes and masks instead of the
reference's two dynamic ray compactions.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.aggregator import (
    AggregatorParams, conf_gradient_clamp, decode_radiance,
    inverse_distance_weight)
from pointnerf2studio_tpu.models.neural_points import (
    NeuralPointCloud, gather_neighbors)
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.compositing import (
    alpha_composite, ray_dist_from_sample_z)
from pointnerf2studio_tpu.ops.grid import PointGrid
from pointnerf2studio_tpu.ops.query import query_grid_point_index
from pointnerf2studio_tpu.ops.raygen import near_far_linear_ray_generation


@struct.dataclass
class RenderOutput:
    coarse_raycolor: jnp.ndarray        # [R, 3] final color (bg-filled)
    ray_mask: jnp.ndarray               # [R] bool
    acc: jnp.ndarray                    # [R] accumulated opacity
    depth: jnp.ndarray                  # [R] expected termination depth
    conf_coefficient: jnp.ndarray       # [R, SR, K] for the zero-one loss
    pnt_mask: jnp.ndarray               # [R, SR, K] neighbor validity


def render_rays(
    params: AggregatorParams,
    points: NeuralPointCloud,
    grid: PointGrid,
    campos: jnp.ndarray,      # [3]
    camrotc2w: jnp.ndarray,   # [3, 3]
    raydirs: jnp.ndarray,     # [R, 3] normalized world directions
    near: jnp.ndarray | float,
    far: jnp.ndarray | float,
    cfg: PointNerfConfig,
    key: Optional[jax.Array] = None,
    training: bool = False,
) -> RenderOutput:
    q = cfg.query
    raypos, _, _ = near_far_linear_ray_generation(
        campos, raydirs, q.z_depth_dim, near=near, far=far,
        jitter=cfg.train.jitter if training else 0.0, key=key)

    qres = query_grid_point_index(
        grid, points.xyz, raypos,
        SR=q.SR, K=q.K, radius2=q.radius_limit ** 2,
        kernel_size=q.kernel_size, layered=q.layered_search)

    neigh = gather_neighbors(points, qres.sample_pidx)
    pnt_mask = qres.sample_pidx >= 0                          # [R, SR, K]

    # world + perspective 6-dim offsets (studio_model.py:273-278)
    loc_pers = w2pers(qres.sample_loc_w, camrotc2w, campos)   # [R, SR, 3]
    neigh_pers = w2pers(neigh["xyz"], camrotc2w, campos)      # [R, SR, K, 3]
    lp = loc_pers[..., None, :]
    pdist = jnp.stack(
        [neigh_pers[..., 0] * neigh_pers[..., 2] - lp[..., 0] * lp[..., 2],
         neigh_pers[..., 1] * neigh_pers[..., 2] - lp[..., 1] * lp[..., 2],
         neigh_pers[..., 2] - lp[..., 2]], axis=-1)
    dists = jnp.concatenate(
        [neigh["xyz"] - qres.sample_loc_w[..., None, :], pdist], axis=-1)

    weight = inverse_distance_weight(dists, pnt_mask, cfg.agg.axis_weight)
    conf = conf_gradient_clamp(neigh["conf"][..., 0]) if training else \
        neigh["conf"][..., 0]

    viewdirs = jnp.sum(raydirs[..., :, None] * points.Rw2c, axis=-2)
    sigma, rgb = decode_radiance(
        params, cfg.agg,
        neigh_emb=neigh["embeding"], neigh_color=neigh["color"],
        neigh_dir=neigh["dir"], dists=dists, weight=weight,
        pnt_mask=pnt_mask, viewdirs=viewdirs, Rw2c=points.Rw2c)

    slot_valid = jnp.any(pnt_mask, axis=-1)                   # [R, SR]
    sigma = sigma * slot_valid.astype(sigma.dtype)
    dist = ray_dist_from_sample_z(loc_pers[..., 2], slot_valid, q.vsize[2])

    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    color, acc = alpha_composite(sigma, rgb, dist, bg)

    opacity = 1.0 - jnp.exp(-sigma * dist)
    trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones(trans.shape[:-1] + (1,), trans.dtype), trans[..., :-1]], -1)
    blend = opacity * trans
    depth = jnp.sum(blend * loc_pers[..., 2], axis=-1)

    # fill_invalid (studio_model.py:491-504): misses get background.
    rm = qres.ray_mask[..., None]
    color = jnp.where(rm, color, bg)

    return RenderOutput(
        coarse_raycolor=color,
        ray_mask=qres.ray_mask,
        acc=acc,
        depth=depth,
        conf_coefficient=conf,
        pnt_mask=pnt_mask,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "training"))
def render_rays_jit(params, points, grid, campos, camrotc2w, raydirs,
                    near, far, cfg: PointNerfConfig, key=None,
                    training: bool = False) -> RenderOutput:
    return render_rays(params, points, grid, campos, camrotc2w, raydirs,
                       near, far, cfg, key=key, training=training)
