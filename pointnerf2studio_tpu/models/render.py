"""The jitted end-to-end render step.

One XLA program per batch of rays: stratified ray generation -> voxel
grid ray masking -> shading-slot compaction -> K-NN -> neighbor gather
-> MLP tower -> alpha compositing -> background fill. Functional
equivalent of the reference call stack `PointNerf.get_outputs` ->
`NeuralPoints.forward` -> CUDA query -> MLP -> RGBRenderer
(reference: pointnerf/nerfstudio/studio_model.py:263-399,
studio_utils.py:147-209).

Shape strategy (the core TPU design decision): the reference compacts
rays dynamically on device->host syncs; here shapes are fixed. The
expensive inner work (K-NN + the MLP tower) runs on a fixed-capacity
dense prefix of VALID shading points: (ray, sample) pairs are
cumsum-ranked by validity and only the first `R * compact_budget`
reach the MXU — the padded-slot FLOP waste the reference avoids with
boolean `masked_select` (studio_model.py:310-315), we avoid with
static-capacity compaction. Results scatter back to the [R, D] sample
grid for compositing (the per-ray SR cap is a mask, not a layout).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pointnerf2studio_tpu.config import PointNerfConfig
from pointnerf2studio_tpu.models.aggregator import (
    AggregatorParams, aggregation_weight, conf_gradient_clamp,
    decode_radiance)
from pointnerf2studio_tpu.models.neural_points import (
    NeuralPointCloud, gather_neighbors)
from pointnerf2studio_tpu.ops.camera import w2pers
from pointnerf2studio_tpu.ops.compositing import (
    BLEND_FUNCTIONS, TONE_MAPS, ray_dist_from_sample_z)
from pointnerf2studio_tpu.ops.grid import PointGrid
from pointnerf2studio_tpu.ops.query import (
    knn_for_locs, knn_from_cache, mask_raypos, mask_raypos_qslot)
from pointnerf2studio_tpu.ops.raygen import (
    near_far_disparity_linear_ray_generation, near_far_linear_ray_generation)


@struct.dataclass
class RenderOutput:
    coarse_raycolor: jnp.ndarray        # [R, 3] final color (bg-filled)
    ray_mask: jnp.ndarray               # [R] bool
    acc: jnp.ndarray                    # [R] accumulated opacity
    depth: jnp.ndarray                  # [R] expected termination depth
    conf_coefficient: jnp.ndarray       # [M, K] for the zero-one loss
    pnt_mask: jnp.ndarray               # [M, K] neighbor validity
    weight: Optional[jnp.ndarray] = None  # [M, K] aggregation weights
                                          # (sparse loss)
    # prob-mode outputs (point growing; zeros unless prob=True —
    # reference: neural_points_volumetric_model.py:331-362)
    # fast_train ray packing only: number of box-hitting rays dropped
    # because the batch had more than QueryConfig.ray_budget of them
    # (nonzero = raise the budget; gradients silently lose those rays).
    # None when ray packing is off.
    rb_overflow: Optional[jnp.ndarray] = None
    # fast_train march front-end only: rays whose span was not fully
    # tested within the staged fuel/buckets (nonzero = raise
    # march_steps/march_buckets; samples may be missing). None when
    # the march is off.
    mc_overflow: Optional[jnp.ndarray] = None
    ray_max_shading_opacity: Optional[jnp.ndarray] = None   # [R]
    ray_max_sample_loc_w: Optional[jnp.ndarray] = None      # [R, 3]
    shading_avg_color: Optional[jnp.ndarray] = None         # [R, 3]
    shading_avg_dir: Optional[jnp.ndarray] = None           # [R, 3]
    shading_avg_conf: Optional[jnp.ndarray] = None          # [R, 1]
    shading_avg_embedding: Optional[jnp.ndarray] = None     # [R, C]


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
    prob: bool = False,
    points_axis: Optional[str] = None,
    bg_ray_colors: Optional[jnp.ndarray] = None,   # [R, 3] plane bg
) -> RenderOutput:
    q = cfg.query
    R = raydirs.shape[0]
    SR = q.SR
    raygen = (near_far_disparity_linear_ray_generation if cfg.inverse
              else near_far_linear_ray_generation)
    raypos, _, _ = raygen(
        campos, raydirs, q.z_depth_dim, near=near, far=far,
        jitter=cfg.train.jitter if training else 0.0, key=key)

    # Stage 1: ray masking + the per-ray first-SR cap as a pure MASK on
    # the [R, D] sample grid. (An earlier design compacted each ray's
    # samples into [R, SR] slots first; the per-ray top_k/scatter cost
    # ~70 ms at bench scale and the [R, D] formulation is semantically
    # identical — slots beyond the SR-th valid sample are dropped, and
    # compositing over the D axis visits the same valid samples in the
    # same depth order.)
    D = q.z_depth_dim
    use_cache = grid.cache is not None
    if use_cache:
        qslot_rd = mask_raypos_qslot(grid, raypos)            # [R, D]
        rp_mask = qslot_rd >= 0
    else:
        rp_mask = mask_raypos(grid, raypos)
    ray_hit = jnp.any(rp_mask, axis=-1)                       # [R]
    rank_d = jnp.cumsum(rp_mask.astype(jnp.int32), axis=-1)   # 1-based
    keep = rp_mask & (rank_d <= SR)

    # Stage 2: global validity compaction across (ray, sample) pairs.
    # Two-stage: per-ray one-hot-matmul selection into SR slots (the
    # rank==b einsums are ~free on the MXU), then a level-2 scatter on
    # the much smaller [R, SR] domain. Replaces a flat cumsum+scatter
    # over [R*D] that cost ~30ms at eval scale (probe_fusion/decompose
    # measurements); selection is IDENTICAL (keep already caps rank at
    # SR, so per-ray slots lose nothing, and the level-2 order is the
    # same ray-major valid-first order).
    budget = q.compact_budget if q.compact_budget > 0 else SR
    M = min(R * budget, R * D)
    ohb = keep[:, :, None] & (rank_d[:, :, None]
                              == jnp.arange(1, SR + 1))       # [R, D, SR]
    ohb16 = ohb.astype(jnp.bfloat16)
    # d values reach z_depth_dim (can exceed bf16-exact 256): split
    # into lo/hi bf16-exact einsums
    d_ar = jnp.arange(D, dtype=jnp.int32)
    d_lo = jnp.einsum("rds,d->rs", ohb16,
                      (d_ar % 128).astype(jnp.bfloat16)).astype(jnp.int32)
    d_hi = jnp.einsum("rds,d->rs", ohb16,
                      (d_ar // 128).astype(jnp.bfloat16)).astype(jnp.int32)
    d_sel = d_hi * 128 + d_lo                                 # [R, SR]
    cnt = jnp.sum(keep.astype(jnp.int32), axis=-1)            # [R]
    off = jnp.cumsum(cnt) - cnt
    sloti = jax.lax.broadcasted_iota(jnp.int32, (R, SR), 1)
    dest = jnp.where(sloti < cnt[:, None], off[:, None] + sloti, M)
    rayi = jax.lax.broadcasted_iota(jnp.int32, (R, SR), 0)
    sel = jnp.zeros((M,), jnp.int32).at[dest].set(
        rayi * D + d_sel, mode="drop")                        # valid-first
    mask_c = jnp.arange(M, dtype=jnp.int32) < jnp.minimum(
        jnp.sum(cnt), M)
    locs = raypos.reshape(R * D, 3)[sel]                      # [M, 3]
    ray_id = sel // D                                         # [M]

    # Stage 3: K-NN + gathers on the compacted set only.
    num_shells = (q.kernel_size[0] + 1) // 2
    if use_cache:
        pidx = knn_from_cache(
            grid, qslot_rd.reshape(R * D)[sel], locs, mask_c,
            q.K, q.radius_limit ** 2, num_shells,
            layered=q.layered_search)                         # [M, K]
    else:
        pidx = knn_for_locs(
            grid, points.xyz, locs, mask_c, q.K, q.radius_limit ** 2,
            q.kernel_size, layered=q.layered_search)          # [M, K]
    pnt_mask = pidx >= 0
    neigh = gather_neighbors(points, pidx, points_axis=points_axis)

    loc_pers_c = w2pers(locs, camrotc2w, campos)              # [M, 3]
    neigh_pers = w2pers(neigh["xyz"], camrotc2w, campos)      # [M, K, 3]
    lp = loc_pers_c[..., None, :]
    pdist = jnp.stack(
        [neigh_pers[..., 0] * neigh_pers[..., 2] - lp[..., 0] * lp[..., 2],
         neigh_pers[..., 1] * neigh_pers[..., 2] - lp[..., 1] * lp[..., 2],
         neigh_pers[..., 2] - lp[..., 2]], axis=-1)
    dists = jnp.concatenate([neigh["xyz"] - locs[..., None, :], pdist], -1)

    grid_vox_sz = max(q.scaled_vsize)
    weight, emb = aggregation_weight(
        cfg.agg, neigh["embeding"], dists, pnt_mask, grid_vox_sz,
        params=params)
    conf = conf_gradient_clamp(neigh["conf"][..., 0]) if training else \
        neigh["conf"][..., 0]
    if cfg.agg.conf_in_weight:
        weight = weight * conf

    if points.Rw2c.ndim == 3:        # per-point Rw2c (edited scenes)
        rw2c = neigh["Rw2c"]         # [M, K, 3, 3]
        viewdirs = raydirs           # rotation happens per neighbor
        per_point_rw2c = True
    else:
        rw2c = points.Rw2c
        viewdirs = jnp.sum(raydirs[..., :, None] * points.Rw2c, axis=-2)
        per_point_rw2c = False
    vd_sel = viewdirs[ray_id]

    from pointnerf2studio_tpu.ops.fused_decode import (
        fused_decode, fused_decode_eligible)
    use_fused = (cfg.agg.fused_decode and not training
                 and fused_decode_eligible(cfg.agg, per_point_rw2c, q.K)
                 and jax.default_backend() == "tpu")

    DC = q.decode_chunk
    if use_fused:
        from pointnerf2studio_tpu.ops.encoding import positional_encoding
        dists_rot = jnp.concatenate(
            [dists[..., :3] @ rw2c, dists[..., 3:]], axis=-1)
        dir_enc = positional_encoding(
            vd_sel, cfg.agg.num_viewdir_freqs, ori=True)
        ov, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]
        ndir = neigh["dir"] @ rw2c
        dirdot = jnp.concatenate(
            [ndir - ov[:, None, :],
             jnp.sum(ndir * ov[:, None, :], -1, keepdims=True)], axis=-1)
        wk = weight * pnt_mask.astype(weight.dtype)

        def run_fused(args):
            return fused_decode(
                params, args[0], args[1], args[2], args[3], args[4],
                args[5], K=q.K,
                num_feat_freqs=cfg.agg.num_feat_freqs,
                num_dist_freqs=cfg.agg.num_dist_freqs)

        fargs = (emb, dists_rot, neigh["color"], dirdot, wk, dir_pe)
        if DC and M > DC:
            # same decode_chunk workaround as the XLA path: the v5e
            # backend regalloc fails on the >=512k-row XLA tail
            n = (M + DC - 1) // DC
            pad = n * DC - M

            def cpad(x):
                return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                               ).reshape((n, DC) + x.shape[1:])

            sigma_c, rgb_c = jax.lax.map(
                run_fused, tuple(cpad(x) for x in fargs))
            sigma_c = sigma_c.reshape(n * DC)[:M]
            rgb_c = rgb_c.reshape(n * DC, 3)[:M]
        else:
            sigma_c, rgb_c = run_fused(fargs)
    elif DC and M > DC:
        # chunk the MLP tower over shading points (see decode_chunk)
        n = (M + DC - 1) // DC
        pad = n * DC - M

        def cpad(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                           ).reshape((n, DC) + x.shape[1:])

        mapped = [emb, neigh["color"], neigh["dir"], dists, weight,
                  pnt_mask, vd_sel] + ([rw2c] if per_point_rw2c else [])

        def one(args):
            rw = args[7] if per_point_rw2c else rw2c
            return decode_radiance(
                params, cfg.agg, neigh_emb=args[0], neigh_color=args[1],
                neigh_dir=args[2], dists=args[3], weight=args[4],
                pnt_mask=args[5], viewdirs=args[6], Rw2c=rw)

        sigma_c, rgb_c = jax.lax.map(one, tuple(cpad(x) for x in mapped))
        sigma_c = sigma_c.reshape(n * DC)[:M]
        rgb_c = rgb_c.reshape(n * DC, 3)[:M]
    else:
        sigma_c, rgb_c = decode_radiance(
            params, cfg.agg,
            neigh_emb=emb, neigh_color=neigh["color"],
            neigh_dir=neigh["dir"], dists=dists, weight=weight,
            pnt_mask=pnt_mask, viewdirs=vd_sel, Rw2c=rw2c)

    # Stage 4: scatter compacted results back to [R, D] sample slots.
    slot_ok = mask_c & jnp.any(pnt_mask, axis=-1)             # [M]
    sigma_c = sigma_c * slot_ok.astype(sigma_c.dtype)
    sigma = jnp.zeros((R * D,), sigma_c.dtype).at[sel].set(sigma_c)
    rgb = jnp.zeros((R * D, 3), rgb_c.dtype).at[sel].set(rgb_c)
    slot_valid = jnp.zeros((R * D,), jnp.bool_).at[sel].set(slot_ok)
    sigma = sigma.reshape(R, D)
    rgb = rgb.reshape(R, D, 3)
    slot_valid = slot_valid.reshape(R, D)

    # Compositing (full [R, D], cheap elementwise). Invalid samples'
    # z is masked to -inf so the cummax step-length semantics match
    # the reference's compacted slots (gaps measured between
    # consecutive VALID samples, long gaps clamped to vsize_z).
    loc_pers_z = w2pers(raypos, camrotc2w, campos)[..., 2]
    z_masked = jnp.where(slot_valid, loc_pers_z, -1e9)
    dist = ray_dist_from_sample_z(z_masked, slot_valid, q.vsize[2])

    opacity = 1.0 - jnp.exp(-sigma * dist)
    trans = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones(trans.shape[:-1] + (1,), trans.dtype), trans[..., :-1]], -1)
    blend = BLEND_FUNCTIONS[cfg.blend_func](opacity, trans)  # [R, SR]
    # Per-ray background (bgmodel=plane): replaces the constant bg in
    # BOTH the (1-acc) blend and the miss-ray fill — equivalent to the
    # reference's is_background*bg_ray + scatter of the no-bg render
    # (neural_points_volumetric_model.py:103-105, ray_march bg_color
    # None when bg_ray present).
    bg = (bg_ray_colors if bg_ray_colors is not None
          else jnp.asarray(cfg.bg_color, jnp.float32))
    acc = jnp.sum(blend, axis=-1)
    color = jnp.sum(blend[..., None] * rgb, axis=-2) + (1 - acc)[..., None] * bg
    color = TONE_MAPS[cfg.tonemap_func](color)
    depth = jnp.sum(blend * loc_pers_z, axis=-1)

    # Rays whose shading points found no neighbors fall out of the mask
    # (second compaction in the reference, query_worldcoords.cu:425-429).
    ray_found = jnp.any(slot_valid, axis=-1)
    ray_mask = ray_hit & ray_found
    color = jnp.where(ray_mask[..., None], color, bg)

    prob_out = {}
    if prob:
        # per-ray max-opacity shading slot + conf-weighted neighbor
        # averages there (neural_points_volumetric_model.py:331-362)
        s_star = jnp.argmax(opacity, axis=-1)                 # [R]
        max_op = jnp.take_along_axis(opacity, s_star[:, None], -1)[:, 0]
        flat_star = jnp.arange(R, dtype=jnp.int32) * D + s_star.astype(jnp.int32)
        slot_to_m = jnp.full((R * D,), -1, jnp.int32).at[sel].set(
            jnp.arange(M, dtype=jnp.int32))
        m_idx = slot_to_m[flat_star]                          # [R]
        ok = (m_idx >= 0)[:, None, None]
        mi = jnp.clip(m_idx, 0)
        wc = (weight[mi] * conf[mi])[..., None] * ok          # [R, K, 1]
        loc_star = raypos.reshape(R * D, 3)[flat_star]
        prob_out = {
            "ray_max_shading_opacity": max_op,
            "ray_max_sample_loc_w": loc_star,
            "shading_avg_color": jnp.sum(neigh["color"][mi] * wc, -2),
            "shading_avg_dir": jnp.sum(neigh["dir"][mi] * wc, -2),
            "shading_avg_conf": jnp.sum(neigh["conf"][mi] * wc, -2),
            "shading_avg_embedding": jnp.sum(neigh["embeding"][mi] * wc, -2),
        }

    return RenderOutput(
        **prob_out,
        coarse_raycolor=color,
        ray_mask=ray_mask,
        acc=acc,
        depth=depth,
        conf_coefficient=conf,
        pnt_mask=pnt_mask & mask_c[..., None],
        weight=weight,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "training", "prob"))
def render_rays_jit(params, points, grid, campos, camrotc2w, raydirs,
                    near, far, cfg: PointNerfConfig, key=None,
                    training: bool = False, prob: bool = False,
                    bg_ray_colors=None) -> RenderOutput:
    return render_rays(params, points, grid, campos, camrotc2w, raydirs,
                       near, far, cfg, key=key, training=training, prob=prob,
                       bg_ray_colors=bg_ray_colors)
