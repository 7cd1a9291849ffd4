"""Radiance decoder: the per-neighbor MLP tower + K-aggregation.

Functional re-design of the reference's decoder
(reference: pointnerf/nerfstudio/studio_model.py:169-237 [architecture]
and :263-365 [forward]; the same math lives in the legacy
pointnerf/models/aggregators/point_aggregators.py `viewmlp`).

Tower (defaults; all LeakyReLU(0.1), including output activations):
  mlp_base:  [emb(32), PE_3(emb)(192), PE_5(dists@Rw2c)(60)] -> 2x256
  mlp_head:  [base(256), point_color(3), point_dir-viewdir(3), dot(1)] -> 2x256
  density:   Linear(256 -> 1) + ReLU, per neighbor, then sum_K(weight * .)
  mlp_color: [sum_K(weight * head)(256), PE_4^ori(viewdir)[3:]](280) -> 3x128
  rgb:       Linear(128 -> 3) + sigmoid, squashed *1.002 - 0.001

TPU design: no boolean compaction of valid neighbors (the reference
gathers valid rows, studio_model.py:310-315); instead all R*SR*K padded
slots flow through the matmuls (MXU-friendly batched GEMMs, optionally
bfloat16) and invalid lanes are masked at the K-aggregation.

Params are a plain nested dict pytree — trivially importable from the
reference's torch checkpoints and shardable with jax.sharding.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from pointnerf2studio_tpu.config import AggregatorConfig
from pointnerf2studio_tpu.ops.encoding import positional_encoding

AggregatorParams = Dict[str, Any]


def _torch_linear_init(key: jax.Array, in_dim: int, out_dim: int) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(in), 1/sqrt(in)) for weight and bias), so training from
    scratch starts from the same distribution as the reference."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def _mlp_dims(cfg: AggregatorConfig) -> Dict[str, List[Tuple[int, int]]]:
    dist_dim = cfg.dist_dim
    dist_pe = 2 * cfg.num_dist_freqs * dist_dim if cfg.num_dist_freqs else dist_dim
    feat_dim = cfg.shading_feature_dim
    if cfg.agg_intrp_order == 0:
        # order 0 feeds [agg_emb, PE(agg_emb)] only — no dist features
        # (reference point_aggregators.py:531-536)
        dist_pe = 0
    base_in = 2 * cfg.num_feat_freqs * feat_dim + dist_pe + feat_dim
    head_in = (cfg.hidden_size + (3 if cfg.point_color_mode else 0)
               + (4 if cfg.point_dir_mode else 0))
    color_in = cfg.hidden_size + 2 * cfg.num_viewdir_freqs * 3

    def tower(in_dim, width, n):
        dims = [(in_dim, width)]
        dims += [(width, width)] * (n - 1)
        return dims

    dims = {
        "mlp_base": tower(base_in, cfg.hidden_size, cfg.num_mlp_base_layers),
        "mlp_head": tower(head_in, cfg.hidden_size, cfg.num_mlp_head_layers),
        "mlp_color": tower(color_in, cfg.hidden_size_color, cfg.num_color_layers),
        "density_head": [(cfg.hidden_size, 1)],
        "color_head": [(cfg.hidden_size_color, 3)],
    }
    if cfg.agg_distance_kernel == "feat_intrp":
        # learned-weight MLP (reference point_aggregators.py:226-237):
        # two halving layers + a scalar sigmoid head
        w_in = 2 * cfg.weight_xyz_freq * 3 + cfg.weight_feat_dim
        half = w_in // 2
        dims["feat_weight_mlp"] = [(w_in, half), (half, half), (half, 1)]
    return dims


def init_aggregator_params(key: jax.Array, cfg: AggregatorConfig) -> AggregatorParams:
    params: AggregatorParams = {}
    for name, dims in _mlp_dims(cfg).items():
        keys = jax.random.split(key := jax.random.fold_in(key, hash(name) % (2**31)),
                                len(dims))
        params[name] = [
            _torch_linear_init(k, i, o) for k, (i, o) in zip(keys, dims)]
    return params


def _leaky(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, 0.1)


def _mlp(layers: List[Dict[str, jnp.ndarray]], x: jnp.ndarray,
         dtype: jnp.dtype) -> jnp.ndarray:
    """Apply a LeakyReLU tower (activation after every layer incl. last,
    matching nerfstudio MLP with out_activation=LeakyReLU)."""
    for lyr in layers:
        x = x.astype(dtype) @ lyr["kernel"].astype(dtype) + lyr["bias"].astype(dtype)
        x = _leaky(x)
    return x


def _linear_head(lyr: Dict[str, jnp.ndarray], x: jnp.ndarray,
                 dtype: jnp.dtype) -> jnp.ndarray:
    return x.astype(dtype) @ lyr["kernel"].astype(dtype) + lyr["bias"].astype(dtype)


def _density_act(raw: jnp.ndarray, act_super: bool) -> jnp.ndarray:
    """raw2out_density (reference point_aggregators.py:261-266):
    mip-NeRF-stabilized softplus(x - 1) under act_super, else ReLU."""
    if act_super:
        return jax.nn.softplus(raw - 1.0)
    return jax.nn.relu(raw)


def inverse_distance_weight(
    dists: jnp.ndarray,       # [..., K, C>=3] (world delta in [..., :3])
    pnt_mask: jnp.ndarray,    # [..., K] bool
    axis_weight: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """`linear` kernel: masked 1/||world delta||, normalized over K.

    Reference: studio_model.py:467-475 (+ normalization at :286).
    """
    if axis_weight[0] == 1.0 and axis_weight[2] == 1.0:
        w = 1.0 / jnp.maximum(jnp.linalg.norm(dists[..., :3], axis=-1), 1e-6)
    else:
        w = 1.0 / jnp.maximum(
            jnp.sqrt(jnp.sum(jnp.square(dists[..., :2]), axis=-1)) * axis_weight[0]
            + jnp.abs(dists[..., 2]) * axis_weight[1], 1e-6)
    w = w * pnt_mask.astype(w.dtype)
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)


def raw_aggregation_weight(
    cfg: AggregatorConfig,
    neigh_emb: jnp.ndarray,   # [..., C] per-lane features
    dists: jnp.ndarray,       # [..., >=3] (world delta in [..., :3])
    pnt_mask: jnp.ndarray,    # [...] bool
    grid_vox_sz: float,       # scaled voxel edge (trilinear/gau footprint)
    params: Optional[AggregatorParams] = None,  # feat_intrp MLP weights
) -> Tuple[jnp.ndarray, jnp.ndarray, str]:
    """Per-lane (un-normalized) aggregation weight for all reference
    kernels. Every reference kernel is per-lane up to the final
    cross-K normalization (point_aggregators.py:353-483 compute,
    :818-819 normalize), so this half works on ANY lane layout — the
    [..., K] grid or a flat valid-pair packing. Returns (w, remaining
    embedding, norm_kind) where norm_kind tells the caller which
    cross-lane normalization the reference applies over each shading
    point's lanes: "norm" (divide by the weight sum, 1e-8 floor),
    "count" (divide by the valid-lane count, floor 1), or "none".
    """
    kind = cfg.agg_distance_kernel
    mask = pnt_mask.astype(dists.dtype)
    emb = neigh_emb
    aw = cfg.axis_weight

    if kind == "linear":
        if aw[0] == 1.0 and aw[2] == 1.0:
            w = mask / jnp.maximum(
                jnp.linalg.norm(dists[..., :3], axis=-1), 1e-6)
        else:
            w = mask / jnp.maximum(
                jnp.sqrt(jnp.sum(jnp.square(dists[..., :2]), -1)) * aw[0]
                + jnp.abs(dists[..., 2]) * aw[1], 1e-6)
    elif kind == "numlinear":
        w = mask / jnp.maximum(jnp.linalg.norm(dists, axis=-1), 1e-6)
    elif kind == "quadric":
        w = mask / jnp.maximum(
            jnp.sum(jnp.square(dists[..., :3])
                    * jnp.asarray(aw, dists.dtype), axis=-1), 1e-8)
    elif kind == "numquadric":
        w = mask / jnp.maximum(jnp.sum(jnp.square(dists), axis=-1), 1e-8)
    elif kind == "avg":
        w = mask
    elif kind == "trilinear":
        d = dists[..., :3] * mask[..., None] / grid_vox_sz
        d = 1.0 - jnp.abs(d)
        w = mask * d[..., 0] * d[..., 1] * d[..., 2]
    elif kind == "sh_intrp":
        from pointnerf2studio_tpu.utils.spherical import sh_basis
        n = cfg.sh_degree ** 2
        coefs, emb = emb[..., :n], emb[..., n:]
        dn = jnp.linalg.norm(dists[..., :3], axis=-1)
        ddir = dists[..., :3] / jnp.maximum(dn[..., None], 1e-8)
        shall = sh_basis(ddir, cfg.sh_degree)
        act = jax.nn.sigmoid if cfg.sh_act == "sigmoid" else jnp.tanh
        radial = (1.0 / jnp.maximum(dn, 1e-8) if cfg.sh_dist_func == "sh_linear"
                  else 1.0 / jnp.maximum(jnp.square(dn), 1e-8))
        w = mask * jnp.sum(act(shall * coefs), axis=-1) * radial
    elif kind == "gau_intrp":
        from pointnerf2studio_tpu.ops.camera import world2local_dist
        scale = jnp.abs(emb[..., 0])
        radii = grid_vox_sz * 20.0 * jax.nn.sigmoid(emb[..., 1:4])
        rot = jnp.clip(emb[..., 4:7], -jnp.pi / 4, jnp.pi / 4)
        emb = emb[..., 7:]
        local = world2local_dist(dists[..., :3], radii, rot)
        w = mask * scale * jnp.exp(-0.5 * jnp.sum(jnp.square(local), -1))
    elif kind == "feat_intrp":
        # learned weights: sigmoid(MLP([PE(world delta), feat prefix]))
        # (reference point_aggregators.py:226-237,277 — init-only there,
        # forward implied; LeakyReLU act per the canonical scene
        # configs' act_type, dev_scripts/w_n360/chair_points.sh:64)
        if params is None or "feat_weight_mlp" not in params:
            raise ValueError(
                "feat_intrp needs aggregator params (feat_weight_mlp)")
        wf, emb = (emb[..., :cfg.weight_feat_dim],
                   emb[..., cfg.weight_feat_dim:])
        pe = positional_encoding(dists[..., :3].astype(jnp.float32),
                                 cfg.weight_xyz_freq)
        x = jnp.concatenate([pe, wf.astype(jnp.float32)], axis=-1)
        layers = params["feat_weight_mlp"]
        for lyr in layers[:-1]:
            x = jax.nn.leaky_relu(
                x @ lyr["kernel"].astype(x.dtype)
                + lyr["bias"].astype(x.dtype), 0.01)
        x = (x @ layers[-1]["kernel"].astype(x.dtype)
             + layers[-1]["bias"].astype(x.dtype))
        w = mask * jax.nn.sigmoid(x[..., 0]).astype(dists.dtype)
    else:
        raise ValueError(f"unknown agg_distance_kernel: {kind}")

    if kind.startswith("num"):
        norm_kind = "count"
    elif kind == "trilinear" or cfg.agg_weight_norm:
        norm_kind = "norm"
    else:
        norm_kind = "none"
    return w, emb, norm_kind


def aggregation_weight(
    cfg: AggregatorConfig,
    neigh_emb: jnp.ndarray,   # [..., K, C]
    dists: jnp.ndarray,       # [..., K, >=3] (world delta in [..., :3])
    pnt_mask: jnp.ndarray,    # [..., K] bool
    grid_vox_sz: float,       # scaled voxel edge (trilinear/gau footprint)
    params: Optional[AggregatorParams] = None,  # feat_intrp MLP weights
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-neighbor aggregation weights for all reference kernels
    (reference: point_aggregators.py:353-483 + the normalization at
    :818-819). Returns (weights [..., K], remaining embedding) — the
    sh/gau/feat kernels consume a prefix of the embedding channels.
    """
    w, emb, norm_kind = raw_aggregation_weight(
        cfg, neigh_emb, dists, pnt_mask, grid_vox_sz, params)
    if norm_kind == "norm":
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    elif norm_kind == "count":
        w = w / jnp.maximum(
            jnp.sum(pnt_mask.astype(w.dtype), axis=-1, keepdims=True),
            1.0)
    return w, emb


def conf_gradient_clamp(conf: jnp.ndarray, lo: float = 1e-4, hi: float = 1.0) -> jnp.ndarray:
    """Straight-through clamp: forward = conf, backward zeroed outside
    [lo, hi] (reference: studio_model.py:289-292)."""
    diff = conf - jnp.clip(conf, lo, hi)
    return conf - jax.lax.stop_gradient(diff)


def weight_emb_consumed(cfg: AggregatorConfig) -> int:
    """Embedding channels the aggregation-weight kernel consumes as a
    prefix (sh/gau/feat kernels slice them off before the MLP tower;
    reference point_aggregators.py:420-483)."""
    kind = cfg.agg_distance_kernel
    if kind == "sh_intrp":
        return cfg.sh_degree ** 2
    if kind == "gau_intrp":
        return 7
    if kind == "feat_intrp":
        return cfg.weight_feat_dim
    return 0


def precompute_base_h(params: AggregatorParams, cfg: AggregatorConfig,
                      emb_table: jnp.ndarray) -> jnp.ndarray:
    """Per-point half of mlp_base layer 1, cached for the eval path.

    The tower input is [emb, PE(emb), PE(dists)] and layer 1 is linear,
    so the emb-dependent partial product
        h_pt[n] = [emb_n, PE(emb_n)] @ W1[:emb_rows]        (no bias)
    depends only on the point. Eval renders evaluate the tower on
    millions of padded (slot, K) pairs per frame while the scene has
    ~0.5M points — caching h_pt per point removes the PE(emb)
    transcendentals AND shrinks the layer-1 GEMM from 284 to 60 rows
    per pair. Numerics: the partial sum rounds to bf16 once (stored
    table), vs the reference's single 284-row f32 accumulation — a
    bf16-tolerance deviation, same class as the fat cache's bf16
    attributes.

    `emb_table` is the full per-point embedding [N, C]; the weight
    kernel's consumed prefix (weight_emb_consumed) is sliced off here
    exactly as decode_radiance's aggregation_weight would.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    off = weight_emb_consumed(cfg)
    emb_c = emb_table[..., off:].astype(dtype)
    x = jnp.concatenate(
        [emb_c, positional_encoding(emb_c, cfg.num_feat_freqs)], axis=-1)
    rows = x.shape[-1]
    w1 = params["mlp_base"][0]["kernel"][:rows].astype(dtype)
    return (x @ w1).astype(jnp.bfloat16)


def decode_radiance(
    params: AggregatorParams,
    cfg: AggregatorConfig,
    neigh_emb: jnp.ndarray,     # [M, K, C] neighbor features
    neigh_color: jnp.ndarray,   # [M, K, 3]
    neigh_dir: jnp.ndarray,     # [M, K, 3]
    dists: jnp.ndarray,         # [M, K, 6] world+perspective offsets
    weight: jnp.ndarray,        # [M, K] normalized aggregation weights
    pnt_mask: jnp.ndarray,      # [M, K] bool
    viewdirs: jnp.ndarray,      # [M, 3] per shading point (Rw2c-rotated
                                #   when Rw2c is global)
    Rw2c: jnp.ndarray,          # [3, 3] global — or [M, K, 3, 3]
                                #   per-neighbor (scene editing)
    base_h: Optional[jnp.ndarray] = None,  # [M, K, hidden] cached
                                # per-point layer-1 partial product
                                # (precompute_base_h), replaces
                                # neigh_emb/PE(neigh_emb) in the tower
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode (sigma [M], rgb [M, 3]) for M flat shading points.

    Callers flatten (ray, slot) pairs into the M axis — typically after
    validity compaction so padded slots don't reach the MXU.

    Per-point Rw2c (after scene editing, reference editing.py:190-203):
    dists, point dirs and the view direction used for the dir-difference
    features rotate per neighbor; the color branch's view-direction
    encoding stays per shading point (un-edited frame).

    With `base_h` (eval fast path), layer 1 of mlp_base becomes
    leaky(base_h + PE(dists) @ W1[dist_rows] + b1) — same math as the
    full concat up to the cached partial sum's bf16 rounding. Requires
    agg_intrp_order >= 1 (order 0 encodes the K-AGGREGATED embedding,
    which is per-slot, not per-point).
    """
    M, K, _ = neigh_emb.shape
    dtype = jnp.dtype(cfg.compute_dtype)
    per_point = Rw2c.ndim == 4
    order = cfg.agg_intrp_order

    dir_enc = positional_encoding(viewdirs, cfg.num_viewdir_freqs, ori=True)
    ori_viewdirs, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]      # [M,3],[M,24]
    w = (weight * pnt_mask.astype(weight.dtype))[..., None].astype(dtype)

    if order == 0:
        # aggregate embeddings over K FIRST; no distance features
        # (reference point_aggregators.py:531-536)
        if cfg.point_color_mode or cfg.point_dir_mode:
            raise ValueError("agg_intrp_order=0 requires point color/dir "
                             "modes off (per-K inputs have no per-slot "
                             "aggregation in the reference either)")
        agg_emb = jnp.sum(neigh_emb.astype(dtype) * w, axis=-2)     # [M, C]
        feat = jnp.concatenate(
            [agg_emb,
             positional_encoding(agg_emb, cfg.num_feat_freqs,
                                 mode=cfg.pe_mode)], axis=-1)
        feat = _mlp(params["mlp_base"], feat, dtype)                # [M, 256]
        feat = _mlp(params["mlp_head"], feat, dtype)
        alpha = _density_act(
            _linear_head(params["density_head"][0], feat, dtype),
            cfg.act_super)
        sigma = alpha[..., 0]
        agg_feat = feat
    else:
        # world part of dists rotated into the (editing) frame
        dists_w = jnp.sum(dists[..., :3, None] * Rw2c, axis=-2)
        dists_rot = jnp.concatenate([dists_w, dists[..., 3:]], axis=-1)

        # encodings computed directly in the compute dtype: the PE
        # intermediates are the largest activations of the whole step
        # ([M, K, 192]), and bf16 sin/cos is plenty for encodings
        dists_pe = positional_encoding(
            dists_rot.astype(dtype), cfg.num_dist_freqs, mode=cfg.pe_mode)
        if base_h is not None:
            lyr0 = params["mlp_base"][0]
            drows = dists_pe.shape[-1]
            w1d = lyr0["kernel"][-drows:].astype(dtype)
            feat = _leaky(base_h.astype(dtype) + dists_pe @ w1d
                          + lyr0["bias"].astype(dtype))
            feat = _mlp(params["mlp_base"][1:], feat, dtype)        # [M,K,256]
        else:
            emb_c = neigh_emb.astype(dtype)
            feat = jnp.concatenate(
                [emb_c,
                 positional_encoding(emb_c, cfg.num_feat_freqs,
                                     mode=cfg.pe_mode),
                 dists_pe], axis=-1)
            feat = _mlp(params["mlp_base"], feat, dtype)            # [M,K,256]

        extras = [feat]
        if cfg.point_color_mode:
            extras.append(neigh_color.astype(dtype))
        if cfg.point_dir_mode:
            ndir = jnp.sum(neigh_dir[..., :, None] * Rw2c, axis=-2)
            if per_point:
                ov = jnp.sum(ori_viewdirs[:, None, :, None] * Rw2c, axis=-2)
            else:
                ov = ori_viewdirs[:, None, :]                       # [M,1,3]
            extras.append((ndir - ov).astype(dtype))
            extras.append(
                jnp.sum(ndir * ov, axis=-1, keepdims=True).astype(dtype))
        feat = _mlp(params["mlp_head"], jnp.concatenate(extras, -1), dtype)

        if order == 1:
            # aggregate features, then one density eval per slot
            # (reference point_aggregators.py:592-604)
            agg_feat = jnp.sum(feat * w, axis=-2)                   # [M, 256]
            alpha = _density_act(
                _linear_head(params["density_head"][0], agg_feat, dtype),
                cfg.act_super)
            sigma = alpha[..., 0]
        else:
            # order 2: per-K density, weighted-summed
            alpha = _density_act(
                _linear_head(params["density_head"][0], feat, dtype),
                cfg.act_super)
            sigma = jnp.sum(alpha * w, axis=-2)[..., 0]             # [M]
            agg_feat = jnp.sum(feat * w, axis=-2)                   # [M, 256]

    color_in = jnp.concatenate([agg_feat, dir_pe.astype(dtype)], axis=-1)
    cfeat = _mlp(params["mlp_color"], color_in, dtype)
    rgb = jax.nn.sigmoid(_linear_head(params["color_head"][0], cfeat, dtype))
    rgb = rgb * (1 + 2e-3) - 1e-3                                   # mip-NeRF squash
    return sigma.astype(jnp.float32), rgb.astype(jnp.float32)


def pair_decode_eligible(cfg: AggregatorConfig, per_point_rw2c: bool) -> bool:
    """Whether decode_radiance_pairs covers this aggregator config
    (the pair path mirrors decode_radiance for order >= 1 with a
    global Rw2c; fused_decode2 has its own K-blocked layout)."""
    return (cfg.agg_intrp_order >= 1 and not per_point_rw2c
            and not cfg.fused_decode2)


def decode_radiance_pairs(
    params: AggregatorParams,
    cfg: AggregatorConfig,
    pair_emb: jnp.ndarray,      # [MP, C] neighbor features (valid pairs)
    pair_color: jnp.ndarray,    # [MP, 3]
    pair_dir: jnp.ndarray,      # [MP, 3]
    pair_dists: jnp.ndarray,    # [MP, 6] world+perspective offsets
    weight: jnp.ndarray,        # [MP] normalized aggregation weights
    pair_valid: jnp.ndarray,    # [MP] bool
    seg: jnp.ndarray,           # [MP] int32 owning slot id (sorted asc)
    n_slots: int,               # static number of shading slots (Mc)
    viewdirs: jnp.ndarray,      # [Mc, 3] per shading point
    Rw2c: jnp.ndarray,          # [3, 3] global rotation
    base_h: Optional[jnp.ndarray] = None,  # [MP, hidden] cached layer-1
                                # per-point partial product
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """decode_radiance on a VALID-PAIR packing of the (slot, K) grid.

    The reference compacts valid (ray, sample, K) tuples with
    masked_select before its MLP tower (studio_model.py:310-315); the
    padded [M, K] layout of decode_radiance instead burns
    K / mean(valid K) of the per-neighbor GEMM rows on padding lanes
    (~60-70%% at chair statistics). This variant consumes a dense
    packing of only the valid pairs (seg = owning slot, produced by
    the caller's prefix-pack) and aggregates per slot with
    segment-sums — the TPU equivalent of the reference's compaction,
    with fixed shapes. Math identical to decode_radiance order >= 1 up
    to the segment-sum reduction order (f32 last-bit class).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    order = cfg.agg_intrp_order
    if order < 1:
        raise ValueError("pair decode requires agg_intrp_order >= 1")

    dir_enc = positional_encoding(viewdirs, cfg.num_viewdir_freqs,
                                  ori=True)
    ori_viewdirs, dir_pe = dir_enc[..., :3], dir_enc[..., 3:]
    w = (weight * pair_valid.astype(weight.dtype))[..., None].astype(dtype)

    dists_w = jnp.sum(pair_dists[..., :3, None] * Rw2c, axis=-2)
    dists_rot = jnp.concatenate([dists_w, pair_dists[..., 3:]], axis=-1)
    dists_pe = positional_encoding(
        dists_rot.astype(dtype), cfg.num_dist_freqs, mode=cfg.pe_mode)
    if base_h is not None:
        lyr0 = params["mlp_base"][0]
        drows = dists_pe.shape[-1]
        w1d = lyr0["kernel"][-drows:].astype(dtype)
        feat = _leaky(base_h.astype(dtype) + dists_pe @ w1d
                      + lyr0["bias"].astype(dtype))
        feat = _mlp(params["mlp_base"][1:], feat, dtype)
    else:
        emb_c = pair_emb.astype(dtype)
        feat = jnp.concatenate(
            [emb_c,
             positional_encoding(emb_c, cfg.num_feat_freqs,
                                 mode=cfg.pe_mode),
             dists_pe], axis=-1)
        feat = _mlp(params["mlp_base"], feat, dtype)                # [MP, 256]

    extras = [feat]
    if cfg.point_color_mode:
        extras.append(pair_color.astype(dtype))
    if cfg.point_dir_mode:
        ndir = jnp.sum(pair_dir[..., :, None] * Rw2c, axis=-2)
        ov = ori_viewdirs[seg]                                      # [MP, 3]
        extras.append((ndir - ov).astype(dtype))
        extras.append(
            jnp.sum(ndir * ov, axis=-1, keepdims=True).astype(dtype))
    feat = _mlp(params["mlp_head"], jnp.concatenate(extras, -1), dtype)

    def seg_sum(x):
        return jax.ops.segment_sum(x, seg, num_segments=n_slots,
                                   indices_are_sorted=True)

    if order == 1:
        agg_feat = seg_sum((feat * w).astype(jnp.float32))          # [Mc, 256]
        alpha = _density_act(
            _linear_head(params["density_head"][0],
                         agg_feat.astype(dtype), dtype), cfg.act_super)
        sigma = alpha[..., 0]
    else:
        alpha = _density_act(
            _linear_head(params["density_head"][0], feat, dtype),
            cfg.act_super)
        sigma = seg_sum((alpha * w).astype(jnp.float32))[..., 0]    # [Mc]
        agg_feat = seg_sum((feat * w).astype(jnp.float32))

    color_in = jnp.concatenate(
        [agg_feat.astype(dtype), dir_pe.astype(dtype)], axis=-1)
    cfeat = _mlp(params["mlp_color"], color_in, dtype)
    rgb = jax.nn.sigmoid(_linear_head(params["color_head"][0], cfeat, dtype))
    rgb = rgb * (1 + 2e-3) - 1e-3
    return sigma.astype(jnp.float32), rgb.astype(jnp.float32)
