"""Fused Pallas TPU kernel for the radiance-decoder hot loop.

The decoder (models/aggregator.py `decode_radiance`, mirroring
reference pointnerf/nerfstudio/studio_model.py:300-365) is the FLOP
center of every render/train step: per (shading point, neighbor) pair
it builds a positional-encoded feature, runs mlp_base -> mlp_head ->
density head. Under plain XLA each layer's activations round-trip HBM
and the sin/cos encodings materialize as separate tensors; measured
~61 ms per 262k slots on v5e (tools/probe_knn_decode.py).

Kernel shape (Mosaic-friendly: no reshapes or minor-dim insertions on
16-bit types inside the kernel):
  * operates on FLAT pair rows [rows = M*K tiles of TILE_ROWS];
  * positional encodings are built as pure channel-block concats
    ([x, sin(x*f0), sin(x*f1), ..., cos(x*f0), ...]) — a PERMUTATION
    of the reference's interleaved layout, compensated by permuting
    the rows of the first-layer weight matrix once outside the kernel
    (`_w1_permutation`);
  * the four pair matmuls + density head run with bf16 activations and
    f32 accumulation, VMEM-resident weights;
  * outputs are the aggregation-weight-premultiplied density and
    feature rows; the cheap K-reduction and the per-slot color tower
    (75 MFLOP at bench scale) stay in XLA.

Forward-only: training uses the XLA decoder (identical math, autodiff);
rendering/eval uses this kernel when `fused_decode_eligible`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnerf2studio_tpu.config import AggregatorConfig

# Per-tile working set (bf16 activations + f32 PE intermediates,
# double-buffered) must fit the raised scoped-VMEM limit below.
TILE_ROWS = 4096
VMEM_LIMIT = 100 * 1024 * 1024


def fused_decode_eligible(cfg: AggregatorConfig, per_point_rw2c: bool,
                          K: int) -> bool:
    """The kernel implements the flagship configuration; anything else
    falls back to the XLA decoder."""
    return (not per_point_rw2c
            and cfg.agg_intrp_order == 2
            and cfg.agg_distance_kernel in ("linear", "quadric", "avg",
                                            "numlinear", "numquadric")
            and cfg.point_color_mode and cfg.point_dir_mode
            and cfg.num_mlp_base_layers == 2
            and cfg.num_mlp_head_layers == 2
            and cfg.shading_feature_dim == cfg.point_features_dim)


def _pe_blocks(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Block-layout PE: [sin(x*2^0), .., sin(x*2^{F-1}), cos(...)].
    Pure concats — no reshapes (Mosaic-safe). f32 internally."""
    xf = x.astype(jnp.float32)
    sins = [jnp.sin(xf * (2.0 ** j)) for j in range(num_freqs)]
    coss = [jnp.cos(xf * (2.0 ** j)) for j in range(num_freqs)]
    return jnp.concatenate(sins + coss, axis=-1).astype(x.dtype)


def _w1_permutation(c: int, feat_freqs: int, d: int, dist_freqs: int
                    ) -> np.ndarray:
    """Row permutation mapping the kernel's block PE layout onto the
    reference interleaved layout (ops/encoding.py): for channel i,
    freq j the interleaved index is base + (i*F + j)*2 + (0 sin|1 cos).
    Returns `perm` with W1_kernel = W1_ref[perm]."""
    perm = list(range(c))                                   # raw emb
    base = c
    for sc in (0, 1):                                       # sins, coss
        for j in range(feat_freqs):
            for i in range(c):
                perm.append(base + (i * feat_freqs + j) * 2 + sc)
    base = c + 2 * c * feat_freqs
    for sc in (0, 1):
        for j in range(dist_freqs):
            for i in range(d):
                perm.append(base + (i * dist_freqs + j) * 2 + sc)
    return np.asarray(perm, np.int64)


def _pair_kernel(
    emb_ref, dists_ref, color_ref, dirdot_ref, wk_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    wd_ref, bd_ref,
    aw_ref, hw_ref,
    *, num_feat_freqs: int, num_dist_freqs: int,
):
    bf = jnp.bfloat16
    emb = emb_ref[:].astype(bf)
    dists = dists_ref[:].astype(bf)

    feat = jnp.concatenate(
        [emb,
         _pe_blocks(emb, num_feat_freqs),
         _pe_blocks(dists, num_dist_freqs)], axis=-1)

    def layer(x, w_ref, b_ref):
        y = jnp.dot(x, w_ref[:].astype(bf),
                    preferred_element_type=jnp.float32) + b_ref[:]
        return jnp.where(y > 0, y, 0.1 * y).astype(bf)

    x = layer(feat, w1_ref, b1_ref)
    x = layer(x, w2_ref, b2_ref)
    h_in = jnp.concatenate(
        [x, color_ref[:].astype(bf), dirdot_ref[:].astype(bf)], axis=-1)
    h = layer(h_in, w3_ref, b3_ref)
    h = layer(h, w4_ref, b4_ref)                              # [T, 256]

    alpha = jnp.maximum(
        jnp.dot(h, wd_ref[:].astype(bf),
                preferred_element_type=jnp.float32) + bd_ref[:], 0.0)

    wk = wk_ref[:].astype(jnp.float32)                        # [T, 1]
    aw_ref[:] = alpha * wk
    hw_ref[:] = (h.astype(jnp.float32) * wk).astype(bf)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _row_spec(dim: int):
    return pl.BlockSpec((TILE_ROWS, dim), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit, static_argnames=("K", "num_feat_freqs", "num_dist_freqs",
                              "interpret"))
def fused_decode(
    params: Dict[str, Any],
    emb: jnp.ndarray,      # [M, K, C]
    dists: jnp.ndarray,    # [M, K, D] already Rw2c-rotated
    color: jnp.ndarray,    # [M, K, 3]
    dirdot: jnp.ndarray,   # [M, K, 4] = [ndir - ov, <ndir, ov>]
    wk: jnp.ndarray,       # [M, K] aggregation weight * mask
    dir_pe: jnp.ndarray,   # [M, P] per-point viewdir PE (sans raw dirs)
    K: int,
    num_feat_freqs: int,
    num_dist_freqs: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode -> (sigma [M], rgb [M, 3])."""
    M, _, C = emb.shape
    D = dists.shape[-1]
    rows = M * K
    T = TILE_ROWS
    n = (rows + T - 1) // T
    pad = n * T - rows

    def flat(x):
        x = x.reshape(rows, x.shape[-1])
        return jnp.pad(x, ((0, pad), (0, 0)))

    perm = _w1_permutation(C, num_feat_freqs, D, num_dist_freqs)
    w1 = params["mlp_base"][0]["kernel"][perm].astype(jnp.bfloat16)

    def wb(name, i):
        lyr = params[name][i]
        return (lyr["kernel"].astype(jnp.bfloat16),
                lyr["bias"][None, :].astype(jnp.float32))

    _, b1 = wb("mlp_base", 0)
    w2, b2 = wb("mlp_base", 1)
    w3, b3 = wb("mlp_head", 0)
    w4, b4 = wb("mlp_head", 1)
    wd, bd = wb("density_head", 0)
    plist = (w1, b1, w2, b2, w3, b3, w4, b4, wd, bd)

    kern = functools.partial(
        _pair_kernel, num_feat_freqs=num_feat_freqs,
        num_dist_freqs=num_dist_freqs)

    hidden = w4.shape[1]
    aw, hw = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[_row_spec(C), _row_spec(D), _row_spec(3), _row_spec(4),
                  _row_spec(1)] + [_full_spec() for _ in plist],
        out_specs=(_row_spec(1), _row_spec(hidden)),
        out_shape=(
            jax.ShapeDtypeStruct((n * T, 1), jnp.float32),
            jax.ShapeDtypeStruct((n * T, hidden), jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(flat(emb), flat(dists), flat(color), flat(dirdot),
      flat(wk[..., None]), *plist)

    # K-reduction + color tower in XLA (cheap per-slot work)
    sigma = jnp.sum(aw[:rows].reshape(M, K), axis=-1)
    agg_feat = jnp.sum(hw[:rows].reshape(M, K, hidden), axis=1)
    return _color_tower(params, sigma, agg_feat, dir_pe)


def _color_tower(params, sigma, agg_feat, dir_pe):
    from pointnerf2studio_tpu.models.aggregator import _linear_head, _mlp
    bf = jnp.bfloat16
    color_in = jnp.concatenate(
        [agg_feat.astype(bf), dir_pe.astype(bf)], axis=-1)
    cfeat = _mlp(params["mlp_color"], color_in, bf)
    rgb = jax.nn.sigmoid(
        _linear_head(params["color_head"][0], cfeat, bf).astype(jnp.float32))
    rgb = rgb * (1 + 2e-3) - 1e-3
    return sigma, rgb


# ---------------------------------------------------------------------
# fused_decode2: K-reduction INSIDE the kernel.
#
# The r1 kernel streamed per-(slot, K) feature rows OUT of the kernel
# ([rows, 256] bf16 = the dominant HBM traffic) and reduced over K in
# XLA. Here the grid is (m_tiles, K) with K innermost: the output block
# for an m-tile stays VMEM-resident across its K consecutive grid steps
# and accumulates sum_k wk * (alpha_k, h_k), so per-slot results are
# written ONCE — an 8x cut in output bytes at K=8. Matmuls are
# concat-free (the first layer is split into emb/PE(emb)/PE(dists) row
# blocks of the permuted W1), which avoids Mosaic relayouts.
# ---------------------------------------------------------------------

TILE_M2 = 2048


def _kacc_kernel(
    emb_ref, dists_ref, cd_ref, wk_ref,
    w1a_ref, w1b_ref, w1c_ref, b1_ref, w2_ref, b2_ref,
    w3a_ref, w3b_ref, b3_ref, w4_ref, b4_ref, wd_ref, bd_ref,
    aw_ref, hw_ref,
    *, num_feat_freqs: int, num_dist_freqs: int, K: int,
):
    k = pl.program_id(1)
    bf = jnp.bfloat16
    emb = emb_ref[0].astype(bf)                      # [T, C]
    dists = dists_ref[0].astype(bf)                  # [T, D]

    def mm(x, w_ref):
        return jnp.dot(x, w_ref[:].astype(bf),
                       preferred_element_type=jnp.float32)

    x = (mm(emb, w1a_ref)
         + mm(_pe_blocks(emb, num_feat_freqs), w1b_ref)
         + mm(_pe_blocks(dists, num_dist_freqs), w1c_ref)
         + b1_ref[:])
    x = jnp.where(x > 0, x, 0.1 * x).astype(bf)
    x = jnp.dot(x, w2_ref[:].astype(bf),
                preferred_element_type=jnp.float32) + b2_ref[:]
    x = jnp.where(x > 0, x, 0.1 * x).astype(bf)

    h = mm(x, w3a_ref) + mm(cd_ref[0].astype(bf), w3b_ref) + b3_ref[:]
    h = jnp.where(h > 0, h, 0.1 * h).astype(bf)
    h = jnp.dot(h, w4_ref[:].astype(bf),
                preferred_element_type=jnp.float32) + b4_ref[:]
    h = jnp.where(h > 0, h, 0.1 * h)                 # [T, 256] f32

    alpha = jnp.maximum(
        jnp.dot(h.astype(bf), wd_ref[:].astype(bf),
                preferred_element_type=jnp.float32) + bd_ref[:], 0.0)

    wk = wk_ref[0].astype(jnp.float32)               # [T, 1]
    aw_c = alpha * wk
    hw_c = h * wk

    @pl.when(k == 0)
    def _init():
        aw_ref[:] = aw_c
        hw_ref[:] = hw_c

    @pl.when(k > 0)
    def _acc():
        aw_ref[:] = aw_ref[:] + aw_c
        hw_ref[:] = hw_ref[:] + hw_c


@functools.partial(
    jax.jit, static_argnames=("K", "num_feat_freqs", "num_dist_freqs",
                              "interpret"))
def fused_decode2(
    params: Dict[str, Any],
    emb: jnp.ndarray,      # [M, K, C]
    dists: jnp.ndarray,    # [M, K, D] already Rw2c-rotated
    color: jnp.ndarray,    # [M, K, 3]
    dirdot: jnp.ndarray,   # [M, K, 4]
    wk: jnp.ndarray,       # [M, K] aggregation weight * mask
    dir_pe: jnp.ndarray,   # [M, P] per-slot viewdir PE (sans raw dirs)
    K: int,
    num_feat_freqs: int,
    num_dist_freqs: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-accumulating fused decode -> (sigma [M], rgb [M, 3])."""
    M, _, C = emb.shape
    D = dists.shape[-1]
    T = min(TILE_M2, max(256, M))
    n = (M + T - 1) // T
    padM = n * T - M

    def kmc(x):       # [M, K, c] -> [K, n*T, c]
        x = jnp.swapaxes(x, 0, 1)
        return jnp.pad(x, ((0, 0), (0, padM), (0, 0)))

    cd = jnp.concatenate([color, dirdot], axis=-1)           # [M, K, 7]

    perm = _w1_permutation(C, num_feat_freqs, D, num_dist_freqs)
    w1 = params["mlp_base"][0]["kernel"][perm].astype(jnp.bfloat16)
    nf, nd = 2 * C * num_feat_freqs, 2 * D * num_dist_freqs
    w1a, w1b, w1c = w1[:C], w1[C:C + nf], w1[C + nf:C + nf + nd]

    def wb(name, i):
        lyr = params[name][i]
        return (lyr["kernel"].astype(jnp.bfloat16),
                lyr["bias"][None, :].astype(jnp.float32))

    _, b1 = wb("mlp_base", 0)
    w2, b2 = wb("mlp_base", 1)
    w3, b3 = wb("mlp_head", 0)
    w3a, w3b = w3[:w2.shape[1]], w3[w2.shape[1]:]
    w4, b4 = wb("mlp_head", 1)
    wd, bd = wb("density_head", 0)
    plist = (w1a, w1b, w1c, b1, w2, b2, w3a, w3b, b3, w4, b4, wd, bd)

    kern = functools.partial(
        _kacc_kernel, num_feat_freqs=num_feat_freqs,
        num_dist_freqs=num_dist_freqs, K=K)

    def in_spec(c):
        return pl.BlockSpec((1, T, c), lambda i, k: (k, i, 0),
                            memory_space=pltpu.VMEM)

    def out_spec(c):
        return pl.BlockSpec((T, c), lambda i, k: (i, 0),
                            memory_space=pltpu.VMEM)

    hidden = w4.shape[1]
    aw, hw = pl.pallas_call(
        kern,
        grid=(n, K),
        in_specs=[in_spec(C), in_spec(D), in_spec(7), in_spec(1)]
                 + [_full_spec() for _ in plist],
        out_specs=(out_spec(1), out_spec(hidden)),
        out_shape=(
            jax.ShapeDtypeStruct((n * T, 1), jnp.float32),
            jax.ShapeDtypeStruct((n * T, hidden), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(kmc(emb), kmc(dists), kmc(cd), kmc(wk[..., None]), *plist)

    return _color_tower(params, aw[:M, 0], hw[:M], dir_pe)
