"""Fully-fused chunk pipeline: candidate select + extract + dists +
aggregation weights + radiance decode in ONE Pallas VMEM pass.

The chunk-stage attribution (tools/probe_chunk_stages.py, chair
geometry, M=524k) put the lax.map chunk pipeline at ~112 ms with the
cost SPREAD across bytes-heavy stages — gather+geometry ~45 ms,
one-hot extract ~22 ms, attr/perspective dists ~15 ms, weights+decode
~30 ms — every [Mc, CAND, .] intermediate round-tripping HBM with
small-minor-dim padding waste, while single-stage ablations and chunk
sizing were flat. Partial fusions measured as washes for the same
reason (ops/fused_select.py fused only the selection stages;
ops/fused_decode.py only the MLP tower). This kernel consumes the
XLA-gathered candidate block ONCE and emits only per-slot
(sigma, rgb, found): no [M, C, .] or [M, K, .] intermediate ever
touches HBM.

Layout: the kernel-facing cache pair of ops/fused_select.py
(meta [max_q, C] i32, pay [max_q, PK, C] bf16 channel-major), plus one
[M, 16] f32 aux row per slot (locs, voxel center, ray dir, mask) and
one tiny const block (campos / camrotc2w / Rw2c rows).

Semantics are decode_radiance + aggregation_weight("linear") +
chunk_body's selection, restructured like ops/fused_decode.py's
split-matmul form (block-layout positional encodings compensated by
permuting first-layer weight rows; concat-free matmuls). bf16/f32
rounding ORDER differs from the XLA path in the split matmuls and the
f32 (vs bf16) K-accumulation, so outputs match the XLA chunk pipeline
to bf16-rounding tolerance, not bit-for-bit (tests/test_fused_chunk.py
bounds it; masks match exactly).

Reference counterpart: the CUDA query kernels + the studio model's
masked MLP tower (query_worldcoords.cu, studio_model.py:263-399) —
redesigned as one on-chip pass for the TPU memory system.
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
from pointnerf2studio_tpu.ops.fused_decode import (
    _pe_blocks, _w1_permutation)
from pointnerf2studio_tpu.ops.fused_select import PK

VMEM_LIMIT = 100 * 1024 * 1024


def fused_chunk_eligible(cfg: AggregatorConfig, per_point_rw2c: bool,
                         K: int) -> bool:
    """The kernel implements the flagship configuration; anything else
    uses the lax.map chunk pipeline."""
    return (not per_point_rw2c
            and cfg.agg_intrp_order == 2
            and cfg.agg_distance_kernel == "linear"
            and cfg.agg_weight_norm
            and not cfg.conf_in_weight
            and tuple(cfg.axis_weight) == (1.0, 1.0, 1.0)
            and cfg.point_color_mode and cfg.point_dir_mode
            and cfg.num_mlp_base_layers == 2
            and cfg.num_mlp_head_layers == 2
            and cfg.dist_dim == 6
            and cfg.point_features_dim == 32
            and cfg.shading_feature_dim == cfg.point_features_dim
            and cfg.compute_dtype == "bfloat16")


def _dirpe_permutation(F: int) -> np.ndarray:
    """Row permutation mapping block-layout PE(viewdirs) (sans raw
    dirs) onto the reference interleaved layout: interleaved index for
    channel i, freq j is (i*F + j)*2 + (0 sin | 1 cos)."""
    perm = []
    for sc in (0, 1):
        for j in range(F):
            for i in range(3):
                perm.append((i * F + j) * 2 + sc)
    return np.asarray(perm, np.int64)


def _kernel(meta_ref, pay_ref, aux_ref, const_ref,
            w1a_ref, w1b_ref, w1c_ref, b1_ref, w2_ref, b2_ref,
            w3a_ref, w3b_ref, b3_ref, w4_ref, b4_ref, wd_ref, bd_ref,
            wc0a_ref, wc0b_ref, bc0_ref, *rest,
            K: int, radius2: float, num_shells: int,
            nff: int, ndf: int, nvf: int, act_super: bool,
            n_color_rest: int):
    bf = jnp.bfloat16
    f32 = jnp.float32
    color_rest = rest[: 2 * n_color_rest]
    wch_ref, bch_ref, out_ref = rest[2 * n_color_rest:]

    meta = meta_ref[:]                                    # [B, C]
    B, C = meta.shape
    shell = jnp.bitwise_and(meta, 3)
    aux = aux_ref[:]                                      # [B, 16]
    locs = [aux[:, i] for i in range(3)]
    center = [aux[:, 3 + i] for i in range(3)]
    rd = [aux[:, 6 + i] for i in range(3)]
    maskc = aux[:, 9] != 0.0
    valid = (meta >= 0) & maskc[:, None]

    cam = [const_ref[0, i] for i in range(3)]             # campos
    R = [[const_ref[1 + r, i] for i in range(3)]
         for r in range(3)]                               # camrotc2w
    W = [[const_ref[4 + r, i] for i in range(3)]
         for r in range(3)]                               # Rw2c

    # selection distances: payload xyz is RELATIVE TO THE VOXEL CENTER
    px = pay_ref[:, 0, :].astype(f32)                     # [B, C]
    py = pay_ref[:, 1, :].astype(f32)
    pz = pay_ref[:, 2, :].astype(f32)
    dx = px + (center[0] - locs[0])[:, None]
    dy = py + (center[1] - locs[1])[:, None]
    dz = pz + (center[2] - locs[2])[:, None]
    d2 = dx * dx + dy * dy + dz * dz

    ok = valid
    if radius2 > 0:
        ok = ok & (d2 <= radius2)
    if num_shells > 1:
        eligible = shell == 0
        before = jnp.zeros((B, 1), jnp.int32)
        for s in range(1, num_shells):
            before = before + jnp.sum(
                (ok & (shell == s - 1)).astype(jnp.int32), -1,
                keepdims=True)
            eligible = eligible | ((shell == s) & (before < K))
        ok = ok & eligible

    # pass 1: K-nearest selection (smallest-index tie-break), payload
    # extraction, and unnormalized linear-kernel weights
    inf = jnp.float32(jnp.inf)
    key = jnp.where(ok, d2, inf)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    pay_f = pay_ref[:].astype(f32)                        # [B, PK, C]
    pays, masks, wraw, dwork = [], [], [], []
    wsum = jnp.zeros((B,), f32)
    for _ in range(K):
        m = jnp.min(key, -1, keepdims=True)
        hit = key == m
        first_col = jnp.min(jnp.where(hit, col, C), -1, keepdims=True)
        sel = (col == first_col) & (m < inf)              # [B, C]
        pm = jnp.any(sel, -1)                             # [B]
        pv = jax.lax.dot_general(
            pay_f, sel.astype(f32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                   # [B, PK]
        key = jnp.where(sel, inf, key)
        # world delta exactly as the XLA path: (xyz_rel + center) - locs
        nx = [pv[:, i] + center[i] for i in range(3)]     # neighbor xyz
        dw = [nx[i] - locs[i] for i in range(3)]
        dn = jnp.sqrt(dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2])
        w = pm.astype(f32) / jnp.maximum(dn, 1e-6)
        pays.append(pv)
        masks.append(pm)
        wraw.append(w)
        dwork.append((nx, dw))
        wsum = wsum + w
    wnorm = 1.0 / jnp.maximum(wsum, 1e-8)

    # per-slot view direction (Rw2c-rotated) + its block-layout PE
    vd = [rd[0] * W[0][j] + rd[1] * W[1][j] + rd[2] * W[2][j]
          for j in range(3)]
    # camera-space locs for the perspective offsets
    ls = [locs[i] - cam[i] for i in range(3)]
    lc = [ls[0] * R[0][j] + ls[1] * R[1][j] + ls[2] * R[2][j]
          for j in range(3)]
    lpx, lpy = lc[0] / lc[2], lc[1] / lc[2]

    def leaky(x):
        return jnp.where(x > 0, x, 0.1 * x)

    def mm(x, w_ref):
        return jnp.dot(x.astype(bf), w_ref[:].astype(bf),
                       preferred_element_type=f32)

    # pass 2: per-K feature build + MLP tower, f32 K-accumulation
    aw_sum = jnp.zeros((B, 1), f32)
    hw_sum = None
    found = jnp.zeros((B,), jnp.bool_)
    for k in range(K):
        pv, pm = pays[k], masks[k]
        nx, dw = dwork[k]
        emb = pv[:, 3:3 + 32].astype(bf)                  # [B, 32]
        ncol = pv[:, 39:42]
        ndir = pv[:, 36:39]
        # perspective offsets via w2pers, mirroring _decode_tail
        ns = [nx[i] - cam[i] for i in range(3)]
        nc = [ns[0] * R[0][j] + ns[1] * R[1][j] + ns[2] * R[2][j]
              for j in range(3)]
        npx, npy = nc[0] / nc[2], nc[1] / nc[2]
        pd = [npx * nc[2] - lpx * lc[2],
              npy * nc[2] - lpy * lc[2],
              nc[2] - lc[2]]
        # world part rotated into the (global) Rw2c frame
        dr = [dw[0] * W[0][j] + dw[1] * W[1][j] + dw[2] * W[2][j]
              for j in range(3)]
        dists_rot = jnp.stack(dr + pd, axis=-1).astype(bf)  # [B, 6]

        x = (mm(emb, w1a_ref)
             + mm(_pe_blocks(emb, nff), w1b_ref)
             + mm(_pe_blocks(dists_rot, ndf), w1c_ref))
        x = leaky((x.astype(bf) + b1_ref[:].astype(bf)).astype(f32))
        x = mm(x, w2_ref)
        x = leaky((x.astype(bf) + b2_ref[:].astype(bf)).astype(f32))

        ndr = [ndir[:, 0] * W[0][j] + ndir[:, 1] * W[1][j]
               + ndir[:, 2] * W[2][j] for j in range(3)]
        dirdot = jnp.stack(
            [ndr[0] - vd[0], ndr[1] - vd[1], ndr[2] - vd[2],
             ndr[0] * vd[0] + ndr[1] * vd[1] + ndr[2] * vd[2]],
            axis=-1)                                      # [B, 4]
        cd = jnp.concatenate(
            [ncol, dirdot], axis=-1).astype(bf)           # [B, 7]
        h = mm(x, w3a_ref) + mm(cd, w3b_ref)
        h = leaky((h.astype(bf) + b3_ref[:].astype(bf)).astype(f32))
        h = mm(h, w4_ref)
        h = leaky((h.astype(bf) + b4_ref[:].astype(bf)).astype(f32))

        raw = (mm(h, wd_ref).astype(bf)
               + bd_ref[:].astype(bf)).astype(f32)
        alpha = (jax.nn.softplus(raw - 1.0) if act_super
                 else jnp.maximum(raw, 0.0))

        wk = (wraw[k] * wnorm)[:, None]                   # [B, 1]
        aw_sum = aw_sum + alpha * wk
        hk = h * wk
        hw_sum = hk if hw_sum is None else hw_sum + hk
        found = found | pm

    # color tower on the aggregated feature
    x = mm(hw_sum, wc0a_ref) + mm(
        _pe_blocks(jnp.stack(vd, -1).astype(bf), nvf), wc0b_ref)
    x = leaky((x.astype(bf) + bc0_ref[:].astype(bf)).astype(f32))
    for i in range(n_color_rest):
        x = mm(x, color_rest[2 * i])
        x = leaky((x.astype(bf)
                   + color_rest[2 * i + 1][:].astype(bf)).astype(f32))
    raw_rgb = (mm(x, wch_ref).astype(bf)
               + bch_ref[:].astype(bf)).astype(f32)
    rgb = jax.nn.sigmoid(raw_rgb) * (1 + 2e-3) - 1e-3     # [B, 3]

    out_ref[:] = jnp.concatenate(
        [aw_sum, rgb, found.astype(f32)[:, None],
         jnp.zeros((B, 3), f32)], axis=-1)


def _prep_params(params: Dict[str, Any], C: int, nff: int, ndf: int,
                 nvf: int):
    """Split/permute the weight matrices for the kernel's block-PE,
    concat-free matmul structure (see ops/fused_decode.py)."""
    bf = jnp.bfloat16

    def wb(name, i):
        lyr = params[name][i]
        return (lyr["kernel"].astype(bf),
                lyr["bias"][None, :].astype(jnp.float32))

    perm = _w1_permutation(C, nff, 6, ndf)
    w1 = params["mlp_base"][0]["kernel"][perm].astype(bf)
    nf = 2 * C * nff
    nd = 2 * 6 * ndf
    w1a, w1b, w1c = w1[:C], w1[C:C + nf], w1[C + nf:C + nf + nd]
    _, b1 = wb("mlp_base", 0)
    w2, b2 = wb("mlp_base", 1)
    w3, b3 = wb("mlp_head", 0)
    w3a, w3b = w3[: w2.shape[1]], w3[w2.shape[1]:]
    w4, b4 = wb("mlp_head", 1)
    wd, bd = wb("density_head", 0)

    c0 = params["mlp_color"][0]["kernel"]
    hidden = w4.shape[1]
    dperm = hidden + _dirpe_permutation(nvf)
    wc0a = c0[:hidden].astype(bf)
    wc0b = c0[dperm].astype(bf)
    _, bc0 = wb("mlp_color", 0)
    rest = []
    for i in range(1, len(params["mlp_color"])):
        wci, bci = wb("mlp_color", i)
        rest.extend([wci, bci])
    wch, bch = wb("color_head", 0)
    return ((w1a, w1b, w1c, b1, w2, b2, w3a, w3b, b3, w4, b4, wd, bd,
             wc0a, wc0b, bc0) + tuple(rest) + (wch, bch),
            len(params["mlp_color"]) - 1)


@functools.partial(
    jax.jit,
    static_argnames=("K", "radius2", "num_shells", "nff", "ndf", "nvf",
                     "act_super", "block", "interpret"))
def fused_chunk_decode(
    params: Dict[str, Any],
    Rw2c: jnp.ndarray,          # [3, 3]
    camrotc2w: jnp.ndarray,     # [3, 3]
    campos: jnp.ndarray,        # [3]
    meta_g: jnp.ndarray,        # [M, C] i32 (gathered)
    pay_g: jnp.ndarray,         # [M, PK, C] bf16 (gathered)
    locs: jnp.ndarray,          # [M, 3] f32
    center: jnp.ndarray,        # [M, 3] f32
    rd: jnp.ndarray,            # [M, 3] f32
    mask_c: jnp.ndarray,        # [M] bool
    *, K: int, radius2: float, num_shells: int,
    nff: int, ndf: int, nvf: int, act_super: bool,
    block: int = 512, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused pass over all M slots -> (sig [M], rgb [M, 3],
    found [M])."""
    M, C = meta_g.shape
    B = min(block, M)
    n = (M + B - 1) // B
    pad = n * B - M

    aux = jnp.concatenate(
        [locs.astype(jnp.float32), center.astype(jnp.float32),
         rd.astype(jnp.float32), mask_c.astype(jnp.float32)[:, None],
         jnp.zeros((M, 6), jnp.float32)], axis=-1)        # [M, 16]
    if pad:
        meta_g = jnp.pad(meta_g, ((0, pad), (0, 0)),
                         constant_values=-1)
        pay_g = jnp.pad(pay_g, ((0, pad), (0, 0), (0, 0)))
        aux = jnp.pad(aux, ((0, pad), (0, 0)))

    const = jnp.zeros((8, 128), jnp.float32)
    const = const.at[0, :3].set(campos.astype(jnp.float32))
    const = const.at[1:4, :3].set(camrotc2w.astype(jnp.float32))
    const = const.at[4:7, :3].set(Rw2c.astype(jnp.float32))

    # the cache payload layout fixes the feature width at 32
    # (PAYW = 3 xyz + 32 emb + 1 conf + 3 dir + 3 color + pad)
    plist, n_color_rest = _prep_params(params, C=32, nff=nff,
                                       ndf=ndf, nvf=nvf)

    kern = functools.partial(
        _kernel, K=K, radius2=radius2, num_shells=num_shells,
        nff=nff, ndf=ndf, nvf=nvf, act_super=act_super,
        n_color_rest=n_color_rest)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, PK, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full() for _ in plist],
        out_specs=pl.BlockSpec((B, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * B, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(meta_g, pay_g, aux, const, *plist)

    out = out[:M]
    return out[:, 0], out[:, 1:4], out[:, 4] != 0
