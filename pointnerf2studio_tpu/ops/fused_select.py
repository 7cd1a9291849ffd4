"""Fused candidate-selection Pallas kernel for the fast render path.

chunk_pipeline's candidate stages — distance computation, radius/
validity masking, layered shell eligibility, K-nearest selection and
payload extraction — are individually trivial VPU work over
[Mc, CAND] tiles, but as separate XLA ops each stage round-trips its
[Mc, CAND, ·] intermediate through HBM and lowers with padding waste
(the one-hot extract einsum alone measured ~9 ms at bench scale).
This kernel does all of them in ONE VMEM pass over the gathered
candidate block: read the candidates once, emit only the K selected
payloads + masks.

Data layout: the fat cache rows are re-packed once per scene into a
kernel-facing pair (pack_kernel_cache):
  meta [max_q, C]       int32   pidx * 4 + shell, -1 empty
  pay  [max_q, PK, C]   bf16    payload channel-major (PK = PAYW
                                padded to a sublane multiple), so a
                                block slices channels along the
                                SUBLANE axis — no lane relayouts.
The XLA row gather stays outside the kernel (it is only 2-6 ms and
row-bound either way); the kernel consumes the gathered block.

Selection semantics are IDENTICAL to chunk_body (fast_render.py):
ok = valid & mask & (d2 <= radius2), shell-layered eligibility, then
the K smallest d2 with smallest-index tie-break (lax.top_k's order).

Reference counterpart: the CUDA query kernels + torch index_select
gather (pointnerf/models/neural_points/query_worldcoords.cu,
nerfstudio/studio_utils.py:147-209) — redesigned as a single fused
on-chip pass for the TPU memory system.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.models.fast_render import PAYW, ROWW

PK = 48                      # payload channels padded to 3 bf16 sublanes


def pack_kernel_cache(rows: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FatCache.rows [max_q, C*ROWW] f32 -> (meta [max_q, C] i32,
    pay [max_q, PK, C] bf16), channel-major for sublane slicing."""
    max_q = rows.shape[0]
    C = rows.shape[1] // ROWW
    r3 = rows.reshape(max_q, C, ROWW)
    meta = jax.lax.bitcast_convert_type(r3[..., 0], jnp.int32)
    pay = jax.lax.bitcast_convert_type(
        r3[..., 1:], jnp.bfloat16).reshape(max_q, C, PAYW)
    pay = jnp.pad(pay, ((0, 0), (0, 0), (0, PK - PAYW)))
    return meta, jnp.transpose(pay, (0, 2, 1))


def _select_kernel(meta_ref, pay_ref, cd0_ref, mask_ref,
                   nsel_ref, pmask_ref,
                   *, K: int, radius2: float, num_shells: int,
                   C: int, B: int):
    """One block of B slots: meta [B, C] i32, pay [B, PK, C] bf16,
    cd0 [B, 8] f32 (center - locs, xyz in cols 0..2), mask [B, 8] i32
    (col 0) -> nsel [B, K, PK] f32, pmask [B, K] i32."""
    meta = meta_ref[:]                                   # [B, C]
    shell = jnp.bitwise_and(meta, 3)
    cd0 = cd0_ref[:]                                     # [B, 8]
    valid = (meta >= 0) & (mask_ref[:, 0][:, None] != 0)

    # candidate xyz relative to the query sample
    dx = pay_ref[:, 0, :].astype(jnp.float32) + cd0[:, 0][:, None]
    dy = pay_ref[:, 1, :].astype(jnp.float32) + cd0[:, 1][:, None]
    dz = pay_ref[:, 2, :].astype(jnp.float32) + cd0[:, 2][:, None]
    d2 = dx * dx + dy * dy + dz * dz                     # [B, C]

    ok = valid
    if radius2 > 0:
        ok = ok & (d2 <= radius2)
    if num_shells > 1:
        # layered eligibility: shell s is searchable only while fewer
        # than K candidates were accepted in shells < s
        eligible = shell == 0
        before = jnp.zeros((B, 1), jnp.int32)
        for s in range(1, num_shells):
            before = before + jnp.sum(
                (ok & (shell == s - 1)).astype(jnp.int32), -1,
                keepdims=True)
            eligible = eligible | ((shell == s) & (before < K))
        ok = ok & eligible

    # K iterative min-extractions == lax.top_k(-d2) with
    # smallest-index tie-break
    inf = jnp.float32(jnp.inf)
    key = jnp.where(ok, d2, inf)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    pay_f = pay_ref[:].astype(jnp.float32)               # [B, PK, C]
    for k in range(K):
        m = jnp.min(key, -1, keepdims=True)              # [B, 1]
        hit = key == m                                   # [B, C]
        first_col = jnp.min(jnp.where(hit, col, C), -1,
                            keepdims=True)               # [B, 1]
        sel = (col == first_col) & (m < inf)             # one-hot [B,C]
        selb = sel.astype(jnp.float32)
        # channel extraction: one [B, PK, C] x [B, C] contraction
        nsel_ref[:, k, :] = jax.lax.dot_general(
            pay_f, selb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [B, PK]
        pmask_ref[:, k] = jnp.any(sel, -1).astype(jnp.int32)
        key = jnp.where(sel, inf, key)


def fused_candidate_select(meta_g: jnp.ndarray,      # [Mc, C] i32
                           pay_g: jnp.ndarray,       # [Mc, PK, C] bf16
                           cdelta0: jnp.ndarray,     # [Mc, 3] f32
                           mask_c: jnp.ndarray,      # [Mc] bool
                           K: int, radius2: float, num_shells: int,
                           block: int = 256,
                           interpret: bool = False):
    """Returns (nsel [Mc, K, PK] f32, pnt_mask [Mc, K] bool). The
    payload channels of unselected (padded) k-slots are zero."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mc, C = meta_g.shape
    B = min(block, Mc)
    while Mc % B:
        B //= 2
    assert B >= 1
    cd0 = jnp.pad(cdelta0.astype(jnp.float32), ((0, 0), (0, 5)))
    mask8 = jnp.pad(mask_c.astype(jnp.int32)[:, None],
                    ((0, 0), (0, 7)))

    kern = functools.partial(_select_kernel, K=K, radius2=radius2,
                             num_shells=num_shells, C=C, B=B)
    nsel, pmask = pl.pallas_call(
        kern,
        grid=(Mc // B,),
        in_specs=[
            pl.BlockSpec((B, C), lambda i: (i, 0)),
            pl.BlockSpec((B, PK, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, 8), lambda i: (i, 0)),
            pl.BlockSpec((B, 8), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((B, K, PK), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, K), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, K, PK), jnp.float32),
            jax.ShapeDtypeStruct((Mc, K), jnp.int32),
        ],
        interpret=interpret,
    )(meta_g, pay_g, cd0, mask8)
    return nsel, pmask != 0
