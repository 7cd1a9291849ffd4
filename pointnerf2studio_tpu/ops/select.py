"""Pallas row-compaction selection: first-BP valid columns per row.

The fast render/train paths need, for every ray, the column ids of the
first (<= BP) valid samples of a [R, D] validity mask — the reference
does this with CUDA atomics inside query_worldcoords.cu's per-ray
loops (reference: pointnerf/models/neural_points/c_ext); the XLA
expression used so far is `lax.top_k` over masked negative column ids,
which is a full per-row sort (O(D log^2 D) sorting network) for what
is really a prefix-compaction. This kernel does it in one VMEM pass:

  rank[r, d] = inclusive prefix count of valid columns  (ONE upper-
               triangular bf16 matmul on the MXU — 0/1 inputs with an
               f32 accumulator keep the count exact)
  col_sel[r, b] = the column with rank b+1   (BP masked lane-reduces
               on the VPU, all operands resident in VMEM)

HBM traffic is exactly one read of qs plus one [R, 128] write, vs the
sort's multiple materialized passes. Outputs match the top_k
expression bit-for-bit: col_sel[r, b] for b < cnt_raw is the (b+1)-th
valid column id ascending; slots past the per-row count hold D (the
same "invalid" sentinel the callers pad with); cnt_raw is the raw
per-row valid count (callers clip to min(SR, BP)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(qs_ref, ut_ref, out_ref, *, Dax: int, BP: int):
    qs = qs_ref[:]                                    # [BR, DP] int32
    col = jax.lax.broadcasted_iota(jnp.int32, qs.shape, 1)
    mask = (qs >= 0) & (col < Dax)
    mb = mask.astype(jnp.bfloat16)
    # inclusive prefix-count of valid columns: ut_ref is upper-
    # triangular ones (ut[k, d] = 1 iff k <= d) so
    # rank[r, d] = sum_{k <= d} mask[r, k]. The 0/1 bf16 inputs and
    # f32 accumulation make the count exact.
    rank = jax.lax.dot_general(
        mb, ut_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt_raw = rank[:, Dax - 1]                        # [BR]
    cols = []
    colz = jnp.where(mask, col, 0)
    for b in range(BP):
        oh = rank == (b + 1)
        # rank is non-decreasing so (rank==b+1)&mask has exactly one
        # set lane when b < cnt_raw; sum == that column id
        cb = jnp.sum(jnp.where(oh & mask, colz, 0), axis=-1)
        cols.append(jnp.where(b < cnt_raw, cb, Dax))
    sel = jnp.stack(cols, axis=-1)                    # [BR, BP]
    out = jnp.concatenate(
        [sel, cnt_raw[:, None],
         jnp.zeros((qs.shape[0], _LANES - BP - 1), jnp.int32)], -1)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("BP", "interpret"))
def first_valid_cols(qs: jnp.ndarray, BP: int, interpret: bool = False):
    """Per-row ids of the first BP valid (>= 0) entries of qs [R, D].

    Returns (col_sel [R, BP] int32 — (b+1)-th valid column id, D where
    b >= count; cnt_raw [R] int32 — raw per-row valid count).
    """
    R, Dax = qs.shape
    assert BP + 1 <= _LANES, "BP must leave a lane for the count"
    DP = _round_up(max(Dax, _LANES), _LANES)
    BR = 256
    RP = _round_up(R, BR)
    if DP != Dax or RP != R:
        qs = jnp.pad(qs, ((0, RP - R), (0, DP - Dax)),
                     constant_values=-1)
    ut = jnp.triu(jnp.ones((DP, DP), jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_kernel, Dax=Dax, BP=BP),
        out_shape=jax.ShapeDtypeStruct((RP, _LANES), jnp.int32),
        grid=(RP // BR,),
        in_specs=[
            pl.BlockSpec((BR, DP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DP, DP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qs, ut)
    return out[:R, :BP], out[:R, BP]


def first_valid_cols_reference(qs: jnp.ndarray, BP: int):
    """The lax.top_k expression the kernel replaces (for parity tests
    and non-TPU backends)."""
    R, Dax = qs.shape
    mask = qs >= 0
    col = jax.lax.broadcasted_iota(jnp.int32, (R, Dax), 1)
    kk = min(BP, Dax)
    neg = jax.lax.top_k(jnp.where(mask, -col, -(Dax + 1)), kk)[0]
    col_sel = jnp.where(neg >= -Dax, -neg, Dax)
    if kk < BP:
        col_sel = jnp.pad(col_sel, ((0, 0), (0, BP - kk)),
                          constant_values=Dax)
    cnt_raw = jnp.sum(mask.astype(jnp.int32), -1)
    return col_sel, cnt_raw


def select_first_cols(qs: jnp.ndarray, BP: int, cap: int,
                      mode: str = "topk"):
    """First-BP valid column ids of qs [R, Dax] plus the CLIPPED
    per-row keep count (min(raw count, cap)) and the raw any-valid
    mask. `mode="pallas"` uses the VMEM row-compaction kernel on TPU
    and falls back to the top_k expression elsewhere."""
    if mode == "pallas" and jax.default_backend() == "tpu":
        col_sel, cnt_raw = first_valid_cols(qs, BP)
    else:
        col_sel, cnt_raw = first_valid_cols_reference(qs, BP)
    return col_sel, jnp.minimum(cnt_raw, cap), cnt_raw > 0


def rank_gather_pack(qs: jnp.ndarray, col_sel: jnp.ndarray,
                     cnt: jnp.ndarray, M: int):
    """Dense-pack each ray's first-cnt[r] selected columns into M
    slots, by RANK-GATHER instead of dest-scatter.

    The obvious pack scatters the [R, BP] slot grid to its cumsum
    offsets — R*BP scattered rows, row-issue-bound on v5e (tens of ms
    at bench scale). Instead invert the offset cumsum:
    ray(m) = #{r : off_end[r] <= m}, recovered from ONE [R]-row
    scatter-add into an [M+1] histogram + a cumsum over [M]; slot /
    column / qslot then come from cheap [M]-row gathers. Output is
    identical to the dest-scatter (slots past sum(cnt) are masked).

    Returns (sel_ray, sel_slot, colm, sel, qslot_c, mask_c): packed
    ray id, per-ray slot index, selected column (clamped to Dax-1),
    flat (ray*Dax + col) id, gathered qs value (>= 0), and the
    valid-prefix mask over the M slots.
    """
    R, Dax = qs.shape
    BP = col_sel.shape[1]
    off_end = jnp.cumsum(cnt)
    off = off_end - cnt
    inc = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.minimum(off_end, M)].add(1, mode="drop")
    mi = jnp.arange(M, dtype=jnp.int32)
    sel_ray = jnp.minimum(jnp.cumsum(inc)[:M], R - 1)
    sel_slot = mi - off[sel_ray]
    colm = jnp.minimum(
        col_sel.reshape(-1)[sel_ray * BP
                            + jnp.clip(sel_slot, 0, BP - 1)],
        Dax - 1)
    sel = sel_ray * Dax + colm
    qslot_c = jnp.maximum(qs.reshape(-1)[sel], 0)
    mask_c = mi < jnp.minimum(off_end[-1], M)
    return sel_ray, sel_slot, colm, sel, qslot_c, mask_c
