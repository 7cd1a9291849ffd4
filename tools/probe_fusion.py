"""Probe: do optimization barriers / pre-materialization fix the slow
fused gathers seen in probe_stages?

Findings feed directly into ops/query.py + models/neural_points.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_v(fn, variants, *rest, n=10):
    out = jax.block_until_ready(fn(variants[0], *rest))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(variants[i % len(variants)], *rest)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    base = timed_v(jax.jit(lambda x: x + 1),
                   [jnp.zeros(8) + i for i in range(4)])
    print(f"dispatch baseline {base*1e3:.2f} ms")

    # ---- A: qslot-style 3-D gather with computed indices ----
    dims = (160, 160, 160)
    grid3 = jax.random.randint(key, dims, -1, 200_000, jnp.int32)
    R, D = 32768, 180
    rp_vars = [jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(i), (R, D, 3),
                           jnp.float32, -1.1, 1.1)) for i in range(4)]
    rmin = jnp.float32(-1.2)
    vs = jnp.float32(0.008)
    dims_arr = jnp.array(dims, jnp.int32)

    def qslot_plain(raypos, grid3):
        gc = jnp.floor((raypos - rmin) / vs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        q = grid3[gcc[..., 0], gcc[..., 1], gcc[..., 2]]
        return jnp.where(inb, q, -1)

    def qslot_barrier(raypos, grid3):
        gc = jnp.floor((raypos - rmin) / vs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        gcc = jax.lax.optimization_barrier(gcc)
        q = grid3[gcc[..., 0], gcc[..., 1], gcc[..., 2]]
        return jnp.where(inb, q, -1)

    def qslot_flat_barrier(raypos, grid3):
        gc = jnp.floor((raypos - rmin) / vs).astype(jnp.int32)
        inb = jnp.all((gc >= 0) & (gc < dims_arr), axis=-1)
        gcc = jnp.clip(gc, 0, dims_arr - 1)
        flat = (gcc[..., 0] * dims[1] + gcc[..., 1]) * dims[2] + gcc[..., 2]
        flat = jax.lax.optimization_barrier(flat)
        q = grid3.reshape(-1)[flat]
        return jnp.where(inb, q, -1)

    for name, f in [("plain 3d", qslot_plain), ("barrier 3d", qslot_barrier),
                    ("barrier flat", qslot_flat_barrier)]:
        t = timed_v(jax.jit(f), rp_vars, grid3)
        print(f"A qslot {name:14}: {(t-base)*1e3:7.1f} ms")

    # ---- B: attr gather [M,K] from packed vs concat-fused table ----
    N, C = 700_000, 39
    M, K = 262_144, 8
    emb = jax.random.normal(key, (N, 32))
    conf = jax.random.normal(key, (N, 1))
    pdir = jax.random.normal(key, (N, 3))
    pcol = jax.random.normal(key, (N, 3))
    packed = jnp.concatenate([emb, conf, pdir, pcol], -1)
    pidx_vars = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(i), (M, K), -1, N, jnp.int32))
        for i in range(4)]

    def attr_concat(pidx, emb, conf, pdir, pcol):
        idx = jnp.clip(pidx, 0, N - 1)
        pk = jnp.concatenate([emb, conf, pdir, pcol], -1)
        return pk[idx]

    def attr_packed(pidx, packed):
        idx = jnp.clip(pidx, 0, N - 1)
        return packed[idx]

    def attr_packed_barrier(pidx, packed):
        idx = jax.lax.optimization_barrier(jnp.clip(pidx, 0, N - 1))
        return packed[idx]

    def attr_packed_flat(pidx, packed):
        idx = jax.lax.optimization_barrier(
            jnp.clip(pidx.reshape(-1), 0, N - 1))
        return packed[idx].reshape(M, K, C)

    t = timed_v(jax.jit(attr_concat), pidx_vars, emb, conf, pdir, pcol)
    print(f"B attr concat-fused : {(t-base)*1e3:7.1f} ms")
    t = timed_v(jax.jit(attr_packed), pidx_vars, packed)
    print(f"B attr packed       : {(t-base)*1e3:7.1f} ms")
    t = timed_v(jax.jit(attr_packed_barrier), pidx_vars, packed)
    print(f"B attr packed+barr  : {(t-base)*1e3:7.1f} ms")
    t = timed_v(jax.jit(attr_packed_flat), pidx_vars, packed)
    print(f"B attr packed flat  : {(t-base)*1e3:7.1f} ms")

    # ---- C: top_k over [M, 64] pick 8 vs iterative max ----
    d2_vars = [jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(i), (M, 64))) for i in range(4)]

    def knn_topk(d2):
        nk, ik = jax.lax.top_k(-d2, 8)
        return ik

    def knn_iter(d2):
        x = d2
        idxs = []
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for _ in range(8):
            am = jnp.argmin(x, axis=-1)
            idxs.append(am)
            x = jnp.where(col == am[:, None], jnp.inf, x)
        return jnp.stack(idxs, -1)

    t = timed_v(jax.jit(knn_topk), d2_vars)
    print(f"C top_k[262k,64]->8 : {(t-base)*1e3:7.1f} ms")
    t = timed_v(jax.jit(knn_iter), d2_vars)
    print(f"C iter argmin x8    : {(t-base)*1e3:7.1f} ms")

    # ---- D: flat cumsum+scatter vs per-ray onehot-matmul compaction --
    qs_vars = [jax.block_until_ready(
        jnp.where(jax.random.bernoulli(jax.random.PRNGKey(i), 0.02, (R, D)),
                  jax.random.randint(key, (R, D), 0, 200_000), -1))
        for i in range(4)]
    Mo = R * 8

    def compact_flat(qs):
        m = qs >= 0
        rank_d = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        keep = m & (rank_d <= 80)
        fm = keep.reshape(R * D)
        rank = jnp.cumsum(fm.astype(jnp.int32)) - 1
        dest = jnp.where(fm & (rank < Mo), rank, Mo)
        sel = jnp.zeros((Mo,), jnp.int32).at[dest].set(
            jnp.arange(R * D, dtype=jnp.int32), mode="drop")
        return sel

    B = 32

    def compact_onehot(qs):
        m = qs >= 0
        rank_d = jnp.cumsum(m.astype(jnp.int32), axis=-1)     # 1-based
        keep = m & (rank_d <= B)
        oh = (keep[:, :, None]
              & (rank_d[:, :, None] == jnp.arange(1, B + 1))).astype(
                  jnp.float32)
        dsel = jnp.einsum("rdb,d->rb", oh, jnp.arange(D, dtype=jnp.float32))
        cnt = jnp.minimum(rank_d[:, -1], B)
        return dsel.astype(jnp.int32), cnt

    t = timed_v(jax.jit(compact_flat), qs_vars)
    print(f"D flat cumsum+scat  : {(t-base)*1e3:7.1f} ms")
    t = timed_v(jax.jit(compact_onehot), qs_vars)
    print(f"D per-ray onehot B32: {(t-base)*1e3:7.1f} ms")

    # second-level compact on [R, B] domain
    cnt_vars = []
    for qs in qs_vars:
        _, c = jax.jit(compact_onehot)(qs)
        cnt_vars.append(jax.block_until_ready(c))

    def compact_lvl2(cnt):
        off = jnp.cumsum(cnt) - cnt                         # [R]
        slot = jax.lax.broadcasted_iota(jnp.int32, (R, B), 1)
        dest = jnp.where(slot < cnt[:, None], off[:, None] + slot, Mo)
        src = jnp.arange(R * B, dtype=jnp.int32).reshape(R, B)
        sel = jnp.zeros((Mo,), jnp.int32).at[dest].set(src, mode="drop")
        return sel

    t = timed_v(jax.jit(compact_lvl2), cnt_vars)
    print(f"D lvl2 scatter [R,B]: {(t-base)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
