"""Probe: what bounds XLA TPU gathers — rows, elements, or bytes?

Hypothesis from profile_render2: gathers run at a fixed element rate
(~1.5 G elem/s) regardless of row width. If true, packing bf16 pairs
into f32 lanes halves gather time; if bytes-bound, dtype shrink helps
directly; if row-bound, fattening rows is free.

Also probes: scatter/cumsum domain-size scaling, one-hot matmul
selection, and a Pallas per-row DMA gather at several row widths.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=5):
    """Vary the first arg across calls — the axon remote backend caches
    identical (executable, args) executions, so fixed-arg loops time ~0."""
    variants = [jax.block_until_ready(
        jnp.roll(args[0], i + 1, axis=0)) for i in range(n)]
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(variants[i], *args[1:])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    N = 700_000
    base = timed(jax.jit(lambda x: x + 1), jnp.zeros(8))
    print(f"dispatch baseline {base*1e3:.2f} ms")

    print("\n-- XLA gather: table [700k, W] f32, M rows --")
    for M, W in [(2_097_152, 8), (2_097_152, 20), (2_097_152, 40),
                 (262_144, 40), (262_144, 160), (262_144, 320),
                 (5_898_240, 1), (5_898_240, 4)]:
        tab = jax.random.normal(key, (N, W), jnp.float32)
        idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt = timed(f, tab, idx) - base
        el = M * W
        print(f"M={M:>9,} W={W:>4} f32: {dt*1e3:7.1f} ms "
              f"{el/dt/1e9:6.2f} Gelem/s {el*4/dt/1e9:7.1f} GB/s")

    print("\n-- dtype effect: same M,W in bf16 / int8 --")
    M, W = 2_097_152, 40
    idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
    for dt_ in [jnp.float32, jnp.bfloat16, jnp.int8]:
        tab = jnp.zeros((N, W), dt_)
        f = jax.jit(lambda t, i: t[i])
        d = timed(f, tab, idx) - base
        print(f"dtype {dt_.__name__:>8}: {d*1e3:7.1f} ms "
              f"{M*W/d/1e9:6.2f} Gelem/s")

    print("\n-- 2D-index gather (idx [M,K] -> [M,K,W]) vs flat --")
    Mk, K, W = 262_144, 8, 40
    tab = jax.random.normal(key, (N, W), jnp.float32)
    idx2 = jax.random.randint(key, (Mk, K), 0, N, jnp.int32)
    f2 = jax.jit(lambda t, i: t[i])
    d = timed(f2, tab, idx2) - base
    print(f"[M,K] idx: {d*1e3:7.1f} ms {Mk*K*W/d/1e9:6.2f} Gelem/s")

    print("\n-- scatter .at[dest].set + cumsum vs domain size --")
    for dom in [1_048_576, 5_898_240]:
        m = jax.random.bernoulli(key, 0.02, (dom,))
        Mo = 262_144

        def compact(mask):
            r = jnp.cumsum(mask.astype(jnp.int32)) - 1
            dest = jnp.where(mask & (r < Mo), r, Mo)
            return jnp.zeros((Mo,), jnp.int32).at[dest].set(
                jnp.arange(dom, dtype=jnp.int32), mode="drop")

        d = timed(jax.jit(compact), m) - base
        print(f"dom={dom:>9,}: cumsum+scatter {d*1e3:7.1f} ms")
        d = timed(jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32))), m) - base
        print(f"dom={dom:>9,}: cumsum only    {d*1e3:7.1f} ms")

    print("\n-- per-ray one-hot matmul selection [R,D]->[R,B] --")
    R, D, B = 32_768, 180, 32
    mask = jax.random.bernoulli(key, 0.1, (R, D))

    def sel_onehot(mask):
        rank = jnp.cumsum(mask.astype(jnp.int32), -1)          # 1-based
        oh = (mask[:, :, None]
              & (rank[:, :, None] == jnp.arange(1, B + 1)[None, None, :]))
        ohf = oh.astype(jnp.bfloat16)
        dsel = jnp.einsum("rdb,d->rb", ohf,
                          jnp.arange(D, dtype=jnp.bfloat16))
        return dsel.astype(jnp.int32)

    d = timed(jax.jit(sel_onehot), mask) - base
    print(f"onehot matmul sel: {d*1e3:7.1f} ms")

    def sel_topk(mask):
        key_ = jnp.where(mask, jnp.arange(D, dtype=jnp.int32), D)
        nt, ds = jax.lax.top_k(-key_, B)
        return ds

    d = timed(jax.jit(sel_topk), mask) - base
    print(f"top_k sel:         {d*1e3:7.1f} ms")

    print("\n-- Pallas per-row DMA gather --")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Rows stored as aligned (r, 128) f32 tiles: [N, r, 128] — Mosaic
    # requires HBM slices aligned to the (8, 128) tiling, so r % 8 == 0
    # and the minimum DMA-gatherable f32 row is 4 KB.
    def make_dma_gather(r, T=128):
        def kernel(idx_ref, tab_hbm, out_ref, scratch, sems):
            t = pl.program_id(0)

            def start(i):
                return pltpu.make_async_copy(
                    tab_hbm.at[idx_ref[t * T + i]], scratch.at[i],
                    sems.at[i])

            def body(i, _):
                start(i).start()
                return 0

            jax.lax.fori_loop(0, T, body, 0)

            def wbody(i, _):
                start(i).wait()
                return 0

            jax.lax.fori_loop(0, T, wbody, 0)
            out_ref[:] = scratch[:]

        def run(tab, idx):
            M = idx.shape[0]
            grid = M // T
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(grid,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec(
                        (T, r, 128), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((T, r, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((T,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((M, r, 128), jnp.float32),
            )(idx, tab)

        return jax.jit(run)

    for M, r in [(262_144, 8), (262_144, 16), (65_536, 32)]:
        tab = jax.random.normal(key, (N, r, 128), jnp.float32)
        idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
        try:
            f = make_dma_gather(r)
            d = timed(f, tab, idx) - base
            bytes_ = M * r * 128 * 4
            print(f"DMA M={M:>9,} row={r}x128 ({r*128*4}B): {d*1e3:7.1f} ms "
                  f"{M/d/1e6:6.2f} Mrow/s {bytes_/d/1e9:7.1f} GB/s")
        except Exception as e:
            print(f"DMA M={M} r={r}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
