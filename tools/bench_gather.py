"""Microbenchmarks: TPU gather/scatter/sort primitive costs.

Informs the data-layout design of the query pipeline (scalar vs row
gathers, sort costs, dtype effects).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=10):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    print("platform:", jax.devices()[0].platform)

    NV = 2_000_000      # dense grid cells
    M = 3_276_800       # R*D scalar lookups (8192 rays x 400)
    occ8 = jnp.asarray(rng.integers(0, 2, NV, dtype=np.int8))
    occ32 = occ8.astype(jnp.int32)
    idx = jnp.asarray(rng.integers(0, NV, M, dtype=np.int32))

    t = timed(jax.jit(lambda i: occ32[i]), idx)
    print(f"scalar gather int32 [{M}] from [{NV}]: {t*1e3:.2f} ms "
          f"({M/t/1e9:.2f} G/s)")
    t = timed(jax.jit(lambda i: occ8[i]), idx)
    print(f"scalar gather int8  [{M}] from [{NV}]: {t*1e3:.2f} ms "
          f"({M/t/1e9:.2f} G/s)")

    # row gathers: [K rows of king width] from [700k, W]
    for W in (4, 16, 48, 128):
        NR = 700_000
        G = 3_500_000   # M*27 row gathers
        tbl = jnp.asarray(rng.standard_normal((NR, W)).astype(np.float32))
        ridx = jnp.asarray(rng.integers(0, NR, G, dtype=np.int32))
        t = timed(jax.jit(lambda i: tbl[i]), ridx, n=3)
        by = G * W * 4
        print(f"row gather [{G}x{W}] f32: {t*1e3:.2f} ms "
              f"({by/t/1e9:.1f} GB/s)")

    # attribute row gather at MLP scale: 1M rows of 44 floats
    NR, G, W = 700_000, 1_048_576, 44
    tbl = jnp.asarray(rng.standard_normal((NR, W)).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, NR, G, dtype=np.int32))
    t = timed(jax.jit(lambda i: tbl[i]), ridx)
    print(f"row gather [{G}x{W}] f32: {t*1e3:.2f} ms "
          f"({G*W*4/t/1e9:.1f} GB/s)")

    # argsort of a bool key, 655k
    for n in (655_360, 131_072):
        b = jnp.asarray(rng.integers(0, 2, n).astype(bool))
        t = timed(jax.jit(lambda x: jnp.argsort(~x, stable=True)), b)
        print(f"stable argsort bool [{n}]: {t*1e3:.2f} ms")

    # scatter 131k rows back into 655k
    src = jnp.asarray(rng.standard_normal((131_072,)).astype(np.float32))
    tgt_idx = jnp.asarray(rng.permutation(655_360)[:131_072].astype(np.int32))
    t = timed(jax.jit(
        lambda s, i: jnp.zeros((655_360,), jnp.float32).at[i].set(s)),
        src, tgt_idx)
    print(f"scatter-set 131k -> 655k: {t*1e3:.2f} ms")

    # top_k over 324 per row, 131k rows
    d = jnp.asarray(rng.standard_normal((131_072, 324)).astype(np.float32))
    t = timed(jax.jit(lambda x: jax.lax.top_k(x, 8)[1]), d, n=3)
    print(f"top_k(8) over [131072, 324]: {t*1e3:.2f} ms")

    # the big MLP GEMM at exact-compacted scale (bf16)
    a = jnp.asarray(rng.standard_normal((65_536 * 8, 284)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((284, 256)).astype(np.float32)).astype(jnp.bfloat16)
    t = timed(jax.jit(lambda a, w: a @ w), a, w, n=10)
    fl = 2 * a.shape[0] * 284 * 256
    print(f"GEMM [{a.shape[0]}x284x256] bf16: {t*1e3:.2f} ms "
          f"({fl/t/1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
