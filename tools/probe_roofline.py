"""Roofline calibration for this v5e chip through the axon tunnel:
achievable HBM bandwidth, elementwise rate, matmul FLOPs, cumsum rate —
honest varied-input timing. Anchors every other perf judgment.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_v(fn, variants, n=8):
    out = jax.block_until_ready(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    base = timed_v(jax.jit(lambda x: x + 1),
                   [(jnp.zeros((8, 128)) + i,) for i in range(4)])
    print(f"dispatch {base*1e3:.2f} ms")

    # elementwise: read+write 1 GB
    N = 268_435_456 // 2  # 134M f32 = 537 MB
    xs = [jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(i), (N,))) for i in range(4)]
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    t = timed_v(f, [(x,) for x in xs]) - base
    print(f"elementwise 537MB->537MB: {t*1e3:6.1f} ms "
          f"{2*N*4/t/1e9:6.0f} GB/s")

    # matmul bf16: [8192, 8192] @ [8192, 8192]
    A = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(i), (8192, 8192), jnp.bfloat16))
        for i in range(4)]
    B = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(9), (8192, 8192), jnp.bfloat16))
    fm = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
    t = timed_v(fm, [(a, B) for a in A]) - base
    fl = 2 * 8192 ** 3
    print(f"matmul bf16 8192^3:       {t*1e3:6.1f} ms {fl/t/1e12:6.1f} TFLOP/s")

    fm32 = jax.jit(lambda a, b: a.astype(jnp.float32) @ b.astype(jnp.float32))
    t = timed_v(fm32, [(a, B) for a in A]) - base
    print(f"matmul f32  8192^3:       {t*1e3:6.1f} ms {fl/t/1e12:6.1f} TFLOP/s")

    # skinny matmul like the MLP: [2.1M, 284] @ [284, 256] bf16
    Msk = 2_097_152
    X = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(i), (Msk, 284), jnp.bfloat16)) for i in range(4)]
    W = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(7), (284, 256), jnp.bfloat16))
    fs = jax.jit(lambda x, w: jax.nn.leaky_relu(x @ w, 0.1))
    t = timed_v(fs, [(x, W) for x in X]) - base
    fl = 2 * Msk * 284 * 256
    bytes_ = Msk * (284 + 256) * 2
    print(f"skinny mm [2.1M,284]x256: {t*1e3:6.1f} ms {fl/t/1e12:6.1f} TF/s "
          f"{bytes_/t/1e9:6.0f} GB/s")

    # [R, D] minor-axis cumsum int32
    R, D = 32768, 180
    ms = [jax.block_until_ready(jax.random.randint(
        jax.random.PRNGKey(i), (R, D), 0, 2)) for i in range(4)]
    fc = jax.jit(lambda m: jnp.cumsum(m, axis=-1))
    t = timed_v(fc, [(m,) for m in ms]) - base
    print(f"cumsum [32k,180] minor:   {t*1e3:6.1f} ms")

    # transcendentals: sin of 806M bf16
    S = [jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(i), (Msk, 192), jnp.bfloat16)) for i in range(4)]
    ft = jax.jit(lambda x: jnp.sin(x))
    t = timed_v(ft, [(s,) for s in S]) - base
    print(f"sin [2.1M,192] bf16:      {t*1e3:6.1f} ms "
          f"{Msk*192/t/1e9:5.1f} Gtranscendental/s")


if __name__ == "__main__":
    main()
