"""Chained probe part 2: W=1 gathers, cand fat rows, bf16 packing,
take_along_axis vs one-hot. Tables passed as ARGS (closing over them
bakes constants into the remote-compile payload -> HTTP 413)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(fn, x0, *rest, n=8):
    x = jax.block_until_ready(fn(x0, *rest))
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x, *rest)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    base = timed_chain(jax.jit(lambda x: x + 1), jnp.zeros((8, 128)))
    print(f"chained dispatch baseline {base*1e3:.2f} ms")

    M, K, N = 262_144, 8, 700_000

    # ---- W=1 qslot-style flat gather, 5.9M indices ----
    R, D = 32768, 180
    G = 160 ** 3
    grid = jax.random.randint(key, (G,), -1, 200_000, jnp.int32)

    @jax.jit
    def stepq(idx, grid):
        out = grid[idx]
        return (idx + 1 + (out & 7)) % G

    idxq = jax.random.randint(key, (R, D), 0, G, jnp.int32)
    t = timed_chain(stepq, idxq, grid) - base
    print(f"flat W=1 x5.9M    : {t*1e3:7.1f} ms "
          f"{R*D/max(t,1e-9)/1e6:6.1f} Mrow/s")

    # fewer rows, same total bytes
    @jax.jit
    def stepq2(idx, grid):
        out = grid[idx]
        return (idx + 1 + (out & 7)) % G

    idxq2 = jax.random.randint(key, (R, 36), 0, G, jnp.int32)
    t = timed_chain(stepq2, idxq2, grid) - base
    print(f"flat W=1 x1.2M    : {t*1e3:7.1f} ms "
          f"{R*36/max(t,1e-9)/1e6:6.1f} Mrow/s")

    # ---- cand fat row gather [262k] rows x W ----
    Q = 300_000
    for W in [320, 640, 1536]:
        cand = jax.random.normal(key, (Q, W), jnp.float32)

        @jax.jit
        def stepc(idx, cand):
            out = cand[idx]
            bump = out[:, 0].astype(jnp.int32)
            return (idx + 1 + (bump & 7)) % Q

        idxc = jax.random.randint(key, (M,), 0, Q, jnp.int32)
        t = timed_chain(stepc, idxc, cand) - base
        print(f"cand gather W={W:>4}: {t*1e3:7.1f} ms "
              f"{M*W*4/max(t,1e-9)/1e9:6.1f} GB/s")

    # ---- take_along_axis vs one-hot matmul K-of-C select ----
    C = 64
    vals = jax.random.normal(key, (M, C), jnp.float32)

    @jax.jit
    def step_taa(sel, vals):
        out = jnp.take_along_axis(vals, sel, axis=-1)
        return (sel + 1 + (out[..., :1].astype(jnp.int32) & 3)) % C

    sel0 = jax.random.randint(key, (M, 8), 0, C, jnp.int32)
    t = timed_chain(step_taa, sel0, vals) - base
    print(f"take_along [M,64]->8 : {t*1e3:7.1f} ms")

    @jax.jit
    def step_oh(sel, vals):
        oh = (sel[..., None] == jnp.arange(C)).astype(jnp.bfloat16)
        out = jnp.einsum("mkc,mc->mk", oh, vals.astype(jnp.bfloat16))
        return (sel + 1 + (out[..., :1].astype(jnp.int32) & 3)) % C

    t = timed_chain(step_oh, sel0, vals) - base
    print(f"onehot mm [M,64]->8  : {t*1e3:7.1f} ms")

    # one-hot extract of FAT values [M, C, A] -> [M, K, A]
    A = 24
    vals3 = jax.random.normal(key, (M, C, A), jnp.bfloat16)

    @jax.jit
    def step_oh3(sel, vals3):
        oh = (sel[..., None] == jnp.arange(C)).astype(jnp.bfloat16)
        out = jnp.einsum("mkc,mca->mka", oh, vals3)
        return (sel + 1 + (out[..., 0, :1].astype(jnp.int32) & 3)) % C

    t = timed_chain(step_oh3, sel0, vals3) - base
    print(f"onehot mm [M,64,24]->[M,8,24]: {t*1e3:7.1f} ms")

    # ---- iterative argmin top-8 over [M, 64] (chained) ----
    @jax.jit
    def step_iter(d2, _):
        x = d2
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        s = jnp.zeros_like(d2[:, :1])
        for _i in range(8):
            am = jnp.argmin(x, axis=-1)
            s = s + am[:, None].astype(jnp.float32)
            x = jnp.where(col == am[:, None], jnp.inf, x)
        return d2 + s * 1e-9

    d2_0 = jax.random.uniform(key, (M, C))
    t = timed_chain(step_iter, d2_0, 0) - base
    print(f"iter argmin x8 [M,64]: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
