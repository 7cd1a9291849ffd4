"""Probe with forced data dependence: call i+1's input depends on call
i's output, so no execution cache / pipelining artifact can fake times.

Resolves the contradiction between probe_gather3 (gathers ~free) and
probe_fusion (attr gather 32ms): alignment? caching? fusion?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(fn, x0, n=8):
    """fn: x -> x (same shape/dtype). Chains calls; returns s/call."""
    x = jax.block_until_ready(fn(x0))      # compile + 1 run
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    N = 700_000

    base = timed_chain(jax.jit(lambda x: x + 1), jnp.zeros((8, 128)))
    print(f"chained dispatch baseline {base*1e3:.2f} ms")

    # ---- attr-style gather [M, K] rows, vary row width ----
    M, K = 262_144, 8
    for W in [39, 40, 48, 64, 128]:
        tab = jax.random.normal(key, (N, W), jnp.float32)

        @jax.jit
        def step(idx, tab=tab, W=W):
            out = tab[idx]                              # [M, K, W]
            bump = out[..., 0].astype(jnp.int32)        # depends on gather
            return (idx + 1 + (bump & 7)) % N

        idx0 = jax.random.randint(key, (M, K), 0, N, jnp.int32)
        t = timed_chain(step, idx0) - base
        el = M * K * W
        print(f"attr gather W={W:>3}: {t*1e3:7.1f} ms "
              f"{el/max(t,1e-9)/1e9:6.2f} Gelem/s")

    # ---- W=1 qslot-style flat gather, 5.9M indices ----
    R, D = 32768, 180
    G = 160 ** 3
    grid = jax.random.randint(key, (G,), -1, 200_000, jnp.int32)

    @jax.jit
    def stepq(idx):
        out = grid[idx]                                 # [R, D]
        return (idx + 1 + (out & 7)) % G

    idxq = jax.random.randint(key, (R, D), 0, G, jnp.int32)
    t = timed_chain(stepq, idxq) - base
    print(f"flat W=1 x5.9M    : {t*1e3:7.1f} ms "
          f"{R*D/max(t,1e-9)/1e6:6.1f} Melem/s")

    # same but 3-D index form
    grid3 = grid.reshape(160, 160, 160)

    @jax.jit
    def stepq3(idx):
        i0 = idx // (160 * 160)
        i1 = (idx // 160) % 160
        i2 = idx % 160
        out = grid3[i0, i1, i2]
        return (idx + 1 + (out & 7)) % G

    t = timed_chain(stepq3, idxq) - base
    print(f"3d  W=1 x5.9M     : {t*1e3:7.1f} ms")

    # ---- cand-style fat row gather [M] rows of W=320 ----
    Q = 1_000_000
    for W in [320, 384]:
        cand = jax.random.normal(key, (Q, W), jnp.float32)

        @jax.jit
        def stepc(idx, cand=cand, W=W):
            out = cand[idx]                             # [M, W]
            bump = out[:, 0].astype(jnp.int32)
            return (idx + 1 + (bump & 7)) % Q

        idxc = jax.random.randint(key, (M,), 0, Q, jnp.int32)
        t = timed_chain(stepc, idxc) - base
        print(f"cand gather W={W}: {t*1e3:7.1f} ms "
              f"{M*W/max(t,1e-9)/1e9:6.2f} Gelem/s "
              f"{M*W*4/max(t,1e-9)/1e9:6.1f} GB/s")

    # ---- bf16-packed attr gather: 40 cols f32 holding 80 bf16 ----
    tabp = jax.random.normal(key, (N, 40), jnp.float32)

    @jax.jit
    def stepp(idx):
        out = tabp[idx]                                 # [M, K, 40]
        pairs = jax.lax.bitcast_convert_type(out, jnp.bfloat16)  # [M,K,40,2]
        bump = pairs[..., 0, 0].astype(jnp.int32)
        return (idx + 1 + (bump & 7)) % N

    idx0 = jax.random.randint(key, (M, K), 0, N, jnp.int32)
    t = timed_chain(stepp, idx0) - base
    print(f"bf16-in-f32 W=40(80): {t*1e3:7.1f} ms "
          f"(vs W=80 f32 equivalent)")

    # ---- one-hot-matmul K-of-C select (replaces take_along_axis) ----
    C = 64
    vals = jax.random.normal(key, (M, C), jnp.float32)

    @jax.jit
    def step_taa(sel):
        out = jnp.take_along_axis(vals, sel, axis=-1)   # [M, 8]
        return (sel + 1 + (out[..., :1].astype(jnp.int32) & 3)) % C

    sel0 = jax.random.randint(key, (M, 8), 0, C, jnp.int32)
    t = timed_chain(step_taa, sel0) - base
    print(f"take_along [M,64]->8: {t*1e3:7.1f} ms")

    @jax.jit
    def step_oh(sel):
        oh = (sel[..., None] == jnp.arange(C)).astype(jnp.bfloat16)  # [M,8,C]
        out = jnp.einsum("mkc,mc->mk", oh, vals.astype(jnp.bfloat16))
        return (sel + 1 + (out[..., :1].astype(jnp.int32) & 3)) % C

    t = timed_chain(step_oh, sel0) - base
    print(f"onehot mm [M,64]->8 : {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
