"""Micro-probe: lane-axis cumsum vs MXU triangular-matmul cumsum."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    R, D = 32768, 180
    m = jnp.asarray(rng.random((R, D)) < 0.05)

    @jax.jit
    def lane_cumsum(m):
        return jnp.cumsum(m.astype(jnp.int32), axis=-1)

    tri = jnp.asarray(np.tril(np.ones((D, D), np.float32)))

    @jax.jit
    def mxu_cumsum(m):
        return (m.astype(jnp.float32) @ tri.T).astype(jnp.int32)

    flat = m.reshape(-1)

    @jax.jit
    def flat_cumsum(flat):
        return jnp.cumsum(flat.astype(jnp.int32))

    W = 512
    triW = jnp.asarray(np.tril(np.ones((W, W), np.float32)))

    @jax.jit
    def flat_mxu(flat):
        n = flat.shape[0] // W
        x = flat.reshape(n, W).astype(jnp.float32)
        within = x @ triW.T                        # [n, W] inclusive
        row_tot = within[:, -1]
        offs = jnp.cumsum(row_tot) - row_tot       # [n] (small cumsum)
        return (within + offs[:, None]).astype(jnp.int32).reshape(-1)

    t1 = timed(lane_cumsum, m)
    t2 = timed(mxu_cumsum, m)
    a = np.asarray(lane_cumsum(m))
    b = np.asarray(mxu_cumsum(m))
    print(f"lane cumsum [R,180]: {t1*1e3:7.2f} ms")
    print(f"MXU  cumsum [R,180]: {t2*1e3:7.2f} ms  match={np.array_equal(a, b)}")
    t3 = timed(flat_cumsum, flat)
    t4 = timed(flat_mxu, flat)
    c = np.asarray(flat_cumsum(flat))
    d = np.asarray(flat_mxu(flat))
    print(f"flat cumsum 5.9M:    {t3*1e3:7.2f} ms")
    print(f"flat MXU 2-level:    {t4*1e3:7.2f} ms  match={np.array_equal(c, d)}")


if __name__ == "__main__":
    main()
