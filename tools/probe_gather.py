"""Micro-probe: 3-D advanced indexing vs flat 1-D gather for the
per-sample occupancy/qslot lookup (the largest stage-1 line)."""

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
    dims = (160, 160, 160)
    nvox = dims[0] * dims[1] * dims[2]
    rng = np.random.default_rng(0)
    grid3 = jnp.asarray(
        rng.integers(-1, 1000, dims).astype(np.int32))
    gridf = grid3.reshape(-1)
    R, D = 32768, 180
    gc = jnp.asarray(
        rng.integers(0, 160, (R, D, 3)).astype(np.int32))

    @jax.jit
    def idx3(grid3, gc):
        return grid3[gc[..., 0], gc[..., 1], gc[..., 2]]

    @jax.jit
    def idx1(gridf, gc):
        flat = (gc[..., 0] * (dims[1] * dims[2])
                + gc[..., 1] * dims[2] + gc[..., 2])
        return gridf[flat]

    @jax.jit
    def idx1_take(gridf, gc):
        flat = (gc[..., 0] * (dims[1] * dims[2])
                + gc[..., 1] * dims[2] + gc[..., 2])
        return jnp.take(gridf, flat, indices_are_sorted=False,
                        unique_indices=False)

    u8 = (grid3 >= 0).astype(jnp.uint8).reshape(-1)

    @jax.jit
    def idx1_u8(u8, gc):
        flat = (gc[..., 0] * (dims[1] * dims[2])
                + gc[..., 1] * dims[2] + gc[..., 2])
        return u8[flat]

    for name, fn, a in (("3-D indexing", idx3, grid3),
                        ("flat 1-D", idx1, gridf),
                        ("flat jnp.take", idx1_take, gridf),
                        ("flat uint8", idx1_u8, u8)):
        t = timed(fn, a, gc)
        chk = int(jnp.sum(fn(a, gc).astype(jnp.int64)))
        print(f"{name:>14s}: {t*1e3:7.3f} ms  chk={chk}")


if __name__ == "__main__":
    main()
