"""Round 2 microbenchmarks: fat-row gathers + Pallas VMEM gather."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

    # 1) few fat rows: candidate-cache style gathers (pass table as arg!)
    for G, W in ((131_072, 96 * 4), (131_072, 64 * 4), (32_768, 96 * 4),
                 (1_048_576, 44), (345_000, 44), (655_360, 1)):
        NR = 700_000
        tbl = jnp.asarray(rng.standard_normal((NR, W)).astype(np.float32))
        ridx = jnp.asarray(rng.integers(0, NR, G, dtype=np.int32))
        f = jax.jit(lambda t, i: t[i])
        t = timed(f, tbl, ridx, n=5)
        print(f"row gather [{G}x{W}w] f32: {t*1e3:.2f} ms "
              f"({G/t/1e6:.0f} Mrow/s, {G*W*4/t/1e9:.1f} GB/s)")

    # 2) sort costs at mask-compaction scale
    for n in (3_276_800, 655_360, 131_072):
        k = jnp.asarray(rng.integers(0, 2_000_000, n, dtype=np.int32))
        f = jax.jit(lambda x: jnp.sort(x))
        t = timed(f, k, n=5)
        print(f"sort int32 [{n}]: {t*1e3:.2f} ms")
        f2 = jax.jit(lambda x: jnp.argsort(x < 1_000_000, stable=True))
        t = timed(f2, k, n=5)
        print(f"argsort bool [{n}]: {t*1e3:.2f} ms")

    # 3) top_k(8) at query scale over 96 candidates
    d = jnp.asarray(rng.standard_normal((131_072, 96)).astype(np.float32))
    t = timed(jax.jit(lambda x: jax.lax.top_k(x, 8)[1]), d, n=5)
    print(f"top_k(8) over [131072, 96]: {t*1e3:.2f} ms")

    # 4) Pallas VMEM-table gather: table 2M int8 in VMEM, 3.3M lookups
    NV = 2_000_000
    NV_pad = 2 * 1024 * 1024
    M = 3_276_800
    table = jnp.asarray(
        rng.integers(0, 2, NV_pad, dtype=np.int32).astype(np.int8))
    idx = jnp.asarray(rng.integers(0, NV, M, dtype=np.int32))

    TILE = 64 * 1024

    def kern(tab_ref, idx_ref, out_ref):
        ids = idx_ref[:]                      # [TILE] int32
        out_ref[:] = tab_ref[ids]             # vector gather from VMEM

    @jax.jit
    def pallas_gather(table, idx):
        return pl.pallas_call(
            kern,
            grid=(M // TILE,),
            in_specs=[
                pl.BlockSpec((NV_pad,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M,), jnp.int8),
        )(table, idx)

    try:
        t = timed(pallas_gather, table, idx, n=5)
        print(f"pallas VMEM gather int8 [{M}] from [{NV_pad}]: {t*1e3:.2f} ms "
              f"({M/t/1e9:.2f} G/s)")
    except Exception as e:
        print("pallas VMEM gather failed:", str(e)[:500])


if __name__ == "__main__":
    main()
