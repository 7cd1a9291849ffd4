"""On-chip parity + timing of ops/select.py first_valid_cols vs the
lax.top_k expression, at bench scale ([65536, 180] / [65536, 64]).

Usage: python tools/probe_select.py [pallas|topk] [D]
One variant per process for timing trust (STATUS.md); the parity check
always runs (outputs only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf2studio_tpu.ops.select import (
    first_valid_cols, first_valid_cols_reference)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    R, BP = 65536, 32
    rng = np.random.default_rng(0)
    qs_vars = []
    for i in range(4):
        # run-structured validity like real rays: a few valid runs/row
        m = np.zeros((R, D), bool)
        starts = rng.integers(0, D - 8, (R, 2))
        lens = rng.integers(1, 12, (R, 2))
        for j in range(2):
            idx = np.minimum(starts[:, j, None] + np.arange(12)[None, :],
                             D - 1)
            keep = np.arange(12)[None, :] < lens[:, j, None]
            np.put_along_axis(m, np.where(keep, idx, 0), True, axis=1)
        qs = np.where(m, rng.integers(0, 1 << 20, (R, D)), -1)
        qs_vars.append(jnp.asarray(qs.astype(np.int32)))

    # parity on chip (outputs only)
    cs, cn = jax.jit(first_valid_cols, static_argnames=("BP",))(
        qs_vars[0], BP=BP)
    cr, cnr = jax.jit(first_valid_cols_reference,
                      static_argnames=("BP",))(qs_vars[0], BP=BP)
    cs, cn, cr, cnr = map(np.asarray, (cs, cn, cr, cnr))
    valid = np.arange(BP)[None, :] < np.minimum(cnr, BP)[:, None]
    ok = (np.array_equal(cs[valid], cr[valid])
          and np.array_equal(cn, cnr) and np.all(cs[~valid] >= D))
    print(f"parity D={D}: {'EXACT' if ok else 'DIFFERS'} "
          f"(cnt match {np.array_equal(cn, cnr)}, "
          f"sel mismatches {int((cs[valid] != cr[valid]).sum())})",
          flush=True)

    fn = first_valid_cols if which == "pallas" else first_valid_cols_reference
    f = jax.jit(lambda q: fn(q, BP))
    out = jax.block_until_ready(f(qs_vars[0]))
    t0 = time.perf_counter()
    n = 16
    for i in range(n):
        out = f(qs_vars[i % 4])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{which} D={D}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
