"""Price the primitives of a sort-based tile-binning rasterization
front-end on this chip (PERF.md parked analysis; VERDICT r3 next-step
#1). The raster design's per-frame cost is dominated by:

  sort   — bin (tile, depth-bucket, voxel) keys: one sort_key_val over
           N = n_q x footprint keys (chair n_q ~ 150-250k, conservative
           footprint 5x5 px x 4 depth samples -> N ~ 15-50M; with
           per-voxel candidate pre-compaction N ~ 1.5-4M).
  scatter — emit accepted (ray, d, qslot) rows into per-ray slot lists:
           one .at[].set of N rows (TPU scatter cost scales with INPUT
           rows, PERF.md round-2 measurements).
  gather — the verify pass: one [N]-row table gather (same 7 ns/row
           rate as the front-end being replaced).

The march front-end this would replace costs ~2.1M gather rows
(~15 ms) + the rank_gather_pack (~10 ms) at bench chair geometry.
If sort(N) alone exceeds that at the N the footprint math demands,
the raster front-end is refuted BY MEASUREMENT on this hardware.

Usage: python tools/probe_sort_bin.py {sort1m|sort4m|sort16m|
    scatter1m|scatter4m|scatter16m|gather4m|gather16m|topk16m}
One micro per process (phantom-timing rules, STATUS.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.timing import congestion_sentinel, timed_scalar_calls

SIZES = {"1m": 1 << 20, "4m": 1 << 22, "16m": 1 << 24}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sort4m"
    kind = which.rstrip("m0123456789")
    n = SIZES[which[len(kind):] + ("m" if not which.endswith("m") else "")]

    rngs = [np.random.default_rng(1000 + i) for i in range(9)]

    if kind == "sort":
        # keys: packed (tile<<20 | depth<<10 | lane) uint32-like int32;
        # payload: the voxel qslot riding along
        keys = [jnp.asarray(r.integers(0, 1 << 30, n, dtype=np.int32))
                for r in rngs]
        vals = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def f(k):
            ks, vs = jax.lax.sort_key_val(k, vals)
            return (ks[::4096].astype(jnp.float32).sum()
                    + vs[::4096].astype(jnp.float32).sum())

        label = f"sort_key_val[{n}]"
        xs = keys
    elif kind == "scatter":
        # N rows scattered into a 2M-slot table (the emit write)
        dest_sz = 1 << 21
        xs = [jnp.asarray(r.integers(0, dest_sz, n, dtype=np.int32))
              for r in rngs]
        payload = jnp.ones((n,), jnp.float32)

        @jax.jit
        def f(d):
            out = jnp.zeros((dest_sz,), jnp.float32).at[d].add(
                payload, mode="drop")
            return out[::1024].sum()

        label = f"scatter_add[{n} rows]"
    elif kind == "gather":
        # N-row table gather (the verify pass / the cost being replaced)
        tab = jnp.asarray(
            np.random.default_rng(7).integers(
                -1, 100, 1 << 24, dtype=np.int32))
        xs = [jnp.asarray(r.integers(0, 1 << 24, n, dtype=np.int32))
              for r in rngs]

        @jax.jit
        def f(i):
            return tab[i].astype(jnp.float32)[::1024].sum()

        label = f"table_gather[{n} rows]"
    elif kind == "topk":
        # per-row top_k over a [n/64, 64] candidate field (the
        # per-voxel pre-compaction the parked analysis needs)
        rows = n // 64
        xs = [jnp.asarray(r.standard_normal((rows, 64), np.float32))
              for r in rngs]

        @jax.jit
        def f(a):
            v, i = jax.lax.top_k(a, 8)
            return v.sum() + i.astype(jnp.float32)[::512].sum()

        label = f"top_k8[{rows}x64]"
    else:
        raise SystemExit(f"unknown micro {which}")

    s_pre = congestion_sentinel()
    dt, tot = timed_scalar_calls(f, xs[:8], warmup_input=xs[8])
    s_post = congestion_sentinel()
    print(f"{label:26}: {dt * 1e3:8.2f} ms = {dt / n * 1e9:6.2f} ns/row"
          f"  (sum {tot:.1f}; sentinel {s_pre:.1f}/{s_post:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
