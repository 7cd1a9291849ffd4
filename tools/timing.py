"""Fetch-forced timing for the axon remote backend.

`jax.block_until_ready()` does NOT reliably block on this backend:
tools/probe_backend_semantics.py regimes A-C read ~0 ms per call for a
program whose FLOP count implies ~17 ms, even with fresh random inputs
and a per-call block. Multi-call block-at-end loops (old probe pattern)
only read roughly real numbers because of dispatch-queue backpressure —
fragile and occasionally phantom (chair:tkpc read 0.1 ms in round 3).

The trustworthy recipe:
  1. the timed jitted fn returns a SCALAR reduction of its real output
     (fold the reduce into the program — a sum is free next to the
     render itself);
  2. every timed call gets a DISTINCT input buffer (defeats any
     (program, args) result memoization);
  3. ONE host fetch at the end of the stacked per-call scalars — the
     fetch transitively depends on every call, so the wall clock
     brackets all n executions regardless of what block_until_ready
     does.
"""

import time

import jax
import jax.numpy as jnp


_SENTINEL_SALT = [0]  # per-invocation buffer salt (see below)


def congestion_sentinel(n_calls: int = 8):
    """Time a FIXED small program to price this measurement window.

    The chip/tunnel has multi-hour congestion periods that inflate
    end-to-end times up to ~9x (r3e: tkpcmcmrbm read 159.1 ms at 18:06
    and 1401.7 ms at 20:44 SAME DAY, equivalent program; the ~1400 ms
    cluster previously misread as a config-dependent "explosion
    regime"). Every probe must report this sentinel so cross-window
    comparisons can be rejected. Clean-window reference: record the
    value printed alongside a known-clean measurement and compare
    ratios, not absolutes.
    """
    import numpy as np

    @jax.jit
    def f(a):
        for _ in range(8):
            a = jnp.tanh(a @ a) * 0.1
        return a.sum()

    # Salt the input seeds per invocation: a SECOND sentinel call in the
    # same process must not re-submit identical (program, args) pairs,
    # or result memoization returns a phantom ~0 ms reading (rule 2 of
    # the module docstring; BENCH_r03 recorded sentinel[post]=3.9 ms
    # from exactly this).
    _SENTINEL_SALT[0] += 1
    base = _SENTINEL_SALT[0] * 100_003
    xs = [jnp.asarray(np.random.default_rng(base + i)
                      .standard_normal((2048, 2048)).astype(np.float32))
          for i in range(n_calls + 1)]
    dt, _ = timed_scalar_calls(f, xs[:-1], warmup_input=xs[-1])
    return dt * 1000.0


def timed_scalar_calls(f, inputs, warmup_input=None):
    """Time len(inputs) calls of `f` (each must return a scalar array).

    Returns (seconds_per_call, total) where total is the float sum of
    the per-call scalars (fetched once, at the end, inside the timed
    window). Pass a distinct `warmup_input` to compile+run once before
    timing.
    """
    if warmup_input is not None:
        float(jax.device_get(f(warmup_input)))
    t0 = time.perf_counter()
    accs = [f(x) for x in inputs]
    tot = float(jax.device_get(
        jnp.stack([a.astype(jnp.float32) for a in accs]).sum()))
    dt = (time.perf_counter() - t0) / len(inputs)
    return dt, tot
