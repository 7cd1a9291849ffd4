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
