"""Diagnose the axon remote backend's execution semantics.

Round-3 observation: probe_bench_variants chair:tkpc reported 0.1 ms
for a render step that measured 183 ms in round 2 — block-at-end
timing over repeated inputs now reads as if executions were elided.
This probe times a compute-heavy matmul chain under different input
regimes to pin down WHAT the backend caches:

  A) per-call block, fresh random inputs each call
  B) per-call block, the exact same device buffer each call
  C) per-call block, same values copied to fresh buffers each call
  D) block-at-end over 4 distinct buffers reused cyclically x2 (the
     old probe pattern)
  E) block-at-end with a data-dependency chain (out feeds next input)
"""

import time

import jax
import jax.numpy as jnp

N = 4096
STEPS = 24   # ~24 x 2 x 4096^3 flops ~ 3.3 TFLOP -> ~17 ms at 197 bf16 TFLOPs


@jax.jit
def f(x):
    def body(c, _):
        c = c @ c
        c = c / jnp.linalg.norm(c)
        return c, ()
    y, _ = jax.lax.scan(body, x, None, length=STEPS)
    return y


def fresh(i):
    return jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(i), (N, N), jnp.bfloat16))


def main():
    print(jax.devices(), flush=True)
    x0 = fresh(0)
    t0 = time.perf_counter()
    jax.block_until_ready(f(x0))
    print(f"warmup (compile+run): {time.perf_counter()-t0:.2f}s",
          flush=True)

    # A: fresh inputs, per-call block
    for i in range(1, 4):
        x = fresh(i)
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        print(f"A fresh-input call {i}: {(time.perf_counter()-t0)*1e3:8.1f} ms",
              flush=True)

    # B: same buffer, per-call block
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0))
        print(f"B same-buffer call {i}: {(time.perf_counter()-t0)*1e3:8.1f} ms",
              flush=True)

    # C: same values, fresh buffer
    import numpy as np
    host = np.asarray(x0)
    for i in range(3):
        xc = jax.block_until_ready(jnp.asarray(host))
        t0 = time.perf_counter()
        jax.block_until_ready(f(xc))
        print(f"C same-value-fresh-buffer {i}: {(time.perf_counter()-t0)*1e3:8.1f} ms",
              flush=True)

    # D: old probe pattern — 4 distinct buffers cycled twice, block at end
    xs = [fresh(10 + i) for i in range(4)]
    for x in xs:
        jax.block_until_ready(f(x))          # warm each
    t0 = time.perf_counter()
    out = None
    for i in range(8):
        out = f(xs[i % 4])
    jax.block_until_ready(out)
    print(f"D block-at-end 8 calls: {(time.perf_counter()-t0)/8*1e3:8.1f} ms/call",
          flush=True)

    # E: dependency chain, block at end
    t0 = time.perf_counter()
    y = xs[0]
    for i in range(8):
        y = f(y)
    jax.block_until_ready(y)
    print(f"E chained 8 calls:     {(time.perf_counter()-t0)/8*1e3:8.1f} ms/call",
          flush=True)

    # F: per-call scalar host fetch (forces materialization each call)
    for i in range(3):
        t0 = time.perf_counter()
        s = float(f(xs[i]).sum())
        print(f"F fetch-per-call {i}:  {(time.perf_counter()-t0)*1e3:8.1f} ms"
              f"  (s={s:.3f})", flush=True)

    # G: 8 calls, accumulate per-call sums, ONE host fetch at the end —
    # the candidate timing harness for all probes/bench
    t0 = time.perf_counter()
    accs = []
    for i in range(8):
        accs.append(f(xs[i % 4]).sum())
    tot = float(jnp.stack(accs).sum())
    print(f"G fetch-at-end 8 calls:{(time.perf_counter()-t0)/8*1e3:8.1f} ms/call"
          f"  (tot={tot:.3f})", flush=True)

    # H: fetch overhead calibration — trivial program + fetch
    @jax.jit
    def h(x):
        return x[0, 0]
    float(h(xs[0]))
    for i in range(3):
        t0 = time.perf_counter()
        float(h(xs[i]))
        print(f"H null+fetch {i}:      {(time.perf_counter()-t0)*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
