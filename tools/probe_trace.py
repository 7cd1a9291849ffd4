"""Does jax.profiler device tracing work on the axon remote backend?

Traces a recognizable compute pattern, then inspects the trace dir:
if .xplane.pb files materialize with nontrivial size, op-level device
attribution is available and all future stage-attribution probes can
be replaced by ONE traced render (huge chip-time saver). If only host
lanes appear (or nothing), record that and keep using the fetch-forced
ablation methodology.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = "/tmp/jaxtrace_probe"


def main():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4096, 4096)).astype(np.float32))

    @jax.jit
    def f(a):
        for _ in range(8):
            a = jnp.tanh(a @ a) * 0.1
        return a.sum()

    float(jax.device_get(f(x)))                    # compile outside
    os.makedirs(OUT, exist_ok=True)
    try:
        jax.profiler.start_trace(OUT)
        acc = [f(x * (1.0 + i)) for i in range(4)]
        print("traced sum", float(jax.device_get(
            jnp.stack(acc).sum())), flush=True)
        jax.profiler.stop_trace()
    except Exception as e:
        print(f"TRACE FAILED: {type(e).__name__}: {e}", flush=True)
        return
    files = sorted(glob.glob(OUT + "/**/*", recursive=True))
    total = 0
    for p in files:
        if os.path.isfile(p):
            sz = os.path.getsize(p)
            total += sz
            print(f"  {sz:>10} {p.split(OUT)[-1]}", flush=True)
    xplanes = [p for p in files if p.endswith(".xplane.pb")]
    big = [p for p in xplanes if os.path.getsize(p) > 20_000]
    print(f"trace files: {len(files)}, xplane: {len(xplanes)}, "
          f"total {total} B -> "
          + ("DEVICE TRACE LIKELY (inspect lanes)" if big else
         "host-only/empty — keep fetch-forced probes"), flush=True)


if __name__ == "__main__":
    main()
