#!/bin/bash
# Wait for the axon TPU pool to accept a claim (it can be UNAVAILABLE
# under tenant contention), then run the probe queue. ONE TPU process
# at a time (STATUS.md rule) — the claim probe and the queue never
# overlap.
# Usage: tools/wait_tpu_then_queue.sh <logfile> <item>...
log=$1; shift
for i in $(seq 1 60); do
  echo "==== tpu claim attempt $i $(date +%H:%M:%S)" >> "$log"
  if timeout 1750 python -c "
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
print('claim ok', float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))), flush=True)
" >> "$log" 2>&1; then
    echo "==== tpu up $(date +%H:%M:%S)" >> "$log"
    exec bash "$(dirname "$0")/run_probe_queue.sh" "$log" "$@"
  fi
  sleep 120
done
echo "==== gave up waiting for tpu $(date +%H:%M:%S)" >> "$log"
