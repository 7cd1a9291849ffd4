#!/bin/bash
# Chain a SECOND probe queue after the currently-running one finishes
# (run_probe_queue.sh reads its item list once at startup, so editing
# queue_extra.txt mid-run has no effect — this watcher is how late
# additions actually get to the chip while keeping the one-TPU-process
# invariant).
# Usage: tools/wait_queue_then_run.sh <prev_log> <new_log> <items_file>
prev=$1; log=$2; items_file=$3
for i in $(seq 1 720); do
  if grep -q "==== queue done" "$prev" 2>/dev/null; then
    # the item file REPLACES queue_override.txt for the new run
    cp "$items_file" "$(dirname "$0")/queue_override.txt"
    exec bash "$(dirname "$0")/run_probe_queue.sh" "$log"
  fi
  sleep 60
done
echo "==== gave up waiting for previous queue" >> "$log"
