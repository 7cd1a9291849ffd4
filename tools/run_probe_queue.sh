#!/bin/bash
# Sequential TPU probe queue (ONE process at a time — STATUS.md rule).
# Usage: tools/run_probe_queue.sh <logfile> <item>...
# item = variant key (e2e timing), "check:<key>" (exactness), or
#        "stage:<name>" (probe_topk_pack stage).
log=$1; shift
# Items can be edited while the queue waits for a TPU claim (the
# watcher exec's this script only once a claim lands):
#  - tools/queue_override.txt, if present, REPLACES the argv items
#    (full reorder control at claim time);
#  - tools/queue_extra.txt items are appended either way.
items="$*"
if [ -f "$(dirname "$0")/queue_override.txt" ]; then
  items=$(grep -v '^#' "$(dirname "$0")/queue_override.txt" | tr '\n' ' ')
  echo "==== queue_override.txt in effect" >> "$log"
fi
extra=""
if [ -f "$(dirname "$0")/queue_extra.txt" ]; then
  extra=$(grep -v '^#' "$(dirname "$0")/queue_extra.txt" | tr '\n' ' ')
fi
for it in $items $extra; do
  echo "==== $it $(date +%H:%M:%S)" >> "$log"
  case "$it" in
    check:*) timeout 1800 python tools/check_variant_exact.py "${it#check:}" >> "$log" 2>&1 ;;
    chaircheck:*) PROBE_SCENE=chair timeout 2400 python tools/check_variant_exact.py "${it#chaircheck:}" >> "$log" 2>&1 ;;
    stage:*) timeout 1500 python tools/probe_topk_pack.py "${it#stage:}" >> "$log" 2>&1 ;;
    chunks:*) timeout 1800 python tools/probe_chunks.py "${it#chunks:}" >> "$log" 2>&1 ;;
    stages:*) timeout 5400 python tools/probe_chunk_stages.py "${it#stages:}" >> "$log" 2>&1 ;;
    chair:*) PROBE_SCENE=chair timeout 1800 python tools/probe_bench_variants.py "${it#chair:}" >> "$log" 2>&1 ;;
    chair7:*) PROBE_SCENE=chair PROBE_MARCH_STAGES=7 timeout 1800 python tools/probe_bench_variants.py "${it#chair7:}" >> "$log" 2>&1 ;;
    chairsh:*) PROBE_SCENE=chair PROBE_RAYS=shuffle timeout 1800 python tools/probe_bench_variants.py "${it#chairsh:}" >> "$log" 2>&1 ;;
    micro:*) timeout 1200 python tools/probe_microops.py "${it#micro:}" >> "$log" 2>&1 ;;
    py:*)    timeout 1800 python "${it#py:}" >> "$log" 2>&1 ;;
    pyc:*)   a="${it#pyc:}"; timeout 2400 python ${a//,/ } >> "$log" 2>&1 ;;
    train:*) a="${it#train:}"; timeout 1800 python tools/bench_train_fast.py ${a//,/ } >> "$log" 2>&1 ;;
    bench)   timeout 2400 python bench.py >> "$log" 2>&1 ;;
    benchenv:*) a="${it#benchenv:}"; env ${a//,/ } timeout 2400 python bench.py >> "$log" 2>&1 ;;
    validate:*) a="${it#validate:}"; timeout 9000 python tools/validate_chair.py /tmp/proc_chair2 ${a%%,*} --steps ${a##*,} >> "$log" 2>&1 ;;
    validatev2:*) a="${it#validatev2:}"; timeout 14000 python tools/validate_chair.py ${a//,/ } >> "$log" 2>&1 ;;
    stress:*) a="${it#stress:}"; timeout 4800 python tools/stress_scannet_scale.py ${a//,/ } >> "$log" 2>&1 ;;
    validate800:*) a="${it#validate800:}"; timeout 21000 python tools/validate_chair.py /tmp/proc_chair800 ${a%%,*} --steps ${a##*,} --full-recipe >> "$log" 2>&1 ;;
    fit:*) a="${it#fit:}"; timeout 3000 python tools/bench_fit.py ${a//,/ } >> "$log" 2>&1 ;;
    *)       timeout 1500 python tools/probe_bench_variants.py "$it" >> "$log" 2>&1 ;;
  esac
done
echo "==== queue done $(date +%H:%M:%S)" >> "$log"
