#!/bin/bash
# Sequential TPU probe queue, generation 2: adds env-parameterized
# bench cases (frame-mode knobs). ONE process at a time (STATUS.md).
# Usage: tools/run_probe_queue2.sh <logfile> [items_file]
# Items file defaults to tools/queue2_items.txt; '#' comments allowed.
log=$1
items_file=${2:-"$(dirname "$0")/queue2_items.txt"}
grep -v '^#' "$items_file" | while read -r it; do
  [ -z "$it" ] && continue
  echo "==== $it $(date +%H:%M:%S)" >> "$log"
  case "$it" in
    benchbt:*)  BENCH_BT="${it#benchbt:}" timeout 5400 python bench.py >> "$log" 2>&1 ;;
    benchchunk:*) BENCH_CHUNK="${it#benchchunk:}" timeout 5400 python bench.py >> "$log" 2>&1 ;;
    benchbtchunk:*) a="${it#benchbtchunk:}"; BENCH_BT="${a%%,*}" BENCH_CHUNK="${a##*,}" timeout 5400 python bench.py >> "$log" 2>&1 ;;
    bench)      timeout 5400 python bench.py >> "$log" 2>&1 ;;
    chair:*)    PROBE_SCENE=chair timeout 1800 python tools/probe_bench_variants.py "${it#chair:}" >> "$log" 2>&1 ;;
    chaircheck:*) PROBE_SCENE=chair timeout 2400 python tools/check_variant_exact.py "${it#chaircheck:}" >> "$log" 2>&1 ;;
    chunks:*)   timeout 1800 python tools/probe_chunks.py "${it#chunks:}" >> "$log" 2>&1 ;;
    train:*)    a="${it#train:}"; timeout 1800 python tools/bench_train_fast.py ${a//,/ } >> "$log" 2>&1 ;;
    validate:*) a="${it#validate:}"; timeout 9000 python tools/validate_chair.py /tmp/proc_chair2 ${a%%,*} --steps ${a##*,} >> "$log" 2>&1 ;;
    fit:*)      a="${it#fit:}"; timeout 3000 python tools/bench_fit.py ${a//,/ } >> "$log" 2>&1 ;;
    *)          timeout 1500 python tools/probe_bench_variants.py "$it" >> "$log" 2>&1 ;;
  esac
done
echo "==== queue done $(date +%H:%M:%S)" >> "$log"
