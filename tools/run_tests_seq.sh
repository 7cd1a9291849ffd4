#!/bin/bash
# Sequential per-file test runner: each file in a FRESH process.
# The xdist long-lived-worker mode SIGABRTs in XLA CPU collectives
# under host load (see pytest.ini notes); fresh processes are immune.
# -o addopts= overrides pytest.ini's xdist options.
pass=0; fail=0; failed=""
for f in tests/test_*.py; do
  out=$(timeout 1800 python -m pytest "$f" -q -o addopts= -p no:cacheprovider 2>/dev/null | tail -2)
  if echo "$out" | grep -qE "[0-9]+ (passed|xfailed|skipped)" && ! echo "$out" | grep -qE "[0-9]+ (failed|error)"; then
    pass=$((pass+1)); echo "PASS $f :: $(echo $out | tr '\n' ' ')"
  else
    fail=$((fail+1)); failed="$failed $f"; echo "FAIL $f :: $(echo $out | tr '\n' ' ')"
  fi
done
echo "files passed=$pass failed=$fail$failed"
