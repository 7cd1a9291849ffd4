#!/bin/bash
# Sequential per-file test runner: each file in a FRESH process.
# The xdist long-lived-worker mode SIGABRTs in XLA CPU collectives
# under host load (see pytest.ini notes); fresh processes are immune.
pass=0; fail=0; failed=""
for f in tests/test_*.py; do
  if timeout 1200 python -m pytest "$f" -q -p no:cacheprovider -p no:xdist 2>/dev/null | tail -1 | grep -qE "passed|no tests"; then
    pass=$((pass+1)); echo "PASS $f"
  else
    fail=$((fail+1)); failed="$failed $f"; echo "FAIL $f"
  fi
done
echo "files passed=$pass failed=$fail$failed"
