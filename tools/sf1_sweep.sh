#!/bin/bash
# sf1.0 correctness sweep (r7 verdict item 2): one check_oracle
# process per query so a pathological DuckDB oracle can be timed out
# without losing the rest of the sweep.
#   usage: sf1_sweep.sh "<query names>" [logfile] [per-query timeout s]
LOG=${2:-/root/repo/.scratch/sf1_sweep.log}
TIMEOUT=${3:-900}
for q in $1; do
  echo "=== $q ===" >> "$LOG"
  timeout "$TIMEOUT" python -u /root/repo/tools/check_oracle.py \
    --sf /root/repo/.scratch/sf1.0 "$q" 2>/dev/null \
    | grep -aE "^(OK|FAIL|NOOR)|ok, " >> "$LOG"
  # $? after the pipeline is grep's status, which can never be 124 —
  # timeout's exit code is PIPESTATUS[0] (r8 advice, low: without
  # this, TIMEOUT lines were never written and a timed-out query was
  # indistinguishable from one that produced no output)
  rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 124 ]; then echo "TIMEOUT $q after ${TIMEOUT}s" >> "$LOG"; fi
done
echo "SWEEP DONE" >> "$LOG"
