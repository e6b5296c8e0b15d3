#!/bin/bash
# Sequential reference-run queue for the converged-parity experiment
# (docs/PARITY_RESULTS.md). One CPU core: run one model at a time, niced so
# interactive work keeps priority. Timeouts bound each run.
cd /root/repo
mkdir -p ref_runs
run() {
  local model=$1 epochs=$2 stop=$3 tmo=$4
  local done_marker="ref_runs/${model}-baby/result.json"
  if [ -f "$done_marker" ] && python -c "
import json,sys
r=json.load(open('$done_marker'))
sys.exit(0 if r.get('epochs_budget',0)>=$epochs else 1)" 2>/dev/null; then
    echo "SKIP $model (already done)"; return
  fi
  echo "=== $(date +%H:%M:%S) START $model (epochs=$epochs timeout=${tmo}s)"
  nice -n 10 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step "$stop" \
    > "ref_runs/${model}-baby.out" 2>&1
  echo "=== $(date +%H:%M:%S) END $model rc=$?"
}

run BPR       100 10 3600
run LightGCN  100 10 7200
run VBPR      100 10 5400
run BM3       100 10 7200
run GenRecV1   30  8 14400
run DiffMM     30  8 14400
echo "QUEUE DONE $(date)"
