#!/bin/bash
# Converged runs of OUR framework (real TPU) with the same budgets as
# scripts/ref_queue.sh, for docs/PARITY_RESULTS.md.
cd /root/repo
mkdir -p our_runs
run() {
  local model=$1 epochs=$2 stop=$3 tmo=$4
  local done_marker="our_runs/${model}-baby/result.json"
  if [ -f "$done_marker" ] && python -c "
import json,sys
r=json.load(open('$done_marker'))
sys.exit(0 if r.get('epochs_budget',0)>=$epochs and r.get('returncode')==0 else 1)" 2>/dev/null; then
    echo "SKIP $model (already done)"; return
  fi
  echo "=== $(date +%H:%M:%S) START $model (epochs=$epochs timeout=${tmo}s)"
  timeout "$tmo" python scripts/run_ours.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step "$stop" \
    > "our_runs/${model}-baby.out" 2>&1
  echo "=== $(date +%H:%M:%S) END $model rc=$?"
}

run BPR       100 10 3600
run LightGCN  100 10 3600
run VBPR      100 10 3600
run BM3       100 10 3600
run GenRecV1   30  8 7200
run DiffMM     30  8 7200
echo "OUR QUEUE DONE $(date)"
