#!/bin/bash
# Follow-up to ref_r3_queue.sh: re-runs the two cohort models that crashed
# before the cuda-noop / DualGNN-parameter shims landed in run_reference.py.
cd /root/repo
while kill -0 "$(cat /tmp/ref_r3.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
run() {
  local model=$1 epochs=$2 tmo=$3 cfg=$4
  local dir="ref_runs/${model}-baby"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model (epochs=$epochs tmo=${tmo}s)"
  nice -n 10 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 10 \
    --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ] && [ -d "$dir/log" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}
run GRCN    50 9000 '{"reg_weight": 0.1}'
run DualGNN 50 9000 '{"aggr_mode": "add"}'
echo "REF R3 QUEUE2 DONE $(date)"
