#!/bin/bash
# Follow-up reference-run queue: waits for the first queue (ref_queue.sh) to
# finish, then re-runs the two models that crashed on the scipy
# dok_matrix._update removal before the (now-fixed) shim landed.
cd /root/repo
while kill -0 "$(cat /tmp/refqueue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
mkdir -p ref_runs
run() {
  local model=$1 epochs=$2 stop=$3 tmo=$4 cfg=$5
  local done_marker="ref_runs/${model}-baby/result.json"
  if [ -f "$done_marker" ]; then echo "SKIP $model (already done)"; return; fi
  echo "=== $(date +%H:%M:%S) START $model (epochs=$epochs timeout=${tmo}s)"
  nice -n 10 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step "$stop" \
    --config-json "${cfg:-{\}}" \
    > "ref_runs/${model}-baby.out" 2>&1
  echo "=== $(date +%H:%M:%S) END $model rc=$?"
}
# pin grid lists to their first entries — the values our runs resolved to
# (models/base.py scalar(); our_runs/LightGCN-baby used n_layers=1, reg=1e-2)
run LightGCN  100 10 7200 '{"n_layers": 1, "reg_weight": 0.01}'
run BM3       100 10 7200
echo "QUEUE2 DONE $(date)"
