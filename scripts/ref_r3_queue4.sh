#!/bin/bash
# Replacement for ref_r3_queue{,2,3}.sh with feasible ordering: the original
# chain put the open-ended GenRecV1 converged run BEFORE queue2/3 could fire,
# starving the GRCN/DualGNN reruns past the round budget. This queue waits
# for the in-flight MVDiff reference run, then does the short adjudication
# jobs first and gives GenRecV1 whatever wall remains (harvested partial on
# timeout, like round 2).
cd /root/repo
MVDIFF_PID="${1:-}"
if [ -n "$MVDIFF_PID" ]; then
  while kill -0 "$MVDIFF_PID" 2>/dev/null; do sleep 60; done
fi
d=ref_runs/MVDiff-baby
if [ ! -f "$d/result.json" ] && [ -d "$d/log" ]; then
  python scripts/harvest_ref_log.py "$d" >> "$d.out" 2>&1
fi

run() {
  local model=$1 ds_tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${ds_tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$ds_tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$ds_tag (epochs=$epochs tmo=${tmo}s)"
  local tagarg=()
  [ -n "$ds_tag" ] && tagarg=(--tag "${ds_tag#-}")
  nice -n 10 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 10 \
    "${tagarg[@]}" --config-json "${cfg:-{\}}" \
    > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$ds_tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ] && [ -d "$dir/log" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

STRUCT='"data_path": "/root/repo/data_struct/"'
run RFMRec     "-struct" 50 7200 "{$STRUCT}"
run ItemKNNCBF "-struct" 1 1800 "{$STRUCT, \"knn_k\": 10, \"shrink\": 10}"
run GRCN       ""        50 9000 '{"reg_weight": 0.1}'
run DualGNN    ""        50 9000 '{"aggr_mode": "add"}'
# remaining budget: GenRecV1 toward converged parity (round-2 ref capped @18)
run GenRecV1   ""        60 21600
echo "REF R3 QUEUE4 DONE $(date)"
