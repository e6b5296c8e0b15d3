#!/bin/bash
# Supersedes ref_r3_queue4.sh (killed after its RFMRec-struct job failed on
# the reference's RFMREC class-name convention — run_reference.py now maps
# the name). Waits for the orphaned in-flight GRCN reference run, then:
# DualGNN -> RFMRec-struct (redo) -> GenRecV1 converged (remaining budget).
cd /root/repo
GRCN_PID="${1:-}"
if [ -n "$GRCN_PID" ]; then
  while kill -0 "$GRCN_PID" 2>/dev/null; do sleep 60; done
fi
d=ref_runs/GRCN-baby
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
run DualGNN    ""        50 9000 '{"aggr_mode": "add"}'
run RFMRec     "-struct" 50 7200 "{$STRUCT}"
# remaining budget: GenRecV1 toward converged parity (round-2 ref capped @18)
run GenRecV1   ""        60 18000
echo "REF R3 QUEUE5 DONE $(date)"
