#!/bin/bash
# Round-4 ref queue 1 — adjudicate the two open parity verdicts (VERDICT.md #4):
#   1. DualGNN seed-1000 / seed-2022 full fits → seed band for the ❌ row
#      (ours 0.1311-0.1428 across 3 seeds vs reference seed-999 0.1507).
#   2. MVGAE longer partial (epochs budget 5, 9000 s cap, beta scalarized):
#      epoch-0 alone took 3267 s on this 1-core host (ref_runs/MVGAE-baby.out),
#      so a full fit is infeasible — a 4-5-epoch trajectory vs its flat
#      489715.x loss adjudicates whether the reference model trains at all.
# Runs nice'd: the host has ONE core shared with the TPU driver process.
cd /root/repo
echo $$ > /tmp/refqueue_r4_1.pid

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
  # never truncate committed evidence in place (ADVICE r3)
  [ -f "$dir.out" ] && mv "$dir.out" "$dir.out.prev"
  nice -n 15 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 10 \
    "${args[@]}" --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

run DualGNN -seed1000 50 9000 '{"seed": 1000}'
run DualGNN -seed2022 50 9000 '{"seed": 2022}'
run MVGAE   -full5ep   5 9000 '{"beta": 0.01, "eval_step": 1}'
echo "REF R4 QUEUE1 DONE $(date)"
