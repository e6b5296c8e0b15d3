#!/bin/bash
# Round-3 ref queue 8 — runs AFTER ref_r3_queue7's MVDiff job (waits on its
# PID) to keep the single CPU core exclusive. Adjudication targets:
#   1. SLMRec @ seed 1000: the init-time popularity prior is a per-seed coin
#      flip (seed 999 lucky 0.117@init, seeds 7/1000/2022 ~0.001@init —
#      /tmp ablations, docs/PARITY_RESULTS.md). Does the reference converge
#      to ~ours (0.0489) from an unlucky draw?
#   2. CoDMR: the last never-adjudicated low scorer (ours 0.0928).
#   3. MVGAE: existing ref result is a 3-epoch partial (0.0053) — useless;
#      ours post-fix posts 0.1807, need a real reference number.
cd /root/repo

while kill -0 "$(cat /tmp/refqueue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
  nice -n 10 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 10 \
    "${args[@]}" --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

run SLMRec -seed1000 50 7200  '{"seed": [1000]}'
run CoDMR  ""        50 10800 '{}'
run MVGAE  -full     50 10800 '{}'
# RFMRec on the synthetic (noise-feature) baby export: ours posts 0.001
# there while trajectory-matching the reference on the struct export
# pointwise; this run settles whether the reference is also ~0.001 on the
# noise lane (~770 s/epoch on torch-CPU; early stop ~ep11; harvest partial)
run RFMRec -noise    50 10800 '{}'
echo "REF R3 QUEUE8 DONE $(date)"
