#!/bin/bash
# Round-5 ref queue 1 — VERDICT.md r4 ask #1a: reference GenRecV1 seed runs
# at the matched 35-epoch cap (like the DualGNN adjudication) to establish
# the reference seed band for the -5.3% recall@20 row in
# docs/PARITY_RESULTS.md (ref seed999 0.0359 vs ours 0.0340/0.0334/0.0320).
# Host has ONE CPU core; GenRecV1 steady-state is ~435 s/epoch
# (ref_runs/GenRecV1-baby-ep60.out), so each leg is ~4.3 h. nice'd so the
# TPU-side work keeps priority. Seed values must be LISTS (hyper-grid).
cd /root/repo
echo $$ > /tmp/refqueue_r5_1.pid

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
  [ -f "$dir.out" ] && mv "$dir.out" "$dir.out.prev"
  nice -n 15 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 35 \
    "${args[@]}" --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

run GenRecV1 -seed1000 35 18000 '{"seed": [1000]}'
run GenRecV1 -seed2022 35 18000 '{"seed": [2022]}'
echo "REF R5 QUEUE1 DONE $(date)"
