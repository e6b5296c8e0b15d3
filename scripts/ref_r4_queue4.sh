#!/bin/bash
# Round-4 ref queue 4: GenRecV1 reference seed-band run. The parity table's
# remaining ❌ rows compare ref seed-999 (0.0359 R@20 @35 epochs, harvested
# from the timed-out ep60 run) to ours (0.0320/0.0334/0.0341 across seeds).
# One more reference seed at the same 35-epoch budget tells whether the
# -5.3% delta is inside the reference's own seed spread, as it was for
# DualGNN (ref spread there: 0.1292-0.1507).
cd /root/repo
echo $$ > /tmp/refqueue_r4_4.pid

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
  [ -f "$dir.out" ] && mv "$dir.out" "$dir.out.prev"
  nice -n 15 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 50 \
    "${args[@]}" --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

run GenRecV1 -seed1000-ep35 35 12000 '{"seed": [1000]}'
echo "REF R4 QUEUE4 DONE $(date)"
