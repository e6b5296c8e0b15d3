#!/bin/bash
# Round-4 ref queue 3: DualGNN seed-band runs, third take. Queue 1 passed a
# scalar seed (breaks quick_start's grid product); queue 2 fixed that but
# dropped the {"aggr_mode": "add"} override the r3 queues used — with the
# hyper grid pinned to ["seed"], aggr_mode stays the YAML list ['add'] and
# Base_gcn's message() takes the un-normalized branch while the tg shim's
# scatter rejects a list reduce. Both overrides together this time.
cd /root/repo
echo $$ > /tmp/refqueue_r4_3.pid

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
  [ -f "$dir.out" ] && mv "$dir.out" "$dir.out.prev2"
  nice -n 15 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 10 \
    "${args[@]}" --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

run DualGNN -seed1000 50 9000 '{"seed": [1000], "aggr_mode": "add"}'
run DualGNN -seed2022 50 9000 '{"seed": [2022], "aggr_mode": "add"}'
echo "REF R4 QUEUE3 DONE $(date)"
