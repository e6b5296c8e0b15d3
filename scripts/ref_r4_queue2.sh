#!/bin/bash
# Round-4 ref queue 2: DualGNN seed runs, retake of queue1's failed legs —
# hyper-grid values must be LISTS ({"seed": [1000]}), a scalar breaks
# quick_start.py:126 (itertools.product over hyper_ls entries).
cd /root/repo
echo $$ > /tmp/refqueue_r4_2.pid
# wait for queue1 (MVGAE leg) to finish — one CPU core
while kill -0 "$(cat /tmp/refqueue_r4_1.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
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

run DualGNN -seed1000 50 9000 '{"seed": [1000]}'
run DualGNN -seed2022 50 9000 '{"seed": [2022]}'
echo "REF R4 QUEUE2 DONE $(date)"
