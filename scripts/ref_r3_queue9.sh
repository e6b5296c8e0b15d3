#!/bin/bash
# Round-3 ref queue 9: restart of 8b/8c jobs lost to the VM reset.
#   1. MVGAE full reference run with beta scalarized (the 8b attempt
#      crashed at mvgae.py:168 because run_reference.py pins
#      hyper_parameters to ["seed"], leaving beta as the YAML grid list;
#      configurator.py:64 gives config_dict priority, so inject 0.01 —
#      the same first-entry scalar ours resolves via models/base.py:46).
#   2. RFMRec on the synthetic noise lane (ours: 0.001 there).
# Short timeouts + harvest_ref_log so partials land within the session.
cd /root/repo
echo $$ > /tmp/refqueue9.pid

run() {
  local model=$1 tag=$2 epochs=$3 tmo=$4 cfg=$5
  local dir="ref_runs/${model}-baby${tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP $model$tag (done)"; return; fi
  echo "=== $(date +%H:%M:%S) START ref $model$tag (epochs=$epochs tmo=${tmo}s)"
  local args=()
  [ -n "$tag" ] && args+=(--tag "${tag#-}")
  # Preserve prior capture: never truncate committed evidence in place
  [ -f "$dir.out" ] && mv "$dir.out" "$dir.out.prev"
  nice -n 10 timeout "$tmo" python scripts/run_reference.py \
    -m "$model" -d baby --epochs "$epochs" --stopping-step 10 \
    "${args[@]}" --config-json "${cfg:-{\}}" > "$dir.out" 2>&1
  local rc=$?
  echo "=== $(date +%H:%M:%S) END ref $model$tag rc=$rc"
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

run MVGAE  -full  50 2400 '{"beta": 0.01}'
run RFMRec -noise 50 2400 '{}'
echo "REF R3 QUEUE9 DONE $(date)"
