#!/bin/bash
# Supersedes ref_r3_queue6.sh after the VM restart killed the chain.
# take 2: exports regenerated; GenRecV1 re-runs under -ep60 (the old
# 18-epoch partial result.json blocks the bare name).
# GRCN was harvested from its .out (result.json present). Remaining:
# DualGNN (now that run_reference.py carries the result_embed de-register
# patch, scripts/run_reference.py:150-166) -> RFMRec-struct -> GenRecV1
# (long, harvest partial) -> MVDiff (long, harvest partial).
cd /root/repo

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
  if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
    python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
  fi
}

MVDIFF_CFG=$(python3 - <<'EOF'
import json, yaml
cfg = yaml.safe_load(open("genmmrec_tpu/configs/model/MVDiff.yaml"))
for k, v in cfg.items():
    if isinstance(v, str):
        try:
            cfg[k] = float(v)
        except ValueError:
            pass
print(json.dumps(cfg))
EOF
)

STRUCT='"data_path": "/root/repo/data_struct/"'
run DualGNN  ""        50 7200 '{"aggr_mode": "add"}'
run RFMRec   "-struct" 50 5400 "{$STRUCT}"
run GenRecV1 "-ep60"   60 14400
run MVDiff   ""        30 14400 "$MVDIFF_CFG"
echo "REF R3 QUEUE7 DONE $(date)"
