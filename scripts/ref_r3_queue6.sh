#!/bin/bash
# Supersedes ref_r3_queue5.sh. Adds the ref MVDiff redo: the first attempt
# injected our MVDiff.yaml via plain yaml.safe_load, which parses `1e-2` as a
# STRING (the reference Config has a custom float resolver for exactly this,
# configurator.py:92-104) and the model crashed at trainer.py:1091 multiplying
# a tensor by the string. Coerce numeric-looking strings to floats here.
# Order: GRCN (in-flight, waited on) -> DualGNN -> RFMRec-struct ->
# GenRecV1 (4h cap, harvest partial) -> MVDiff (rest of round, harvest).
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
run DualGNN  ""        50 9000 '{"aggr_mode": "add"}'
run RFMRec   "-struct" 50 7200 "{$STRUCT}"
run GenRecV1 ""        60 14400
run MVDiff   ""        30 14400 "$MVDIFF_CFG"
echo "REF R3 QUEUE6 DONE $(date)"
