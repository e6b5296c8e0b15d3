#!/bin/bash
# Round-3 reference adjudication queue (torch-CPU, one core — serialized).
#
# VERDICT.md round-2 item 3: every low-scoring unadjudicated model gets a
# reference run on the SAME exported dataset so "low" vs "wrong" is
# decidable: SLMRec, GRCN, DualGNN, MVGAE, CoDMR, MVDiff on baby-synthetic;
# RFMRec + ItemKNNCBF on the structured ablation set. Grid lists are pinned
# to their first entry, matching our models/base.py scalar() resolution.
# Finally GenRecV1 gets the remaining wall budget toward converged parity
# (VERDICT item 5) — harvested partial if it times out.
cd /root/repo
mkdir -p ref_runs
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
MVDIFF_CFG=$(python3 - <<'EOF'
import json, yaml
cfg = yaml.safe_load(open("genmmrec_tpu/configs/model/MVDiff.yaml"))
print(json.dumps(cfg))
EOF
)

run SLMRec  ""       50 7200
run GRCN    ""       50 9000 '{"reg_weight": 0.1}'
run DualGNN ""       50 9000 '{"aggr_mode": "add"}'
run MVGAE   ""       50 7200 '{"beta": 0.01}'
run CoDMR   ""       50 10800
run MVDiff  ""       30 10800 "$MVDIFF_CFG"
run RFMRec  "-struct" 50 7200 "{$STRUCT}"
run ItemKNNCBF "-struct" 1 1800 "{$STRUCT, \"knn_k\": 10, \"shrink\": 10}"
# remaining budget: GenRecV1 toward converged parity (ref timed out @18 in r2)
run GenRecV1 "" 60 42300
echo "REF R3 QUEUE DONE $(date)"
