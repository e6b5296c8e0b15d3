#!/bin/bash
# TPU chain, take 5 (supersedes tpu_r3d_queue.sh): inserts the elec-scale
# DiffMM retest (now that scripts/elec_scale.py captures peak HBM robustly)
# between the short seed-band jobs and the open-ended RF sweep.
cd /root/repo
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run_ours() {
  local model=$1 epochs=$2 extra=$3 tag=$4 seed=$5
  local dir="our_runs/${model}-baby${seed:+-seed$seed}${tag:+-$tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP ours $model$tag$seed"; return; fi
  echo "=== $(date +%H:%M:%S) OURS $model tag=$tag seed=$seed (epochs=$epochs)"
  timeout 3600 python scripts/run_ours.py -m "$model" -d baby \
    --epochs "$epochs" --stopping-step 10 ${tag:+--tag "$tag"} \
    ${seed:+--seed "$seed"} --config-json "${extra:-{\}}" > "$dir.out" 2>&1
  echo "=== $(date +%H:%M:%S) OURS $model$tag$seed rc=$?"
}

# 1. adjudication cohort remainder + init-fix reruns (short)
run_ours RFMRec 50
run_ours RFMRec 50 '{"data_path": "/root/repo/data_struct/"}' struct
run_ours RFMRec 50 '{"lambda_rf": 0.0}' norf
run_ours SLMRec 50
run_ours BM3    100

# 2. seed bands: suspect cohort + diffusion mid-tier (VERDICT r2 item 9)
for s in 1000 2022; do run_ours SLMRec 50 "" "" $s; done
for s in 123 777;   do run_ours BM3   100 "" "" $s; done
for m in DiffRec DDRM MCDRec; do
  for s in 1000 2022; do run_ours $m 50 "" "" $s; done
done

# 3. elec-scale DiffMM retest with peak-HBM capture (VERDICT r2 item 1:
# "recorded s/epoch and peak HBM"); data/elec is materialized on disk
echo "=== $(date +%H:%M:%S) ELEC DiffMM retest"
timeout 3600 python scripts/elec_scale.py --models DiffMM --epochs 1 \
  > /tmp/elec_r3_retest.log 2>&1
echo "=== $(date +%H:%M:%S) ELEC retest rc=$?"

# 4. RF hosts at the reference's stopping_step 25 (warmup-safe), resumable
RF_MODELS="RFGUME RFGUMETime RFBM3 RFVBPR RFMRec RFLayerGCN_remove \
RFLightGCN_remove RFBPR_remove RFCOHESION RFDualGNN RFFREEDOM RFGRCN \
RFLATTICE RFLGMRec RFMGCN RFMMGCN RFPGL RFSMORE"
python scripts/zoo_sweep.py --dataset baby --tag converged \
  --epochs 50 --stopping-step 25 --timeout 3600 --rerun --models $RF_MODELS
echo "TPU R3E QUEUE DONE $(date)"
