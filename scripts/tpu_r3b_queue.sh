#!/bin/bash
# Round-3 TPU chain, take 2 (supersedes tpu_r3_queue.sh): re-ordered so the
# elec-scale DiffMM retest (VERDICT item 1, with the new scan-slicing fix)
# runs before the long RF sweep, and the models whose init changed with the
# torch-default bias fix (SLMRec/BM3) are re-run.
cd /root/repo
while kill -0 "$(cat /tmp/tpu_r3.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done

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

# 1. adjudication cohort remainder (budgets match ref_r3_queue.sh)
run_ours GRCN    50
run_ours DualGNN 50
run_ours MVGAE   50
run_ours CoDMR   50
run_ours MVDiff  30
run_ours RFMRec  50 '{"lambda_rf": 0.0}' norf

# 2. torch-default-bias reruns + seed bands
run_ours SLMRec 50
run_ours BM3    100
for s in 1000 2022; do run_ours SLMRec 50 "" "" $s; done
for s in 123 777;   do run_ours BM3   100 "" "" $s; done

# 3. elec-scale DiffMM with epoch scan slicing (the round-2 crash fix)
echo "=== $(date +%H:%M:%S) ELEC DiffMM"
timeout 14000 python -u scripts/elec_scale.py --models DiffMM --epochs 1 \
  > /tmp/elec_diffmm_r3b.log 2>&1
echo "=== $(date +%H:%M:%S) ELEC DiffMM rc=$?"

# 4. RF hosts at the reference's stopping_step 25 (warmup-safe)
RF_MODELS="RFGUME RFGUMETime RFBM3 RFVBPR RFMRec RFLayerGCN_remove \
RFLightGCN_remove RFBPR_remove RFCOHESION RFDualGNN RFFREEDOM RFGRCN \
RFLATTICE RFLGMRec RFMGCN RFMMGCN RFPGL RFSMORE"
python scripts/zoo_sweep.py --dataset baby --tag converged \
  --epochs 50 --stopping-step 25 --timeout 3600 --rerun --models $RF_MODELS

# 5. diffusion mid-tier seed bands (VERDICT item 9)
for m in DiffRec DDRM MCDRec; do
  for s in 1000 2022; do run_ours $m 50 "" "" $s; done
done
echo "TPU R3B QUEUE DONE $(date)"
