#!/bin/bash
# TPU chain, take 3 (supersedes tpu_r3b_queue.sh): the elec-scale DiffMM
# retest now runs FIRST (launched separately under /tmp/elec.pid with the
# blocked-SpMM kernel); this queue picks up the chip afterwards for the
# our-side reruns, the RF sweep at warmup-safe stopping, and seed bands.
cd /root/repo
while kill -0 "$(cat /tmp/elec.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

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

# 1. adjudication cohort remainder + init-fix reruns
run_ours MVDiff 30
# RFMRec after the dropout/torch-init/lambda fixes: baby converged rerun,
# struct rerun (ref adjudication target), lambda_rf=0 ablation
run_ours RFMRec 50
run_ours RFMRec 50 '{"data_path": "/root/repo/data_struct/"}' struct
run_ours RFMRec 50 '{"lambda_rf": 0.0}' norf
run_ours SLMRec 50
run_ours BM3    100
for s in 1000 2022; do run_ours SLMRec 50 "" "" $s; done
for s in 123 777;   do run_ours BM3   100 "" "" $s; done

# 2. RF hosts at the reference's stopping_step 25 (warmup-safe)
RF_MODELS="RFGUME RFGUMETime RFBM3 RFVBPR RFMRec RFLayerGCN_remove \
RFLightGCN_remove RFBPR_remove RFCOHESION RFDualGNN RFFREEDOM RFGRCN \
RFLATTICE RFLGMRec RFMGCN RFMMGCN RFPGL RFSMORE"
python scripts/zoo_sweep.py --dataset baby --tag converged \
  --epochs 50 --stopping-step 25 --timeout 3600 --rerun --models $RF_MODELS

# 3. diffusion mid-tier seed bands (VERDICT r2 item 9)
for m in DiffRec DDRM MCDRec; do
  for s in 1000 2022; do run_ours $m 50 "" "" $s; done
done
echo "TPU R3C QUEUE DONE $(date)"
