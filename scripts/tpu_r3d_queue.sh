#!/bin/bash
# TPU chain, take 4 (supersedes tpu_r3c_queue.sh): same jobs, feasible order.
# The 18-model RF converged sweep (potentially 1h/model) ran BEFORE the short
# diffusion seed-band runs in take 3, starving them past the round budget.
# Short adjudication + seed jobs first; the RF sweep (journal-resumable)
# takes whatever wall remains. Gated on the in-flight RFMRec-baby run.
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

# 3. RF hosts at the reference's stopping_step 25 (warmup-safe), resumable
RF_MODELS="RFGUME RFGUMETime RFBM3 RFVBPR RFMRec RFLayerGCN_remove \
RFLightGCN_remove RFBPR_remove RFCOHESION RFDualGNN RFFREEDOM RFGRCN \
RFLATTICE RFLGMRec RFMGCN RFMMGCN RFPGL RFSMORE"
python scripts/zoo_sweep.py --dataset baby --tag converged \
  --epochs 50 --stopping-step 25 --timeout 3600 --rerun --models $RF_MODELS
echo "TPU R3D QUEUE DONE $(date)"
