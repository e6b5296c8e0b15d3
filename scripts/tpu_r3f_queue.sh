#!/bin/bash
# Supersedes tpu_r3e_queue.sh after the VM restart killed the chain.
# Adds a pause gate: `touch /tmp/tpu_pause` holds the queue between jobs so
# an interactive validation run can borrow the (exclusive) TPU; `rm` resumes.
# SLMRec reruns are deliberately ABSENT: the 0.0472-vs-ref-0.1276 gap is a
# bug under active fix; rerunning the broken model wastes the chip.
cd /root/repo

gate() { while [ -e /tmp/tpu_pause ]; do sleep 20; done; }

run_ours() {
  local model=$1 epochs=$2 extra=$3 tag=$4 seed=$5
  local dir="our_runs/${model}-baby${seed:+-seed$seed}${tag:+-$tag}"
  if [ -f "$dir/result.json" ]; then echo "SKIP ours $model$tag$seed"; return; fi
  gate
  echo "=== $(date +%H:%M:%S) OURS $model tag=$tag seed=$seed (epochs=$epochs)"
  timeout 3600 python scripts/run_ours.py -m "$model" -d baby \
    --epochs "$epochs" --stopping-step 10 ${tag:+--tag "$tag"} \
    ${seed:+--seed "$seed"} --config-json "${extra:-{\}}" > "$dir.out" 2>&1
  echo "=== $(date +%H:%M:%S) OURS $model$tag$seed rc=$?"
}

# 1. the lost BM3 100-epoch run (RFMRec deferred: rerun with the r3 init
# fix still posts 0.0014 -- bug under active root-cause, reruns wasted)
run_ours BM3    100

# 2. seed bands for the diffusion mid-tier (VERDICT r2 item 9)
for m in DiffRec DDRM MCDRec; do
  for s in 1000 2022; do run_ours $m 50 "" "" $s; done
done

# 3. ours GenRecV1 at the extended budget to pair with the ref harvest
run_ours GenRecV1 60 '{}' ep60

# 4. elec-scale DiffMM retest with peak-HBM capture (fills the HBM column
# in docs/ELEC_SCALE.md; capability itself already demonstrated)
gate
if grep -E '^\| DiffMM .*\| None \|' docs/ELEC_SCALE.md >/dev/null; then
  echo "=== $(date +%H:%M:%S) ELEC DiffMM retest"
  timeout 5400 python scripts/elec_scale.py --models DiffMM --epochs 1 \
    > /tmp/elec_r3_retest.log 2>&1
  echo "=== $(date +%H:%M:%S) ELEC retest rc=$?"
fi

# 5. remaining RF variants to converged + journal refreshes for the two
# models fixed after their stale journal entries (MVGAE, RFMRec)
RF_MODELS="RFBPR_remove RFCOHESION RFDualGNN RFFREEDOM RFGRCN RFLATTICE \
RFLGMRec RFMGCN RFMMGCN RFPGL RFSMORE MVGAE"
for m in $RF_MODELS; do
  gate
  python scripts/zoo_sweep.py --dataset baby --tag converged \
    --epochs 50 --stopping-step 25 --timeout 3600 --rerun --models $m
done
echo "TPU R3F QUEUE DONE $(date)"
