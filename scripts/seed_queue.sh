#!/bin/bash
# Multi-seed runs of OUR framework for the parity seed-variance band
# (docs/PARITY_RESULTS.md): the reference comparison uses different RNG
# streams by construction (torch vs jax.random), so "within 1%" must be
# read against the across-seed spread. Waits for the elec-scale run to
# release the chip first.
cd /root/repo
while kill -0 "$(cat /tmp/elec.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
# structured-feature ablation first (VERDICT weak #3 ordering recovery) —
# higher-leverage than extra seeds; ablation_queue.sh skips completed runs
DP="{\"data_path\": \"/root/repo/data_struct/\"}"
for m in BPR VBPR LightGCN BM3 FREEDOM ItemKNNCBF MVGAE SMORE RFMRec; do
  [ -f "our_runs/${m}-baby-struct/result.json" ] && continue
  echo "=== $(date +%H:%M:%S) START $m (struct)"
  timeout 3600 python scripts/run_ours.py -m "$m" -d baby --tag struct \
    --epochs 100 --stopping-step 10 --config-json "$DP"
done
for seed in 1000 2022; do
  for m in BPR LightGCN VBPR BM3; do
    [ -f "our_runs/${m}-baby-seed${seed}/result.json" ] && continue
    echo "=== $(date +%H:%M:%S) START $m seed=$seed"
    timeout 3600 python scripts/run_ours.py -m "$m" -d baby \
      --epochs 100 --stopping-step 10 --seed "$seed"
  done
  for m in GenRecV1 DiffMM; do
    [ -f "our_runs/${m}-baby-seed${seed}/result.json" ] && continue
    echo "=== $(date +%H:%M:%S) START $m seed=$seed"
    timeout 7200 python scripts/run_ours.py -m "$m" -d baby \
      --epochs 30 --stopping-step 8 --seed "$seed"
  done
done
echo "SEED QUEUE DONE $(date)"
