#!/bin/bash
# Structured-feature ablation (VERDICT r1 weak #3): run the ordering-sensitive
# models on the latent-factor dataset with feature-correlated modalities
# (scripts/make_structured_dataset.py). Expected recoveries, per the
# reference's published baby table (evaluation/README.md:17-27):
#   VBPR > BPR, FREEDOM > BM3 > BPR.
# Waits for the main TPU chain (/tmp/chain.pid) to release the chip.
cd /root/repo
while kill -0 "$(cat /tmp/chain.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
DP="{\"data_path\": \"/root/repo/data_struct/\"}"
for m in BPR VBPR LightGCN BM3 FREEDOM; do
  [ -f "our_runs/${m}-baby-struct/result.json" ] && continue
  echo "=== $(date +%H:%M:%S) START $m (struct)"
  timeout 3600 python scripts/run_ours.py -m "$m" -d baby --tag struct \
    --epochs 100 --stopping-step 10 --config-json "$DP"
done
echo "ABLATION QUEUE DONE $(date)"
