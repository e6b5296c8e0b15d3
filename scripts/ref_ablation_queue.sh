#!/bin/bash
# Reference-side cross-check for the structured-feature ablation: BPR and
# VBPR on the latent-factor dataset (torch-CPU). Waits for the follow-up
# reference queue (/tmp/refqueue2.pid) to release the core.
cd /root/repo
while kill -0 "$(cat /tmp/refqueue2.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
DP="{\"data_path\": \"/root/repo/data_struct/\"}"
for m in BPR VBPR; do
  [ -f "ref_runs/${m}-baby-struct/result.json" ] && continue
  echo "=== $(date +%H:%M:%S) START ref $m (struct)"
  nice -n 10 timeout 7200 python scripts/run_reference.py -m "$m" -d baby \
    --tag struct --epochs 100 --stopping-step 10 --config-json "$DP" \
    > "ref_runs/${m}-baby-struct.out" 2>&1
  echo "=== $(date +%H:%M:%S) END ref $m rc=$?"
done
echo "REF ABLATION QUEUE DONE $(date)"
