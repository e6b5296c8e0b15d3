#!/bin/bash
# Second reference-side struct-ablation wave: BM3 + LightGCN on the
# latent-factor dataset (torch-CPU). Our struct run showed BM3 < BPR —
# opposite of the reference's published real-baby ordering
# (evaluation/README.md:17-24); the reference's own run on the SAME struct
# data adjudicates whether that is a data property or an implementation
# difference. Runs after the reference seed queue (last CPU consumer).
cd /root/repo
while kill -0 "$(cat /tmp/refseed.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
DP="{\"data_path\": \"/root/repo/data_struct/\"}"
for m in BM3 LightGCN; do
  [ -f "ref_runs/${m}-baby-struct/result.json" ] && continue
  echo "=== $(date +%H:%M:%S) START ref $m (struct)"
  nice -n 10 timeout 7200 python scripts/run_reference.py -m "$m" -d baby \
    --tag struct --epochs 100 --stopping-step 10 --config-json "$DP" \
    > "ref_runs/${m}-baby-struct.out" 2>&1
  echo "=== $(date +%H:%M:%S) END ref $m rc=$?"
done
echo "REF STRUCT2 QUEUE DONE $(date)"
