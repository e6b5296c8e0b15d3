#!/bin/bash
# Final CPU-side reference queue: struct-ablation adjudication first
# (BM3 + LightGCN on the latent-factor dataset — our struct run showed
# BM3 < BPR, opposite of the reference's published real-baby ordering;
# the reference's own run on the SAME data decides data-property vs
# implementation bug), then the reference multi-seed runs (its across-seed
# spread is the yardstick for ours-vs-ref deltas). Deadline-bounded so the
# core is free before round end.
cd /root/repo
DEADLINE=$(date -d '2026-08-18 03:45' +%s)
left() { echo $(( DEADLINE - $(date +%s) )); }
while kill -0 "$(cat /tmp/refablation.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
DP="{\"data_path\": \"/root/repo/data_struct/\"}"
for m in BM3 LightGCN; do
  [ -f "ref_runs/${m}-baby-struct/result.json" ] && continue
  L=$(left); [ "$L" -lt 900 ] && break
  [ "$L" -gt 7200 ] && L=7200
  echo "=== $(date +%H:%M:%S) START ref $m (struct, timeout ${L}s)"
  nice -n 10 timeout "$L" python scripts/run_reference.py -m "$m" -d baby \
    --tag struct --epochs 100 --stopping-step 10 --config-json "$DP" \
    > "ref_runs/${m}-baby-struct.out" 2>&1
  echo "=== $(date +%H:%M:%S) END ref $m rc=$?"
done
for seed in 1000 2022; do
  for m in BPR VBPR BM3; do
    [ -f "ref_runs/${m}-baby-seed${seed}/result.json" ] && continue
    L=$(left); [ "$L" -lt 900 ] && break 2
    [ "$L" -gt 7200 ] && L=7200
    echo "=== $(date +%H:%M:%S) START ref $m seed=$seed (timeout ${L}s)"
    nice -n 10 timeout "$L" python scripts/run_reference.py -m "$m" -d baby \
      --tag "seed${seed}" --epochs 100 --stopping-step 10 \
      --config-json "{\"seed\": [${seed}]}" \
      > "ref_runs/${m}-baby-seed${seed}.out" 2>&1
    echo "=== $(date +%H:%M:%S) END ref $m seed=$seed rc=$?"
  done
done
echo "REF TAIL QUEUE DONE $(date)"
