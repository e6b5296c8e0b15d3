#!/bin/bash
# Reference-side multi-seed runs (torch-CPU): the across-seed spread of the
# REFERENCE is the proper yardstick for the ours-vs-ref deltas at seed 999
# (both implementations draw from different RNG streams by construction).
# Runs last in the CPU chain: waits for the reference ablation queue.
cd /root/repo
while kill -0 "$(cat /tmp/refablation.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
for seed in 1000 2022; do
  for m in BPR VBPR BM3; do
    [ -f "ref_runs/${m}-baby-seed${seed}/result.json" ] && continue
    echo "=== $(date +%H:%M:%S) START ref $m seed=$seed"
    nice -n 10 timeout 7200 python scripts/run_reference.py -m "$m" -d baby \
      --tag "seed${seed}" --epochs 100 --stopping-step 10 \
      --config-json "{\"seed\": [${seed}]}" \
      > "ref_runs/${m}-baby-seed${seed}.out" 2>&1
    echo "=== $(date +%H:%M:%S) END ref $m seed=$seed rc=$?"
  done
done
echo "REF SEED QUEUE DONE $(date)"
