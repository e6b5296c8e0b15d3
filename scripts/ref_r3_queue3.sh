#!/bin/bash
# Third ref queue segment: SLMRec seed runs — is the reference's epoch-1
# validation spike (0.1276 vs plateau ~0.046) robust across torch RNG
# streams, or a one-seed transient? Waits for queue2 (GRCN/DualGNN reruns).
cd /root/repo
while kill -0 "$(cat /tmp/ref_r3_2.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
for s in 1000 2022; do
  d="ref_runs/SLMRec-baby-seed$s"
  [ -f "$d/result.json" ] && continue
  echo "=== $(date +%H:%M:%S) START ref SLMRec seed$s"
  nice -n 10 timeout 5400 python scripts/run_reference.py -m SLMRec -d baby \
    --epochs 50 --stopping-step 10 --tag "seed$s" \
    --config-json "{\"seed\": [$s]}" > "$d.out" 2>&1
  echo "=== $(date +%H:%M:%S) END ref SLMRec seed$s rc=$?"
done
echo "REF R3 QUEUE3 DONE $(date)"
