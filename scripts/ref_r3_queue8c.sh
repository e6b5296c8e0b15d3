#!/bin/bash
# Round-3 ref queue 8c (waits for queue8b's RFMRec-noise job).
# One job: MVGAE full reference run. The 8b attempt crashed at
# mvgae.py:168 (`self.beta * kl_loss`) because run_reference.py pins
# hyper_parameters to ["seed"], so MVGAE.yaml's grid list
# `beta: [0.01, 0.1, 1]` never scalarizes. Ours resolves the same list
# with scalar() -> first entry 0.01 (models/base.py:46), so inject the
# matching scalar for a like-for-like adjudication.
cd /root/repo

while kill -0 "$(cat /tmp/refqueue8.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

dir="ref_runs/MVGAE-baby-full"
if [ -f "$dir/result.json" ]; then echo "SKIP MVGAE-full (done)"; exit 0; fi
echo "=== $(date +%H:%M:%S) START ref MVGAE-full (beta=0.01)"
nice -n 10 timeout 10800 python scripts/run_reference.py \
  -m MVGAE -d baby --epochs 50 --stopping-step 10 \
  --tag full --config-json '{"beta": 0.01}' > "$dir.out" 2>&1
rc=$?
echo "=== $(date +%H:%M:%S) END ref MVGAE-full rc=$rc"
if [ $rc -ne 0 ] && [ ! -f "$dir/result.json" ]; then
  python scripts/harvest_ref_log.py "$dir" >> "$dir.out" 2>&1
fi
echo "REF R3 QUEUE8C DONE $(date)"
