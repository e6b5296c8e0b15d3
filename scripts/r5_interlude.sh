#!/bin/bash
# Chip-window interlude between queue halves: verify drive, kernel tuning
# probes, DiffMM remat/NaN discrimination. Run while the main queue is
# stopped; relaunch our_r5b_queue.sh afterwards (markers skip done legs).
cd /root/repo
echo $$ > /tmp/r5_interlude.pid

echo "=== $(date +%H:%M:%S) verify drive (tiny BPR, real chip)"
timeout 550 python main.py --model BPR --dataset tiny --epochs 3 2>&1 | tail -12

echo "=== $(date +%H:%M:%S) probe_topk_tune"
timeout 1800 python scripts/probe_topk_tune.py 2>&1 | grep -v "^WARNING\|experimental"

echo "=== $(date +%H:%M:%S) probe_spmm_paths"
timeout 1800 python scripts/probe_spmm_paths.py 2>&1 | grep -v "^WARNING\|experimental"

echo "=== $(date +%H:%M:%S) DiffMM elec probe-only (remat ON memory footprint)"
timeout 1800 python scripts/elec_scale.py --models DiffMM --probe-only

echo "=== $(date +%H:%M:%S) DiffMM elec 2ep remat OFF (NaN discrimination)"
timeout 5400 python scripts/elec_scale.py --models DiffMM --epochs 2 \
    --config-json '{"remat_gcn": 0}' --tag _noremat

echo "INTERLUDE DONE $(date)"
