#!/bin/bash
# Round-5 session-2 TPU queue (VM was reset: /tmp markers + XLA cache wiped).
# Ordered by VERDICT r4 value-per-minute:
#   1. DiffMM elec 2ep  -> remat verify + steady epoch split   (ask #3)
#   2. BPR cold+warm    -> kill the 0.8x row                   (ask #4)
#   3. GenRecV1 elec 2ep -> steady epoch split                 (ask #5)
#   4. LightGCN/CoDMR cold+warm                                (ask #4)
#   5. GenRecV1 sports converged; DDRM/SLMRec longer sports    (asks #5/#8)
cd /root/repo
echo $$ > /tmp/our_r5b_queue.pid
mkdir -p our_runs comparison_logs

leg() {  # leg <marker-file> <timeout-s> <cmd...>
  local marker=$1 tmo=$2; shift 2
  if [ -f "$marker" ]; then echo "SKIP ($marker exists)"; return; fi
  echo "=== $(date +%H:%M:%S) START: $*"
  timeout "$tmo" "$@"
  local rc=$?
  echo "=== $(date +%H:%M:%S) END rc=$rc: $*"
  [ $rc -eq 0 ] && touch "$marker"
}

# 1. DiffMM elec, 2 epochs -> remat verify + fit_s_per_epoch_steady
leg /tmp/leg_diffmm_elec.done 5400 \
  python scripts/elec_scale.py --models DiffMM --epochs 2

# 2. BPR: cold (populates persistent cache) then warm (the table number)
leg /tmp/leg_bpr_cold.done 2400 \
  python scripts/run_ours.py -m BPR -d baby --epochs 100 \
    --stopping-step 10 --tag coldr5
leg /tmp/leg_bpr_warm.done 2400 \
  python scripts/run_ours.py -m BPR -d baby --epochs 100 \
    --stopping-step 10 --tag warm

# 3. GenRecV1 elec, 2 epochs -> steady-state split
leg /tmp/leg_genrecv1_elec.done 7200 \
  python scripts/elec_scale.py --models GenRecV1 --epochs 2

# 4. LightGCN + CoDMR cold/warm pairs
leg /tmp/leg_lightgcn_cold.done 2400 \
  python scripts/run_ours.py -m LightGCN -d baby --epochs 100 \
    --stopping-step 10 --tag coldr5
leg /tmp/leg_lightgcn_warm.done 2400 \
  python scripts/run_ours.py -m LightGCN -d baby --epochs 100 \
    --stopping-step 10 --tag warm
leg /tmp/leg_codmr_cold.done 3600 \
  python scripts/run_ours.py -m CoDMR -d baby --epochs 50 \
    --stopping-step 10 --tag coldr5
leg /tmp/leg_codmr_warm.done 3600 \
  python scripts/run_ours.py -m CoDMR -d baby --epochs 50 \
    --stopping-step 10 --tag warm

# 5. converged sports runs
leg /tmp/leg_genrecv1_sports.done 10800 \
  python scripts/run_ours.py -m GenRecV1 -d sports --epochs 100 \
    --stopping-step 10
leg /tmp/leg_ddrm_sports.done 7200 \
  python scripts/run_ours.py -m DDRM -d sports --epochs 100 \
    --stopping-step 10
leg /tmp/leg_slmrec_sports.done 7200 \
  python scripts/run_ours.py -m SLMRec -d sports --epochs 200 \
    --stopping-step 15

echo "OUR R5B QUEUE DONE $(date)"
