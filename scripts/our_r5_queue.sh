#!/bin/bash
# Round-5 our-side TPU queue — VERDICT r4 asks #3/#4/#5/#8:
#   (a) DiffMM elec re-measure post-remat (+ steady-state epoch split)
#   (b) GenRecV1 elec steady-state epoch split
#   (c) warm-compile-cache end-to-end reruns for the wall-clock table
#       (BPR's 0.8x row, plus LightGCN/CoDMR, the other <2x rows)
#   (d) GenRecV1 converged at sports; DDRM + SLMRec longer sports budgets
# Sequential: the chip is single-tenant. Each leg is skippable by marker.
cd /root/repo
echo $$ > /tmp/our_r5_queue.pid
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

# (a) DiffMM elec, 2 epochs -> remat verify + fit_s_per_epoch_steady
leg /tmp/leg_diffmm_elec.done 5400 \
  python scripts/elec_scale.py --models DiffMM --epochs 2

# (b) GenRecV1 elec, 2 epochs -> steady-state split
leg /tmp/leg_genrecv1_elec.done 7200 \
  python scripts/elec_scale.py --models GenRecV1 --epochs 2

# (c) warm-cache end-to-end reruns (persistent XLA cache already
#     populated by the r4 runs of the same shapes)
leg /tmp/leg_bpr_warm.done 2400 \
  python scripts/run_ours.py -m BPR -d baby --epochs 100 \
    --stopping-step 10 --tag warm
leg /tmp/leg_lightgcn_warm.done 2400 \
  python scripts/run_ours.py -m LightGCN -d baby --epochs 100 \
    --stopping-step 10 --tag warm
leg /tmp/leg_codmr_warm.done 3600 \
  python scripts/run_ours.py -m CoDMR -d baby --epochs 50 \
    --stopping-step 10 --tag warm

# (d) converged sports runs
leg /tmp/leg_genrecv1_sports.done 10800 \
  python scripts/run_ours.py -m GenRecV1 -d sports --epochs 100 \
    --stopping-step 10
leg /tmp/leg_ddrm_sports.done 7200 \
  python scripts/run_ours.py -m DDRM -d sports --epochs 100 \
    --stopping-step 10
leg /tmp/leg_slmrec_sports.done 7200 \
  python scripts/run_ours.py -m SLMRec -d sports --epochs 200 \
    --stopping-step 15

echo "OUR R5 QUEUE DONE $(date)"
