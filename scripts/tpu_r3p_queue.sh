#!/bin/bash
# TPU queue P (waits for O): sports-scale lane (35,598 users x 18,357 items
# synthetic fallback) — headline subset across every family, 15-epoch
# budget. Fills the scaling story between baby (zoo 50/50 converged) and
# elec (DiffRec/DiffMM/GenRecV1 full-scale runs).
cd /root/repo
while kill -0 "$(cat /tmp/tpuqueueO.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
gate() { while [ -e /tmp/tpu_pause ]; do sleep 20; done; }
MODELS="BPR VBPR LightGCN BM3 FREEDOM GUME LATTICE MGCN LGMRec SLMRec \
DiffRec DiffMM DDRM MCDRec GenRecV1 RFGUME RFBM3 RFMRec"
for m in $MODELS; do
  gate
  python scripts/zoo_sweep.py --dataset sports --tag r3 \
    --epochs 15 --stopping-step 25 --timeout 2700 --models $m
done
echo "TPU R3P QUEUE DONE $(date)"
