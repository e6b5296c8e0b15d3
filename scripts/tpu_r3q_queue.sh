#!/bin/bash
# TPU queue Q: restart of queues O+P after the VM reset.
# 1. elec-scale GenRecV1 (second north-star at the largest scale)
# 2. sports-scale headline sweep, highest-value models first
# 3. elec-scale LD4MRec if time remains
cd /root/repo
echo $$ > /tmp/tpuqueueQ.pid
gate() { while [ -e /tmp/tpu_pause ]; do sleep 20; done; }

gate
timeout 2700 python scripts/elec_scale.py --models GenRecV1 --epochs 1

MODELS="DiffMM GenRecV1 DiffRec BM3 FREEDOM LightGCN BPR VBPR SLMRec \
GUME LATTICE MGCN LGMRec DDRM MCDRec RFGUME RFBM3 RFMRec"
for m in $MODELS; do
  gate
  timeout 1500 python scripts/zoo_sweep.py --dataset sports --tag r3 \
    --epochs 15 --stopping-step 25 --timeout 1400 --models $m
done

gate
timeout 2700 python scripts/elec_scale.py --models LD4MRec --epochs 1
echo "TPU R3Q QUEUE DONE $(date)"
