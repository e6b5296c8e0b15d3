#!/bin/bash
# TPU queue O (waits for N): extend elec-scale validation beyond
# DiffRec/DiffMM — GenRecV1 (second north-star, flip diffusion over
# (B, 63001) binary vectors) and LD4MRec (few-step interaction-vector
# diffusion with SVD conditioning). Harness records errors honestly.
cd /root/repo
while kill -0 "$(cat /tmp/tpuqueueN.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
gate() { while [ -e /tmp/tpu_pause ]; do sleep 20; done; }
gate
timeout 7200 python scripts/elec_scale.py --models GenRecV1 --epochs 1
gate
timeout 7200 python scripts/elec_scale.py --models LD4MRec --epochs 1
echo "TPU R3O QUEUE DONE $(date)"
