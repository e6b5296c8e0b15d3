#!/bin/bash
# DiffMM vs RFMRec comparison (parity with reference run_comparison.sh)
DATASET=${1:-baby}
echo "=============================================="
echo "  DiffMM vs RFMRec comparison on $DATASET"
echo "=============================================="
python compare_models.py --models DiffMM RFMRec --dataset "$DATASET"
echo "Done."
