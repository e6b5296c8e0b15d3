#!/bin/bash
# Batch RF-vs-base comparison (parity with reference run_rf_comparison.sh)
GREEN='\033[0;32m'; NC='\033[0m'
DATASET=${1:-baby}
MODELS=${2:-all}
echo -e "${GREEN}[INFO]${NC} RF comparison on $DATASET (models: $MODELS)"
python run_rf_models.py --dataset "$DATASET" --models $MODELS --use_rf true false
python compare_results.py --log-dir log --dataset "$DATASET"
