#!/bin/bash
# Converged zoo sweep (VERDICT r1 next #7): epochs 50 with early stopping,
# replacing the 2-epoch smoke table in docs/ZOO_RESULTS.md. Near-zero-suspect
# models and the ordering-assertion baselines run first so the high-value
# results land early; the sweep journal (comparison_logs/
# zoo_sweep_baby_converged.json) persists per model, so re-runs resume.
# Waits for the structured-ablation queue (the last TPU consumer) to finish.
cd /root/repo
while kill -0 "$(cat /tmp/ablation.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
PRIORITY="RFLayerGCN_remove VBPR RFVBPR RFMRec MVGAE ItemKNNCBF SMORE \
BPR LightGCN LayerGCN BM3 FREEDOM RFLightGCN_remove GUME"
python scripts/zoo_sweep.py --dataset baby --tag converged \
  --epochs 50 --stopping-step 5 --timeout 2700 --models $PRIORITY
python scripts/zoo_sweep.py --dataset baby --tag converged \
  --epochs 50 --stopping-step 5 --timeout 2700
echo "CONVERGED SWEEP DONE $(date)"
