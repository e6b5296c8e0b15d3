#!/usr/bin/env python3
"""Batch RF-model training harness.

Parity with reference `src/run_rf_models.py:20-60`: per model/dataset config
dicts applied to the run, then `python main.py` subprocesses launched per
combination. TPU-native delta: configs are passed via a JSON overrides file
consumed by main.py (``--config-json``) instead of mutating the YAML tree on
disk.

Usage:
  python run_rf_models.py --dataset baby --models all
  python run_rf_models.py --dataset sports --models RFLGMRec RFBM3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

ALL_RF_MODELS = [
    "RFGUME", "RFBM3", "RFFREEDOM", "RFLGMRec", "RFLATTICE", "RFMGCN",
    "RFMMGCN", "RFDualGNN", "RFGRCN", "RFCOHESION", "RFSMORE", "RFPGL",
    "RFVBPR", "RFMRec", "RFBPR_remove", "RFLightGCN_remove",
    "RFLayerGCN_remove",
]

# per-model/dataset tuned overrides (reference MODEL_DATASET_CONFIGS)
MODEL_DATASET_CONFIGS = {
    "RFLGMRec": {
        "baby": {"n_hyper_layer": 1, "hyper_num": 4, "keep_rate": 0.5, "alpha": 0.3},
        "sports": {"n_hyper_layer": 1, "hyper_num": 4, "keep_rate": 0.4, "alpha": 0.6},
        "clothing": {"n_hyper_layer": 2, "hyper_num": 64, "keep_rate": 0.2, "alpha": 0.2},
    },
    "RFBM3": {
        "baby": {"n_layers": 1, "dropout": 0.3, "reg_weight": 0.1, "cl_weight": 2.0},
        "sports": {"n_layers": 1, "dropout": 0.5, "reg_weight": 0.1, "cl_weight": 2.0},
        "clothing": {"n_layers": 1, "dropout": 0.3, "reg_weight": 0.1, "cl_weight": 2.0},
    },
    "RFSMORE": {
        "baby": {"n_ui_layers": 4, "reg_weight": 1e-4, "cl_loss": 0.01,
                 "image_knn_k": 40, "text_knn_k": 15, "dropout_rate": 0.1},
        "sports": {"n_ui_layers": 3, "reg_weight": 1e-4, "cl_loss": 0.01,
                   "image_knn_k": 10, "text_knn_k": 10, "dropout_rate": 0.1},
    },
    "RFFREEDOM": {
        "baby": {"dropout": 0.9, "reg_weight": 1e-3},
        "sports": {"dropout": 0.8, "reg_weight": 1e-3},
    },
}


def run_one(model: str, dataset: str, use_rf: bool, epochs=None, timeout=7200):
    overrides = dict(MODEL_DATASET_CONFIGS.get(model, {}).get(dataset, {}))
    overrides["use_rf"] = use_rf
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False, prefix="rf_overrides_"
    ) as f:
        json.dump(overrides, f)
        path = f.name
    cmd = [sys.executable, "main.py", "-m", model, "-d", dataset, "--config-json", path]
    if epochs:
        cmd += ["--epochs", str(epochs)]
    print(f"[run_rf_models] {' '.join(cmd)}  overrides={overrides}")
    try:
        subprocess.run(cmd, cwd=os.path.dirname(os.path.abspath(__file__)), timeout=timeout)
    finally:
        os.unlink(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--models", nargs="+", default=["all"])
    ap.add_argument("--use_rf", nargs="+", default=["true"])
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    models = ALL_RF_MODELS if args.models == ["all"] else args.models
    datasets = ["baby", "sports", "clothing"] if args.dataset == "all" else [args.dataset]
    for dataset in datasets:
        for model in models:
            for flag in args.use_rf:
                run_one(model, dataset, flag.lower() == "true", args.epochs)


if __name__ == "__main__":
    main()
