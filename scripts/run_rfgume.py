#!/usr/bin/env python3
"""RFGUME training launcher with per-dataset tuned hyper-parameters.

Parity with reference `src/run_rfgume.py` — overrides passed via
``--config-json`` instead of rewriting the YAML on disk.

Usage: python scripts/run_rfgume.py --dataset baby|sports|clothing|all
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

DATASET_CONFIGS = {
    "baby": {"n_layers": 2, "bm_temp": 0.4, "um_loss": 0.01, "um_temp": 0.1, "vt_loss": 0.1},
    "sports": {"n_layers": 1, "bm_temp": 0.2, "um_loss": 0.01, "um_temp": 0.1, "vt_loss": 0.01},
    "clothing": {"n_layers": 1, "bm_temp": 0.2, "um_loss": 0.1, "um_temp": 0.2, "vt_loss": 0.001},
}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(dataset: str, epochs=None):
    overrides = DATASET_CONFIGS[dataset]
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(overrides, f)
        path = f.name
    cmd = [sys.executable, "main.py", "-m", "RFGUME", "-d", dataset, "--config-json", path]
    if epochs:
        cmd += ["--epochs", str(epochs)]
    print("[run_rfgume]", " ".join(cmd), overrides)
    try:
        subprocess.run(cmd, cwd=REPO)
    finally:
        os.unlink(path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    for ds in DATASET_CONFIGS if args.dataset == "all" else [args.dataset]:
        run(ds, args.epochs)
