#!/usr/bin/env python3
"""Staged RF hyper-parameter search (3+3+3 instead of 3×3×3).

Parity with reference `src/run_rf_staged_search.py`:
  stage 1: search rf_loss_weight           {0.2, 0.4, 0.6}
  stage 2: fix best, search rf_learning_rate {1e-4, 3e-4, 1e-3}
  stage 3: fix both, search rf_inference_mix_ratio {0.02, 0.05, 0.1}
Best values per stage are read back from the run logs (recall@20) and
persisted to ``rf_staged_search_state.json``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_FILE = os.path.join(REPO, "rf_staged_search_state.json")

STAGES = {
    1: ("rf_loss_weight", [0.2, 0.4, 0.6]),
    2: ("rf_learning_rate", [1e-4, 3e-4, 1e-3]),
    3: ("rf_inference_mix_ratio", [0.02, 0.05, 0.1]),
}


def _load_state():
    return json.load(open(STATE_FILE)) if os.path.exists(STATE_FILE) else {}


def _save_state(s):
    json.dump(s, open(STATE_FILE, "w"), indent=2)


def _best_recall(model, dataset):
    best = 0.0
    for f in glob.glob(os.path.join(REPO, "log", f"{model}-{dataset}-*.log")):
        content = open(f, errors="ignore").read()
        for m in re.finditer(r"recall@20:\s*([\d.]+)", content):
            best = max(best, float(m.group(1)))
    return best


def run_stage(model, dataset, stage, epochs=None):
    key, values = STAGES[stage]
    state = _load_state()
    fixed = state.get(f"{model}:{dataset}", {})
    results = {}
    for v in values:
        overrides = {**fixed, key: v, "hyper_parameters": []}
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(overrides, f)
            path = f.name
        cmd = [sys.executable, "main.py", "-m", model, "-d", dataset, "--config-json", path]
        if epochs:
            cmd += ["--epochs", str(epochs)]
        print(f"[stage {stage}] {model} {key}={v}")
        try:
            out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        finally:
            os.unlink(path)
        m = re.findall(r"recall@20:\s*([\d.]+)", out.stdout + out.stderr)
        results[v] = max((float(x) for x in m), default=0.0)
    best_v = max(results, key=results.get)
    print(f"[stage {stage}] best {key}={best_v} (recall@20={results[best_v]:.4f})")
    fixed[key] = best_v
    state[f"{model}:{dataset}"] = fixed
    _save_state(state)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--models", nargs="+", default=["RFGUME"])
    ap.add_argument("--stage", default="all")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    stages = [1, 2, 3] if args.stage == "all" else [int(args.stage)]
    for model in args.models:
        for st in stages:
            run_stage(model, args.dataset, st, args.epochs)
