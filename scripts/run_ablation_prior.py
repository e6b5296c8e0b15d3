#!/usr/bin/env python3
"""RF-GUME prior-guidance ablation.

Parity with reference `src/run_ablation_prior.py`: four configurations —
baseline (no guidance), user_only, cosine_only, both — launched over the
tuned per-dataset GUME hyper-parameters. Guidance strength is controlled via
``user_guidance_scale`` / ``cosine_guidance_scale`` (0 disables the term).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

from run_rfgume import DATASET_CONFIGS  # noqa: E402  (same directory)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ABLATIONS = {
    "baseline": {"user_guidance_scale": 0.0, "cosine_guidance_scale": 0.0},
    "user_only": {"user_guidance_scale": 0.2, "cosine_guidance_scale": 0.0},
    "cosine_only": {"user_guidance_scale": 0.0, "cosine_guidance_scale": 0.1},
    "both": {"user_guidance_scale": 0.2, "cosine_guidance_scale": 0.1},
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    base = DATASET_CONFIGS.get(args.dataset, {})
    for name, abl in ABLATIONS.items():
        overrides = {**base, **abl}
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(overrides, f)
            path = f.name
        print(f"[ablation:{name}] {overrides}")
        cmd = [sys.executable, "main.py", "-m", "RFGUME", "-d", args.dataset, "--config-json", path]
        if args.epochs:
            cmd += ["--epochs", str(args.epochs)]
        try:
            subprocess.run(cmd, cwd=REPO)
        finally:
            os.unlink(path)
