#!/usr/bin/env python
"""Model comparison harness.

Parity with reference `compare_models.py:20-80`: run `python main.py`
subprocesses per model (2h timeout), save per-run logs under
``comparison_logs/``, parse the ``████Current BEST████`` / final BEST blocks
for valid/test metrics, and print a side-by-side comparison table.

Usage:
    python compare_models.py --models DiffMM RFMRec --dataset baby
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from datetime import datetime


def run_model(model_name: str, dataset: str = "baby", timeout: int = 7200, extra=None):
    print(f"\n{'=' * 60}\nTraining {model_name} on {dataset} ...\n{'=' * 60}\n")
    base_dir = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, "main.py", "-m", model_name, "-d", dataset] + (extra or [])
    try:
        result = subprocess.run(
            cmd, cwd=base_dir, capture_output=True, text=True, timeout=timeout
        )
        output = result.stdout + result.stderr
        os.makedirs("comparison_logs", exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        log_file = os.path.join("comparison_logs", f"{model_name}_{dataset}_{stamp}.log")
        with open(log_file, "w", encoding="utf-8") as f:
            f.write(output)
        print(f"{model_name} done; log: {log_file}")
        return parse_results(output), log_file
    except subprocess.TimeoutExpired:
        print(f"{model_name} timed out ({timeout}s)")
        return None, None
    except Exception as e:  # noqa: BLE001
        print(f"{model_name} failed: {e}")
        return None, None


def _parse_metric_block(text: str):
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"([A-Za-z_%]+@\d+):\s*([\d.]+)", text)
    }


def parse_results(output: str):
    """Parse the final BEST block into {'valid': {...}, 'test': {...}}."""
    best = None
    for pattern in (
        r"█████████████ BEST ████████████████(.*?)(?=\Z)",
        r"████Current BEST████:(.*?)(?=\n\n\n|\Z)",
    ):
        m = re.search(pattern, output, re.DOTALL)
        if m:
            best = m.group(1)
            break
    if best is None:
        return None
    valid_m = re.search(r"Valid:\s*(.*?)(?:,\nTest:|$)", best, re.DOTALL)
    test_m = re.search(r"Test:\s*(.*?)$", best, re.DOTALL)
    return {
        "valid": _parse_metric_block(valid_m.group(1)) if valid_m else {},
        "test": _parse_metric_block(test_m.group(1)) if test_m else {},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["DiffMM", "RFMRec"])
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    extra = ["--epochs", str(args.epochs)] if args.epochs else None
    results = {}
    for model in args.models:
        metrics, log = run_model(model, args.dataset, args.timeout, extra)
        if metrics:
            results[model] = metrics

    if not results:
        print("No results parsed.")
        return

    keys = sorted({k for r in results.values() for k in r["test"]})
    header = ["metric"] + list(results)
    print("\n" + "  ".join(f"{h:>16}" for h in header))
    for k in keys:
        row = [k] + [f"{results[m]['test'].get(k, float('nan')):.4f}" for m in results]
        print("  ".join(f"{c:>16}" for c in row))

    with open("comparison_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("\nSaved comparison_results.json")


if __name__ == "__main__":
    main()
