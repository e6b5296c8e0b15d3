#!/usr/bin/env python
"""RF-enhancement results comparison from saved logs.

Parity with reference `compare_results.py:17-50`: regex-extract
``recall@K`` / ``ndcg@K`` / ``precision@K`` style metrics from log files
(best value seen) and print a base-vs-RF comparison table with deltas.

Usage:
    python compare_results.py --pairs GUME:log/GUME-baby-*.log RFGUME:log/RFGUME-baby-*.log
    python compare_results.py --log-dir log --dataset baby
"""

from __future__ import annotations

import argparse
import glob
import os
import re
from typing import Dict

METRIC_PATTERNS = {
    name: rf"{name}\s*:\s*([\d.]+)"
    for name in [
        "recall@5", "recall@10", "recall@20", "recall@50",
        "ndcg@5", "ndcg@10", "ndcg@20", "ndcg@50",
        "precision@5", "precision@10", "precision@20",
        "map@10", "map@20",
    ]
}


def parse_log_file(log_file: str) -> Dict[str, float]:
    metrics: Dict[str, float] = {}
    if not os.path.exists(log_file):
        print(f"Warning: log file not found: {log_file}")
        return metrics
    content = open(log_file, "r", errors="ignore").read()
    for name, pattern in METRIC_PATTERNS.items():
        matches = re.findall(pattern, content, re.IGNORECASE)
        if matches:
            metrics[name] = max(float(m) for m in matches)
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="*", default=[], help="NAME:logglob entries")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--dataset", default="baby")
    args = ap.parse_args()

    entries = {}
    for pair in args.pairs:
        name, pattern = pair.split(":", 1)
        files = sorted(glob.glob(pattern))
        if files:
            entries[name] = parse_log_file(files[-1])
    if args.log_dir and not entries:
        for f in sorted(glob.glob(os.path.join(args.log_dir, f"*-{args.dataset}-*.log"))):
            name = os.path.basename(f).split("-")[0]
            entries[name] = parse_log_file(f)

    if not entries:
        print("Nothing to compare.")
        return

    try:
        import pandas as pd

        df = pd.DataFrame(entries).T
        # base vs RF deltas where both present
        for name in list(df.index):
            if name.startswith("RF") and name[2:] in df.index:
                base = df.loc[name[2:]]
                delta = (df.loc[name] - base) / base * 100.0
                df.loc[f"{name} Δ%"] = delta.round(2)
        print(df.to_string())
        df.to_csv("rf_comparison.csv")
        print("\nSaved rf_comparison.csv")
    except ImportError:
        for name, m in entries.items():
            print(name, m)


if __name__ == "__main__":
    main()
