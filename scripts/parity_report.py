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

MODELS = [
    "BPR", "LightGCN", "VBPR", "BM3", "GenRecV1", "DiffMM",
    # round-3 adjudication cohort (VERDICT r2 item 3)
    "SLMRec", "GRCN", "DualGNN", "MVGAE", "CoDMR", "MVDiff",
]

# preferred tagged run pair when the base pair is budget-mismatched:
# GenRecV1's base ref run died at epoch 18 of 50; the -ep60 pair re-ran the
# reference at a 60-epoch budget (reached epoch 35, harvested partial) and
# ours to the full 60, giving a longer same-budget window (exact valid
# match 0.0355 at the last common epoch, docs/ROUND3.md)
PAIR_TAGS = {"GenRecV1": "-ep60"}
METRICS = ["recall@20", "ndcg@20", "recall@10", "ndcg@10"]


def load(run_dir, model, dataset="baby", tag=""):
    path = os.path.join(ROOT, run_dir, f"{model}-{dataset}{tag}", "result.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def seed_values(run_dir, model, metric, dataset="baby"):
    """All test-upon-valid values of `metric` across the base run (seed 999)
    and any -seed<N> tagged runs. Returns a list of floats."""
    vals = []
    base = os.path.join(ROOT, run_dir)
    if not os.path.isdir(base):
        return vals
    for d in sorted(os.listdir(base)):
        if d == f"{model}-{dataset}" or (
            d.startswith(f"{model}-{dataset}-seed") and "-struct" not in d
        ):
            path = os.path.join(base, d, "result.json")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                r = json.load(f)
            if r.get("partial"):
                # harvested from a timed-out log — different epoch budget;
                # mixing it into the band would compare unlike runs
                continue
            v = r.get("test_upon_valid", {}).get(metric)
            if v is not None:
                vals.append(float(v))
    return vals


def band_ok(o, r, ov, rv):
    """Seed-band acceptance: the two implementations' seed ranges overlap,
    or the pointwise |o-r| is within the larger PER-IMPLEMENTATION spread.
    (The previous pooled-range check was tautological — the pooled band
    always contains both o and r, so it always passed.)"""
    if len(ov) < 2 or len(rv) < 2:
        return False
    overlap = max(min(ov), min(rv)) <= min(max(ov), max(rv))
    spread = max(max(ov) - min(ov), max(rv) - min(rv))
    return overlap or abs(float(o) - float(r)) <= spread


def fmt(x):
    return f"{float(x):.4f}" if x is not None else "—"


def valid_trajectory(model, side, dataset="baby"):
    """Per-epoch valid_score list parsed from the run's own trainer log
    (`epoch N evaluating [... valid_score: X]`). Sources, newest first:
    <side>_runs/<m>-<ds>/log/*.log, <side>_runs/<m>-<ds>/stdout.log,
    <side>_runs/<m>-<ds>.out (live queue redirect)."""
    import re

    base = os.path.join(ROOT, f"{side}_runs", f"{model}-{dataset}")
    candidates = []
    logdir = os.path.join(base, "log")
    if os.path.isdir(logdir):
        candidates += sorted(
            (os.path.join(logdir, f) for f in os.listdir(logdir)),
            key=os.path.getmtime, reverse=True,
        )
    candidates.append(os.path.join(base, "stdout.log"))
    candidates.append(base + ".out")
    for path in candidates:
        if not os.path.exists(path):
            continue
        text = open(path, errors="replace").read()
        pairs = re.findall(
            r"epoch (\d+) evaluating \[time: [0-9.]+s, valid_score: ([0-9.]+)",
            text,
        )
        if pairs:
            traj = {}
            for e, v in pairs:
                traj[int(e)] = float(v)
            return [traj.get(i) for i in range(max(traj) + 1)]
    return None


def _capped_ours(model, cap, dataset="baby", tag=""):
    """Our test-upon-best-valid restricted to the first `cap` epochs, parsed
    from our own trainer log (same format as the reference's)."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from harvest_ref_log import parse_blocks

    path = os.path.join(
        ROOT, "our_runs", f"{model}-{dataset}{tag}", "stdout.log"
    )
    if not os.path.exists(path):
        return None
    best = None
    for epoch, valid, test in parse_blocks(open(path, errors="replace").read()):
        if epoch >= cap:
            break
        s = float(valid.get("recall@20", "nan"))
        if best is None or s > best[0]:
            best = (s, test)
    return best[1] if best else None


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
        pair_tag = PAIR_TAGS.get(m, "")
        ours = load("our_runs", m, args.dataset, pair_tag)
        ref = load("ref_runs", m, args.dataset, pair_tag)
        if pair_tag and not (ours and ref):  # tagged pair incomplete
            ours = load("our_runs", m, args.dataset)
            ref = load("ref_runs", m, args.dataset)
            pair_tag = ""
        cap_note = ""
        if ours and ref and ref.get("partial"):
            # the reference run was killed by its queue timeout after
            # epochs_budget epochs — re-derive OUR best-valid within the
            # same epoch budget from our own trainer log so the comparison
            # is same-budget, and say so in the table
            cap = int(ref.get("epochs_budget") or 0)
            capped = _capped_ours(m, cap, args.dataset, pair_tag)
            if capped is not None:
                ours = dict(ours, test_upon_valid=capped)
                cap_note = f" (both capped @{cap} epochs — ref timed out)"
        for metric in METRICS:
            o = ours and ours.get("test_upon_valid", {}).get(metric)
            r = ref and ref.get("test_upon_valid", {}).get(metric)
            if o is None and r is None:
                continue
            if o is not None and r is not None and float(r) > 0:
                rel = (float(o) - float(r)) / float(r)
                if abs(rel) <= 0.01:
                    verdict = "✅"
                elif rel > 0:
                    verdict = "⬆️ beats"
                else:
                    # outside 1% at the base seed: check the across-seed
                    # spread (torch and jax draw different RNG streams by
                    # construction, so pointwise equality is ill-posed)
                    ov = seed_values("our_runs", m, metric, args.dataset)
                    rv = seed_values("ref_runs", m, metric, args.dataset)
                    if band_ok(o, r, ov, rv):
                        verdict = "✅ (within seed band)"
                    else:
                        verdict = "❌"
                rel_s = f"{rel:+.1%}"
            else:
                rel_s, verdict = "—", "pending"
            lines.append(
                f"| {m}{cap_note} | {metric} | {fmt(r)} | {fmt(o)} | {rel_s} | {verdict} |"
            )
        if ours and ref:
            wall_rows.append(
                (m, ref.get("wall_s"), ours.get("wall_s"),
                 ref.get("epochs_budget"), ours.get("epochs_budget"))
            )

    band_rows = []
    for m in MODELS:
        for metric in ("recall@20", "ndcg@20"):
            ov = seed_values("our_runs", m, metric, args.dataset)
            rv = seed_values("ref_runs", m, metric, args.dataset)
            if len(ov) >= 2 or len(rv) >= 2:
                band_rows.append((m, metric, ov, rv))
    if band_rows:
        lines += [
            "",
            "## Across-seed spread",
            "",
            "torch and jax necessarily draw different RNG streams, so the",
            "across-seed spread of each implementation is the yardstick for",
            "the pointwise deltas above (seeds 999, 1000, 2022).",
            "",
            "| Model | Metric | Reference seeds | Ours seeds | Ranges overlap / Δ ≤ impl spread? |",
            "|---|---|---|---|---|",
        ]
        for m, metric, ov, rv in band_rows:
            ref_res = load("ref_runs", m, args.dataset)
            note = (
                " (ref partial — budgets differ)"
                if ref_res and ref_res.get("partial") else ""
            )
            o_s = ", ".join(f"{v:.4f}" for v in ov) or "—"
            r_s = (", ".join(f"{v:.4f}" for v in rv) or "—") + note
            if ov and rv and len(ov) >= 2 and len(rv) >= 2:
                ok = "✅" if band_ok(ov[0], rv[0], ov, rv) else "❌"
            else:
                ok = "—"
            lines.append(f"| {m} | {metric} | {r_s} | {o_s} | {ok} |")

    traj_rows = []
    for m in MODELS:
        ot = valid_trajectory(m, "our", args.dataset)
        rt = valid_trajectory(m, "ref", args.dataset)
        if ot and rt and len(ot) >= 5 and len(rt) >= 5:
            traj_rows.append((m, ot, rt))
    if traj_rows:
        lines += [
            "",
            "## Per-epoch validation trajectories",
            "",
            "Same-epoch valid Recall@20 of both implementations on the",
            "identical data — evidence that the TRAINING DYNAMICS match, not",
            "just the converged endpoint (different RNG streams by",
            "construction, so pointwise deltas within a few % are the",
            "expected band).",
            "",
        ]
        for m, ot, rt in traj_rows:
            n = min(len(ot), len(rt))
            step = 1 if n <= 12 else max(1, n // 12)
            epochs = list(range(0, n, step))
            if epochs[-1] != n - 1:
                epochs.append(n - 1)
            lines.append(f"**{m}** (epochs 0–{n - 1} shown):")
            lines.append("")
            lines.append("| epoch | " + " | ".join(str(e) for e in epochs) + " |")
            lines.append("|---|" + "---|" * len(epochs))
            lines.append(
                "| reference | "
                + " | ".join(fmt(rt[e]) for e in epochs) + " |"
            )
            lines.append(
                "| ours | "
                + " | ".join(fmt(ot[e]) for e in epochs) + " |"
            )
            lines.append("")

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
