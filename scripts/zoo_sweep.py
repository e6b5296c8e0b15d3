#!/usr/bin/env python
"""Zoo-wide real-scale smoke sweep.

Runs every model in the zoo end-to-end (`python main.py`) on a real-scale
dataset (default: baby — 19,445 users x 7,050 items synthetic fallback) for a
couple of epochs on the actual accelerator, and records pass/fail, wall time
and the final valid Recall@20 into ``comparison_logs/zoo_sweep_<ds>.json``.

This is the TPU-scale counterpart of the reference's per-model ``verify_*.py``
smoke scripts (/root/reference/verify_diffrec.py:13-65 etc.), which only ever
exercised tiny CPU mocks: here every model must compile and run at catalog
scale on device.

Usage:
    python scripts/zoo_sweep.py [--dataset baby] [--epochs 2] [--timeout 900]
    python scripts/zoo_sweep.py --models DiffMM GUME   # subset
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_MODELS = [
    # classic / graph
    "BPR", "VBPR", "LightGCN", "LayerGCN", "SELFCFED_LGN", "ItemKNNCBF",
    # multimodal graph
    "BM3", "FREEDOM", "GUME", "LATTICE", "MGCN", "LGMRec", "MMGCN", "GRCN",
    "DualGNN", "DRAGON", "COHESION", "SMORE", "PGL", "SLMRec", "MVGAE", "DAMRS",
    # diffusion
    "DiffRec", "DiffMM", "DDRM", "MCDRec", "CoDMR", "LD4MRec", "DiffGraph", "MVDiff",
    # flip diffusion
    "GenRecV1", "GenRecBM3",
    # rectified flow
    "RFMRec", "RFGUME", "RFGUMETime", "RFBM3", "RFFREEDOM", "RFLATTICE", "RFMGCN",
    "RFMMGCN", "RFVBPR", "RFLGMRec", "RFDualGNN", "RFGRCN", "RFCOHESION",
    "RFSMORE", "RFPGL", "RFBPR_remove", "RFLightGCN_remove", "RFLayerGCN_remove",
]


def run_one(model: str, dataset: str, epochs: int, timeout: int,
            stopping_step: int | None = None):
    cfg = {"hyper_parameters": ["seed"], "save_recommended_topk": False}
    if stopping_step is not None:
        cfg["stopping_step"] = stopping_step
    cmd = [
        sys.executable, "main.py", "-m", model, "-d", dataset,
        "--epochs", str(epochs),
        # pin the hyper-grid to one combo (seed only); other list-valued
        # YAML keys scalarize to their first entry
        "--config-json", json.dumps(cfg),
    ]
    t0 = time.time()
    try:
        res = subprocess.run(
            cmd, cwd=ROOT, capture_output=True, text=True, timeout=timeout
        )
        out = res.stdout + res.stderr
        dt = time.time() - t0
        ok = res.returncode == 0 and "BEST" in out
        # anchor the parse to the final BEST block's Valid section —
        # positional indexing over all matches silently records a mid-epoch
        # or test value if logging is ever reordered
        valid_r20 = test_r20 = test_n20 = None
        if ok:
            best = out[out.rfind("BEST"):]
            tpos = best.find("Test:")
            m = re.search(r"recall@20: ([0-9.]+)", best[: tpos if tpos > 0 else None])
            valid_r20 = float(m.group(1)) if m else None
            if tpos > 0:
                mt = re.search(r"(?<![A-Za-z_%])recall@20: ([0-9.]+)", best[tpos:])
                test_r20 = float(mt.group(1)) if mt else None
                mn = re.search(r"(?<![A-Za-z_%])ndcg@20: ([0-9.]+)", best[tpos:])
                test_n20 = float(mn.group(1)) if mn else None
        tail = "" if ok else out[-2000:]
        return {
            "ok": ok, "seconds": round(dt, 1),
            "valid_recall@20": valid_r20,
            "test_recall@20": test_r20, "test_ndcg@20": test_n20,
            "epochs_budget": epochs,
            "returncode": res.returncode, "tail": tail,
        }
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": timeout, "valid_recall@20": None,
                "returncode": None, "tail": "TIMEOUT"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--stopping-step", type=int, default=None,
                    help="early-stopping patience override (config default 25)")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--models", nargs="*", default=None)
    ap.add_argument("--tag", default=None,
                    help="output-file tag, e.g. 'converged' -> "
                         "zoo_sweep_<ds>_converged.json")
    ap.add_argument("--rerun", action="store_true",
                    help="re-run models even if the journal has an OK entry "
                         "(e.g. RF hosts after a stopping-step change)")
    args = ap.parse_args()

    models = args.models or ALL_MODELS
    tag = f"_{args.tag}" if args.tag else ""
    out_path = os.path.join(
        ROOT, "comparison_logs", f"zoo_sweep_{args.dataset}{tag}.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    for i, model in enumerate(models):
        if model in results and results[model]["ok"] and not args.rerun:
            print(f"[{i+1}/{len(models)}] {model}: cached OK", flush=True)
            continue
        print(f"[{i+1}/{len(models)}] {model} ...", flush=True)
        results[model] = run_one(model, args.dataset, args.epochs, args.timeout,
                                 args.stopping_step)
        status = "OK" if results[model]["ok"] else "FAIL"
        print(
            f"    {status} in {results[model]['seconds']}s "
            f"recall@20={results[model]['valid_recall@20']}", flush=True,
        )
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
            f.write("\n")

    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"\n{n_ok}/{len(results)} models OK — {out_path}")


if __name__ == "__main__":
    main()
