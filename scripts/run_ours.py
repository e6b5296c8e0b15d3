#!/usr/bin/env python
"""Run OUR framework end-to-end (python main.py, real TPU) on the exported
dataset with the same epoch budget as scripts/run_reference.py, and harvest
the final BEST metrics to our_runs/<model>-<ds>/result.json for
docs/PARITY_RESULTS.md.

Usage:
    python scripts/run_ours.py -m BPR -d baby --epochs 100 --stopping-step 10
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--dataset", "-d", default="baby")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--stopping-step", type=int, default=10)
    ap.add_argument("--config-json", default="{}")
    ap.add_argument("--seed", type=int, default=None,
                    help="override the config seed; results land in "
                         "our_runs/<model>-<ds>-seed<seed>/")
    ap.add_argument("--tag", default=None,
                    help="suffix the run dir: our_runs/<model>-<ds>-<tag>/ "
                         "(e.g. 'struct' for the structured-feature ablation)")
    args = ap.parse_args()

    cfg = {
        "hyper_parameters": ["seed"],
        "stopping_step": args.stopping_step,
        "save_recommended_topk": False,
    }
    cfg.update(json.loads(args.config_json))
    if args.seed is not None:
        cfg["seed"] = [args.seed]
    cmd = [
        sys.executable, "main.py", "-m", args.model, "-d", args.dataset,
        "--epochs", str(args.epochs), "--config-json", json.dumps(cfg),
    ]
    t0 = time.time()
    res = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    dt = time.time() - t0
    out = res.stdout + res.stderr

    tag = f"-seed{args.seed}" if args.seed is not None else ""
    if args.tag:
        tag += f"-{args.tag}"
    run_dir = os.path.join(ROOT, "our_runs", f"{args.model}-{args.dataset}{tag}")
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "stdout.log"), "w") as f:
        f.write(out)

    best = out[out.rfind("BEST"):]
    tpos = best.find("Test:")
    pat = r"([A-Za-z_%2]+@\d+)\s*:\s*([0-9.]+)"
    valid = dict(re.findall(pat, best[:tpos if tpos > 0 else None]))
    test = dict(re.findall(pat, best[tpos:])) if tpos > 0 else {}
    result = {
        "model": args.model, "dataset": args.dataset,
        "epochs_budget": args.epochs, "wall_s": round(dt, 1),
        "returncode": res.returncode,
        "best_valid": valid, "test_upon_valid": test,
    }
    path = os.path.join(run_dir, "result.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("WROTE", path)
    print(json.dumps({k: result[k] for k in ("model", "wall_s", "returncode")}),
          "valid recall@20:", valid.get("recall@20"))


if __name__ == "__main__":
    main()
