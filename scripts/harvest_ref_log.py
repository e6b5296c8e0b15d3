#!/usr/bin/env python
"""Harvest best-so-far metrics from a (possibly partial) reference log.

When a reference run exceeds its queue timeout, run_reference.py is killed
before it can write result.json — but the reference logs a full valid+test
metric block at every eval epoch (`src/common/trainer.py:274-332`), so the
best-valid-so-far and its test-upon-valid are recoverable from the log.
Writes the same result.json schema with "partial": true.

Usage:
    python scripts/harvest_ref_log.py ref_runs/GenRecV1-baby [--epochs-cap N]

--epochs-cap harvests "best valid within the first N epochs" to compare
against a same-budget run of ours.
"""

from __future__ import annotations

import argparse
import json
import os
import re

PAT = r"([A-Za-z_%]+@\d+)\s*:\s*([0-9.]+)"


def parse_blocks(text):
    """Yield (epoch, valid_dict, test_dict) per eval epoch."""
    # trainer logs: "epoch N evaluating [time: ..]" then "valid result:" block
    # then "test result:" block (test evaluated every eval epoch)
    chunks = re.split(r"epoch (\d+) evaluating", text)
    for i in range(1, len(chunks) - 1, 2):
        epoch = int(chunks[i])
        body = chunks[i + 1]
        vpos = body.find("valid result")
        tpos = body.find("test result")
        if vpos < 0 or tpos < 0:
            continue
        # bound each block at the next INFO stanza to avoid bleeding into
        # the following epoch's training line
        valid = dict(re.findall(PAT, body[vpos:tpos]))
        tail = body[tpos:]
        stop = tail.find("epoch ")
        test = dict(re.findall(PAT, tail[: stop if stop > 0 else None]))
        if valid:
            yield epoch, valid, test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--epochs-cap", type=int, default=None)
    ap.add_argument("--valid-metric", default="recall@20")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    run_dir = args.run_dir.rstrip("/")
    result_path = os.path.join(run_dir, "result.json")
    if os.path.exists(result_path) and not args.force:
        print(f"{result_path} already exists (complete run) — use --force")
        return

    logdir = os.path.join(run_dir, "log")
    if os.path.isdir(logdir):
        logs = sorted(
            (os.path.join(logdir, f) for f in os.listdir(logdir)),
            key=os.path.getmtime,
        )
    else:
        # run dir lost (e.g. VM restart before fsync) but the queue's stdout
        # capture <run_dir>.out carries the same INFO lines — harvest that
        logs = [run_dir + ".out"]
    text = open(logs[-1]).read()

    best = None
    n_seen = 0
    for epoch, valid, test in parse_blocks(text):
        if args.epochs_cap is not None and epoch >= args.epochs_cap:
            break
        n_seen = max(n_seen, epoch + 1)
        score = float(valid.get(args.valid_metric, "nan"))
        if best is None or score > best[0]:
            best = (score, epoch, valid, test)

    if best is None:
        print(f"no eval blocks found in {logs[-1]}")
        return

    model_ds = os.path.basename(run_dir)
    out = {
        "model": model_ds.split("-")[0],
        "dataset": model_ds.split("-")[1] if "-" in model_ds else "?",
        "partial": True,
        "epochs_budget": n_seen,
        "best_epoch": best[1],
        "wall_s": None,
        "best_valid": best[2],
        "test_upon_valid": best[3],
        "log": logs[-1],
    }
    with open(result_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"WROTE {result_path}: best {args.valid_metric}={best[0]:.4f} "
        f"at epoch {best[1]} (of {n_seen} evaluated)"
    )


if __name__ == "__main__":
    main()
