#!/usr/bin/env python
"""Materialize the deterministic synthetic dataset to real on-disk files.

Writes the exact file set the reference package consumes
(`/root/reference/GenMMRec/src/configs/dataset/baby.yaml:1-16`):

    data/<ds>/<ds>.inter        TSV: userID itemID rating timestamp x_label
    data/<ds>/image_feat.npy    (n_items, v_dim) float32
    data/<ds>/text_feat.npy     (n_items, t_dim) float32
    data/<ds>/user_graph_dict.npy   {user: [[neighbors], [weights]]}

The arrays come from the SAME deterministic synthetic generators the TPU
framework falls back to when the files are absent
(genmmrec_tpu/data/dataset.py:_generate_synthetic, data/features.py), so
after export BOTH frameworks — ours and the reference torch code — read
identical bytes. This is the substrate for the cross-implementation
converged-parity experiment (docs/PARITY_RESULTS.md).

Usage:
    python scripts/export_synthetic_dataset.py [--dataset baby] [--uu-topk 20]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="baby")
    ap.add_argument("--uu-topk", type=int, default=200)
    ap.add_argument("--force", action="store_true")
    ap.add_argument(
        "--skip-uu", action="store_true",
        help="skip the user-user co-occurrence graph (only DualGNN/DRAGON "
        "read it; at elec scale it dominates export time)",
    )
    args = ap.parse_args()

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.dataset import RecDataset

    config = Config("BPR", args.dataset, {"save_recommended_topk": False})
    out_dir = os.path.join(ROOT, "data", args.dataset)
    inter_path = os.path.join(out_dir, config["inter_file_name"] or f"{args.dataset}.inter")
    if os.path.isfile(inter_path) and not args.force:
        print(f"{inter_path} already exists; use --force to overwrite")
        return
    os.makedirs(out_dir, exist_ok=True)

    ds = RecDataset(config)
    if ds.labels is None:
        raise SystemExit("dataset loaded from disk already — nothing to export")

    users = np.asarray(ds.table.users)
    items = np.asarray(ds.table.items)
    labels = np.asarray(ds.labels)
    times = (
        np.asarray(ds.table.times)
        if ds.table.times is not None
        else np.arange(len(users), dtype=np.float64)
    )
    # synthetic ratings: mostly 4-5 stars like Amazon reviews, deterministic
    rng = np.random.default_rng(0x7A71)
    ratings = rng.choice([3.0, 4.0, 5.0], size=len(users), p=[0.15, 0.35, 0.5])

    with open(inter_path, "w") as f:
        f.write("userID\titemID\trating\ttimestamp\tx_label\n")
        for u, i, r, t, x in zip(users, items, ratings, times, labels):
            f.write(f"{u}\t{i}\t{r:.1f}\t{int(t)}\t{x}\n")
    print(f"wrote {inter_path}: {len(users)} rows, "
          f"{ds.user_num} users x {ds.item_num} items")

    # modal features from the same generator data/features.py uses
    import zlib

    name_hash = zlib.crc32(str(args.dataset).encode())
    frng = np.random.default_rng(0xFEA7 ^ name_hash % (2**31))
    v_dim = int(config["synthetic_v_feat_dim"] or 4096)
    t_dim = int(config["synthetic_t_feat_dim"] or 384)
    v_feat = np.abs(frng.normal(0.0, 0.3, (ds.item_num, v_dim))).astype(np.float32)
    t_feat = frng.normal(0.0, 0.5, (ds.item_num, t_dim)).astype(np.float32)
    np.save(os.path.join(out_dir, config["vision_feature_file"] or "image_feat.npy"), v_feat)
    np.save(os.path.join(out_dir, config["text_feature_file"] or "text_feat.npy"), t_feat)
    print(f"wrote image_feat {v_feat.shape}, text_feat {t_feat.shape}")

    if args.skip_uu:
        print("skipped user_graph_dict (--skip-uu)")
    else:
        from genmmrec_tpu.preprocessing.pipeline import save_user_graph_dict

        uu_path = os.path.join(
            out_dir, config["user_graph_dict_file"] or "user_graph_dict.npy"
        )
        save_user_graph_dict(inter_path, uu_path, top_k=args.uu_topk)
        print(f"wrote {uu_path}")


if __name__ == "__main__":
    main()
