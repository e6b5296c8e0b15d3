"""Vectorized preprocessing primitives.

Behavioral parity with the reference notebooks, re-implemented as pure
functions over numpy/pandas (no O(n²) python loops):

- k-core filtering + dense reindex + temporal global split
  (`0rating2inter.ipynb`): iterate dropping users/items with < k
  interactions until fixpoint; quantile-of-timestamp 80/10/10 labels.
- per-user leave-out split (`1splitting.ipynb`): per user, last 20%
  (half valid, half test) by stored order; users with <10 interactions
  hold out exactly one valid + one test row.
- meta reindex (`2reindex-feat.ipynb`): map `asin` → itemID, drop
  unmapped, sort by itemID.
- text feature encoding (`3feat-encoder.ipynb`): title+brand+categories+
  description sentences → sentence embeddings. Uses a local
  `transformers` encoder when available; otherwise a deterministic
  feature-hashing encoder so the pipeline stays runnable offline.
- DualGNN u-u graph (`dualgnn-gen-u-u-matrix.py`): co-occurrence counts
  |items(u) ∩ items(v)| as a sparse A·Aᵀ instead of the reference's
  O(U²) set-intersection loop; per-user top-200 neighbor lists.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd


# ----------------------------------------------------------------------
def kcore_filter(
    df: pd.DataFrame,
    uid: str = "userID",
    iid: str = "itemID",
    min_u: int = 5,
    min_i: int = 5,
) -> pd.DataFrame:
    """Iterative k-core: drop users/items below the interaction floor until
    stable (`0rating2inter.ipynb` filter_by_k_core)."""
    df = df.dropna(subset=[uid, iid]).drop_duplicates(subset=[uid, iid])
    while True:
        u_counts = df[uid].value_counts()
        i_counts = df[iid].value_counts()
        bad_u = u_counts[u_counts < min_u].index
        bad_i = i_counts[i_counts < min_i].index
        if len(bad_u) == 0 and len(bad_i) == 0:
            return df.reset_index(drop=True)
        df = df[~df[uid].isin(bad_u) & ~df[iid].isin(bad_i)]


def _dense_reindex(df, uid, iid):
    """First-occurrence-order dense ids, like the notebook's dict build."""
    u_map = {k: i for i, k in enumerate(pd.unique(df[uid]))}
    i_map = {k: i for i, k in enumerate(pd.unique(df[iid]))}
    df = df.copy()
    df[uid] = df[uid].map(u_map).astype(int)
    df[iid] = df[iid].map(i_map).astype(int)
    return df, u_map, i_map


def rating2inter(
    ratings_csv: str,
    out_dir: str,
    dataset: str,
    min_u: int = 5,
    min_i: int = 5,
    splitting=(0.8, 0.1, 0.1),
) -> str:
    """Raw Amazon ratings CSV → k-core filtered, reindexed, time-split
    `<dataset>-indexed.inter` plus u/i id-mapping CSVs."""
    df = pd.read_csv(
        ratings_csv, names=["userID", "itemID", "rating", "timestamp"], header=None
    )
    df = df.dropna(subset=["userID", "itemID", "timestamp"])
    df = df.drop_duplicates(subset=["userID", "itemID", "timestamp"])
    df = kcore_filter(df, min_u=min_u, min_i=min_i)
    df, u_map, i_map = _dense_reindex(df, "userID", "itemID")

    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(list(u_map.items()), columns=["user_id", "userID"]).to_csv(
        os.path.join(out_dir, "u_id_mapping.csv"), sep="\t", index=False
    )
    pd.DataFrame(list(i_map.items()), columns=["asin", "itemID"]).to_csv(
        os.path.join(out_dir, "i_id_mapping.csv"), sep="\t", index=False
    )

    ratios = np.array([r for r in splitting if r > 0], dtype=np.float64)
    ratios = ratios / ratios.sum()
    qs = np.quantile(df["timestamp"], np.cumsum(ratios)[:-1])
    ts = df["timestamp"].to_numpy()
    label = np.zeros(len(df), np.int64)
    label[ts >= qs[0]] = 1
    label[ts >= qs[1]] = 2
    df["x_label"] = label
    df = df[["userID", "itemID", "rating", "timestamp", "x_label"]]
    out = os.path.join(out_dir, f"{dataset}-indexed.inter")
    df.to_csv(out, sep="\t", index=False)
    return out


# ----------------------------------------------------------------------
def per_user_split(inter_file: str, out_file: Optional[str] = None, seed: int = 999) -> str:
    """Global-time labels → per-user 80/10/10 labels (`1splitting.ipynb`):
    shuffle, group by user, last rows become valid/test (1 each when the
    user has <10 interactions, else 10%+10%)."""
    df = pd.read_csv(inter_file, sep="\t")
    rng = np.random.default_rng(seed)
    df = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    df = df.sort_values(by=["userID"], kind="stable").reset_index(drop=True)

    counts = df.groupby("userID", sort=True).size().to_numpy()
    labels = np.zeros(len(df), np.int64)
    pos = 0
    for n in counts:
        if n < 10:
            n_val, n_test = 1, 1
        else:
            vt = int(n * 0.2)
            n_val = vt // 2
            n_test = vt - n_val
        labels[pos + n - n_val - n_test : pos + n - n_test] = 1
        labels[pos + n - n_test : pos + n] = 2
        pos += n
    df["x_label"] = labels
    out_file = out_file or inter_file[: -len(".inter")] + "-v4.inter"
    df.to_csv(out_file, sep="\t", index=False)
    return out_file


# ----------------------------------------------------------------------
def reindex_meta(meta_file: str, i_mapping_csv: str, out_csv: str) -> pd.DataFrame:
    """Map meta `asin` to dense itemIDs, drop unmapped, sort, dump
    (`2reindex-feat.ipynb`). Supports .json.gz (one record per line) and
    .csv meta files."""
    if meta_file.endswith((".json.gz", ".json")):
        import ast
        import gzip

        opener = gzip.open if meta_file.endswith(".gz") else open
        records = []
        with opener(meta_file, "rt") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    records.append(ast.literal_eval(line))
                except (ValueError, SyntaxError):
                    import json

                    records.append(json.loads(line))
        meta = pd.DataFrame.from_records(records)
    else:
        meta = pd.read_csv(meta_file)

    mapping = pd.read_csv(i_mapping_csv, sep="\t")
    map_dict = dict(zip(mapping["asin"], mapping["itemID"]))
    meta["itemID"] = meta["asin"].map(map_dict)
    meta = meta.dropna(subset=["itemID"])
    meta["itemID"] = meta["itemID"].astype("int64")
    meta = meta.sort_values(by=["itemID"])
    cols = ["itemID"] + [c for c in meta.columns if c != "itemID"]
    meta = meta[cols]
    meta.to_csv(out_csv, index=False)
    return meta


# ----------------------------------------------------------------------
def _hashing_encoder(sentences, dim: int = 384, seed: int = 0) -> np.ndarray:
    """Deterministic offline fallback: token feature hashing + tf weighting,
    L2-normalized. Keeps the full pipeline runnable with zero downloads."""
    import zlib

    out = np.zeros((len(sentences), dim), np.float32)
    for i, sen in enumerate(sentences):
        for tok in sen.lower().split():
            # crc32, not hash(): python's hash is randomized per process
            h = zlib.crc32(f"{tok}\x00{seed}".encode())
            out[i, h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-12)


def _meta_sentences(df: pd.DataFrame) -> list:
    """title + brand + first category chain + description (`3feat-encoder`)."""
    import ast

    sentences = []
    for _, row in df.iterrows():
        sen = str(row.get("title", " ") or " ") + " " + str(row.get("brand", " ") or " ") + " "
        cates = row.get("categories", None)
        if isinstance(cates, str):
            try:
                cates = ast.literal_eval(cates)
            except (ValueError, SyntaxError):
                cates = None
        if isinstance(cates, list) and cates and isinstance(cates[0], list):
            sen += " ".join(str(c) for c in cates[0]) + " "
        sen += str(row.get("description", " ") or " ")
        sentences.append(sen.replace("\n", " "))
    return sentences


def encode_text_features(
    meta_csv: str, out_npy: str, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"
) -> np.ndarray:
    """Encode item text to `text_feat.npy` ordered by itemID. Tries a local
    transformers checkpoint (mean-pooled last hidden state, the MiniLM
    recipe); falls back to feature hashing when no model is cached."""
    df = pd.read_csv(meta_csv).sort_values(by=["itemID"])
    ids = df["itemID"].to_numpy()
    assert ids[-1] == len(ids) - 1, "meta must cover a dense 0..n-1 itemID range"
    sentences = _meta_sentences(df)

    feats = None
    try:  # transformers is baked in; the checkpoint may not be cached
        import torch
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
        mdl = AutoModel.from_pretrained(model_name, local_files_only=True)
        mdl.eval()
        chunks = []
        with torch.no_grad():
            for s in range(0, len(sentences), 64):
                batch = tok(
                    sentences[s : s + 64],
                    padding=True,
                    truncation=True,
                    max_length=256,
                    return_tensors="pt",
                )
                hidden = mdl(**batch).last_hidden_state
                mask = batch["attention_mask"].unsqueeze(-1).float()
                emb = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
                chunks.append(torch.nn.functional.normalize(emb, dim=1).numpy())
        feats = np.concatenate(chunks, axis=0).astype(np.float32)
    except Exception:
        feats = _hashing_encoder(sentences)

    np.save(out_npy, feats)
    return feats


# ----------------------------------------------------------------------
def build_user_graph_dict(
    inter_file: str,
    n_users: Optional[int] = None,
    top_k: int = 200,
    uid: str = "userID",
    iid: str = "itemID",
) -> Dict[int, list]:
    """DualGNN u-u co-occurrence graph: for each user, top-200 users by
    |shared train items| (`dualgnn-gen-u-u-matrix.py:14-106`).

    The reference's O(U²) pairwise set-intersection loop becomes a blocked
    sparse A·Aᵀ over the train interaction matrix."""
    df = pd.read_csv(inter_file, sep="\t")
    if n_users is None:
        n_users = int(df[uid].nunique())
    train = df[df["x_label"] == 0]
    users = train[uid].to_numpy(np.int64)
    items = train[iid].to_numpy(np.int64)
    n_items = int(df[iid].max()) + 1

    # CSR of the binary user-item matrix
    order = np.argsort(users, kind="stable")
    users_s, items_s = users[order], items[order]
    indptr = np.zeros(n_users + 1, np.int64)
    np.add.at(indptr, users_s + 1, 1)
    indptr = np.cumsum(indptr)

    # item → users inverted index
    order_i = np.argsort(items, kind="stable")
    items_i, users_i = items[order_i], users[order_i]
    iptr = np.zeros(n_items + 1, np.int64)
    np.add.at(iptr, items_i + 1, 1)
    iptr = np.cumsum(iptr)

    user_graph_dict: Dict[int, list] = {}
    block = 2048
    for lo in range(0, n_users, block):
        hi = min(lo + block, n_users)
        counts = np.zeros((hi - lo, n_users), np.int32)
        for u in range(lo, hi):
            row = counts[u - lo]
            for it in items_s[indptr[u] : indptr[u + 1]]:
                co = users_i[iptr[it] : iptr[it + 1]]
                row[co] += 1
            row[u] = 0
        for u in range(lo, hi):
            row = counts[u - lo]
            nz = int((row > 0).sum())
            k = min(nz, top_k)
            if k == 0:
                user_graph_dict[u] = [[], []]
                continue
            top = np.argpartition(row, -k)[-k:]
            top = top[np.argsort(row[top], kind="stable")[::-1]]
            user_graph_dict[u] = [top.tolist(), row[top].astype(np.float64).tolist()]
    return user_graph_dict


def save_user_graph_dict(inter_file: str, out_npy: str, top_k: int = 200) -> str:
    d = build_user_graph_dict(inter_file, top_k=top_k)
    np.save(out_npy, d, allow_pickle=True)
    return out_npy
