#!/usr/bin/env python
"""Diagnose SLMRec's early-epoch gap: eval quality at/near init.

Ref run on baby: epoch-0 valid R@20 = 0.0808 (features already informative
near init), peaks 0.1276 at epoch 1, then collapses to ~0.046 — the same
steady state ours reaches. Ours: 0.0012 after epoch 0. Loss parity with
copied params is pinned by tests/test_reference_parity_ext.py, so the
difference must be the init distribution or the first-epoch dynamics.

Evaluates recall@20 on the valid split for our model at INIT, and after
toggling individual init groups to probe which group kills the signal.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def recall20(scores, tr, gt, uniq):
    hits, total = 0.0, 0
    for row, u in enumerate(uniq):
        s = scores[row].copy()
        s[tr[u]] = -np.inf
        top = np.argpartition(-s, 20)[:20]
        g = set(gt[u])
        if not g:
            continue
        hits += len(g & set(top.tolist())) / len(g)
        total += 1
    return hits / max(total, 1)


def main():
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.models import get_model

    config = Config("SLMRec", "baby", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train, valid, test = ds.split()
    td = build_train_data(train)
    model = get_model("SLMRec")(config, td)

    v_users = np.asarray(valid.table.users)
    v_items = np.asarray(valid.table.items)
    t_users = np.asarray(train.table.users)
    t_items = np.asarray(train.table.items)
    uniq = np.unique(v_users)[:3000]
    gt = {u: v_items[v_users == u].tolist() for u in uniq}
    tr = {u: t_items[t_users == u].tolist() for u in uniq}

    params = model.init_params(jax.random.PRNGKey(999))

    def evaluate(p, label):
        all_u, all_i = model.compute(p)
        scores = np.asarray(all_u[np.asarray(uniq)] @ all_i.T)
        r = recall20(scores, tr, gt, uniq)
        print(f"{label:36s} recall@20 = {r:.4f}", flush=True)
        return r

    evaluate(params, "ours @ init")

    # feature towers alone: zero the id embeddings' contribution
    pz = dict(params)
    pz["embedding_item"] = params["embedding_item"] * 0.0
    evaluate(pz, "ours @ init, id-item tower zeroed")

    # scale check: report per-group norms to compare magnitudes
    for k, v in params.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                print(f"  {k}.{kk:10s} shape={tuple(vv.shape)} std={float(np.std(np.asarray(vv))):.5f}")
        else:
            print(f"  {k:14s} shape={tuple(v.shape)} std={float(np.std(np.asarray(v))):.5f}")


if __name__ == "__main__":
    main()
