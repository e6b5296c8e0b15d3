"""Full-catalog top-K evaluation, computed on device.

Capability parity with the reference ``TopKEvaluator``
(`src/utils/topk_evaluator.py:35-319`): Recall/Recall2/NDCG/Precision/MAP at
every configured k, plus (test-time only) Pop/Niche item-group metrics,
Cold/Warm user-group metrics, Coverage@k, two Gini@k variants and Tail%@k —
and optional CSV export of the recommended top-K lists.

TPU-native deltas: the per-user Python hit-matrix loop
(`src/utils/topk_evaluator.py:109-112`) becomes a chunked on-device equality
reduction; group metrics become weighted means with row masks; Coverage/Gini
use one scatter-add histogram per k. Only the final scalar dict crosses to
host.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.data.arrays import EvalData
from genmmrec_tpu.engine import metrics as M
from genmmrec_tpu.utils.misc import get_local_time

# canonical capitalization for group-metric keys (reference topk_metrics map)
_CANON = {m.lower(): m for m in ["Recall", "Recall2", "Precision", "NDCG", "MAP"]}


def _chunked_hits(topk: jnp.ndarray, gt: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """(U, K) bool: whether each recommended item is in the row's gt set."""
    U = topk.shape[0]
    n_chunks = -(-U // chunk)
    pad = n_chunks * chunk - U
    topk_p = jnp.pad(topk, ((0, pad), (0, 0)), constant_values=-2)
    gt_p = jnp.pad(gt, ((0, pad), (0, 0)), constant_values=-1)
    topk_c = topk_p.reshape(n_chunks, chunk, -1)
    gt_c = gt_p.reshape(n_chunks, chunk, -1)

    def one(args):
        t, g = args
        return (t[:, :, None] == g[:, None, :]).any(axis=-1)

    hits = jax.lax.map(one, (topk_c, gt_c))
    return hits.reshape(n_chunks * chunk, -1)[:U]


class TopKEvaluator:
    def __init__(self, config):
        self.config = config
        metrics = config["metrics"]
        if isinstance(metrics, str):
            metrics = [metrics]
        for m in metrics:
            if m.lower() not in M.metrics_dict:
                raise ValueError(f"There is no user grouped topk metric named {m}!")
        self.metrics = [m.lower() for m in metrics]
        topk = config["topk"]
        self.topk = [topk] if isinstance(topk, int) else list(topk)
        if any(k <= 0 for k in self.topk):
            raise ValueError("topk must be positive")
        self.max_k = max(self.topk)
        self.save_recom_result = bool(config["save_recommended_topk"])

    # ------------------------------------------------------------------
    def evaluate(
        self,
        topk_index: jnp.ndarray,  # (U_pad, max_k) int32
        eval_data: EvalData,
        pop_mask: Optional[jnp.ndarray] = None,  # (n_items,) bool
        warm_mask: Optional[jnp.ndarray] = None,  # (n_users,) bool
        is_test: bool = False,
        idx: int = 0,
    ) -> Dict[str, float]:
        out = _evaluate_jit(
            topk_index,
            eval_data.gt_items,
            eval_data.gt_len,
            eval_data.valid,
            eval_data.users,
            pop_mask if pop_mask is not None else jnp.zeros((eval_data.n_items,), bool),
            warm_mask,
            metrics=tuple(self.metrics),
            topk=tuple(self.topk),
            is_test=is_test,
            has_pop=pop_mask is not None,
            has_warm=warm_mask is not None,
            n_items=eval_data.n_items,
        )
        # ONE device->host transfer for all scalars (per-scalar float() round
        # trips dominate wall-clock on remote-attached TPUs)
        keys = list(out.keys())
        vals = np.asarray(jnp.stack([out[k] for k in keys]))
        result = {k: round(float(v), 4) for k, v in zip(keys, vals)}
        if self.save_recom_result and is_test:
            self._save_topk(topk_index, eval_data, idx)
        return result

    def _save_topk(self, topk_index, eval_data: EvalData, idx: int) -> None:
        dir_name = os.path.abspath(self.config["recommend_topk"] or "recommend_topk/")
        os.makedirs(dir_name, exist_ok=True)
        path = os.path.join(
            dir_name,
            f"{self.config['model']}-{self.config['dataset']}-idx{idx}"
            f"-top{self.max_k}-{get_local_time()}.csv",
        )
        U = eval_data.n_users_eval
        arr = np.asarray(topk_index)[:U]
        users = np.asarray(eval_data.users)[:U]
        header = "id\t" + "\t".join(f"top_{i}" for i in range(arr.shape[1]))
        np.savetxt(
            path,
            np.concatenate([users[:, None], arr], axis=1),
            fmt="%d",
            delimiter="\t",
            header=header,
            comments="",
        )

    def __str__(self) -> str:
        return (
            "The TopK Evaluator Info:\n\tMetrics:["
            + ", ".join(_CANON[m] for m in self.metrics)
            + "], TopK:["
            + ", ".join(map(str, self.topk))
            + "]"
        )


@partial(
    jax.jit,
    static_argnames=("metrics", "topk", "is_test", "has_pop", "has_warm", "n_items"),
)
def _evaluate_jit(
    topk_index,
    gt_items,
    gt_len,
    valid,
    users,
    pop_mask,
    warm_mask,
    *,
    metrics,
    topk,
    is_test,
    has_pop,
    has_warm,
    n_items,
):
    w = valid.astype(jnp.float32)
    hits = _chunked_hits(topk_index, gt_items)
    out = {}

    def add_block(prefix, h, plen, weights, canon=False):
        for m in metrics:
            vals = M.metrics_dict[m](h, plen, weights)
            name = _CANON[m] if canon else m
            for k in topk:
                out[f"{prefix}{name}@{k}"] = vals[k - 1]

    add_block("", hits, gt_len, w)

    if is_test and has_pop:
        gt_valid = gt_items >= 0
        gt_is_pop = jnp.where(
            gt_valid, pop_mask[jnp.clip(gt_items, 0, n_items - 1)], False
        )
        for prefix, sel in (("Pop_", gt_is_pop), ("Niche_", gt_valid & ~gt_is_pop)):
            sub_gt = jnp.where(sel, gt_items, -1)
            sub_len = sel.sum(axis=1)
            sub_w = w * (sub_len > 0)
            sub_hits = _chunked_hits(topk_index, sub_gt)
            add_block(prefix, sub_hits, jnp.maximum(sub_len, 1), sub_w, canon=True)

    if is_test and has_warm:
        is_warm = warm_mask[users]
        add_block("Cold_", hits, gt_len, w * (~is_warm), canon=True)
        add_block("Warm_", hits, gt_len, w * is_warm, canon=True)

    if is_test:
        for k in topk:
            rec = jnp.where(
                valid[:, None] & (topk_index[:, :k] >= 0), topk_index[:, :k], n_items
            )
            counts = (
                jnp.zeros((n_items,), jnp.float32)
                .at[rec.reshape(-1)]
                .add(1.0, mode="drop")
            )
            n_active = (counts > 0).sum()
            out[f"Coverage@{k}"] = n_active / n_items
            out[f"Gini@{k}"] = M.gini_index(counts)
            out[f"Gini2@{k}"] = M.gini_trapz(counts, n_active.astype(jnp.float32))
            out[f"Coverage2@{k}"] = n_active / n_items
            if has_pop:
                total = jnp.maximum(counts.sum(), 1.0)
                tail = (counts * (~pop_mask)).sum()
                out[f"Tail%@{k}"] = tail / total
    return out
