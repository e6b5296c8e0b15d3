"""Top-K ranking metrics as vectorized jnp kernels.

Numerical parity with the reference numpy formulas
(`src/utils/metrics.py:12-118`): ``recall_``, ``recall2_``, ``ndcg_``,
``map_``, ``precision_`` — each returns the metric value at *every* rank
position ``1..K`` (callers pick ``k-1``).

TPU-native deltas:
- operates on a boolean hit matrix computed on device (the reference builds
  it in a per-user Python loop, `src/utils/topk_evaluator.py:109-112`);
- every metric takes a per-row ``weights`` vector so padded/grouped user rows
  can be excluded without dynamic shapes (weight 0 == row absent);
- the reference's per-row Python loops in ``ndcg_``/``map_`` (idcg clamping,
  rank clamping) become closed-form gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def _wmean(rows: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted mean over axis 0. rows: (U, K), weights: (U,)."""
    denom = jnp.maximum(weights.sum(), 1.0)
    return (rows * weights[:, None]).sum(axis=0) / denom


def recall_at(hits: jnp.ndarray, pos_len: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Per-user recall averaged over users; (K,)."""
    rec = jnp.cumsum(hits, axis=1) / jnp.maximum(pos_len, 1)[:, None]
    return _wmean(rec, weights)


def recall2_at(hits: jnp.ndarray, pos_len: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Global-pool recall: summed hits / summed positives; (K,)."""
    cum = jnp.cumsum(hits, axis=1) * weights[:, None]
    denom = jnp.maximum((pos_len * weights).sum(), 1.0)
    return cum.sum(axis=0) / denom


def ndcg_at(hits: jnp.ndarray, pos_len: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    K = hits.shape[1]
    ranks = jnp.arange(1, K + 1, dtype=jnp.float32)
    gains = 1.0 / jnp.log2(ranks + 1.0)
    base_idcg = jnp.cumsum(gains)  # (K,)
    # idcg at column j is base_idcg[min(j, pos_len-1)] — the closed form of
    # the reference's `idcg[row, idx:] = idcg[row, idx-1]` row loop
    idcg_len = jnp.clip(pos_len, 1, K)  # (U,)
    col = jnp.minimum(jnp.arange(K)[None, :], idcg_len[:, None] - 1)
    idcg = base_idcg[col]  # (U, K)
    dcg = jnp.cumsum(jnp.where(hits, gains[None, :], 0.0), axis=1)
    return _wmean(dcg / idcg, weights)


def map_at(hits: jnp.ndarray, pos_len: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    K = hits.shape[1]
    ranks = jnp.arange(1, K + 1, dtype=jnp.float32)
    hits_f = hits.astype(jnp.float32)
    pre = jnp.cumsum(hits_f, axis=1) / ranks[None, :]
    sum_pre = jnp.cumsum(pre * hits_f, axis=1)
    actual_len = jnp.clip(pos_len, 1, K)
    # reference's `ranges[lens:] = ranges[lens-1]` == min(rank, lens)
    denom = jnp.minimum(ranks[None, :], actual_len[:, None].astype(jnp.float32))
    return _wmean(sum_pre / denom, weights)


def precision_at(hits: jnp.ndarray, pos_len: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    K = hits.shape[1]
    ranks = jnp.arange(1, K + 1, dtype=jnp.float32)
    pre = jnp.cumsum(hits.astype(jnp.float32), axis=1) / ranks[None, :]
    return _wmean(pre, weights)


metrics_dict = {
    "recall": recall_at,
    "recall2": recall2_at,
    "ndcg": ndcg_at,
    "map": map_at,
    "precision": precision_at,
}


def gini_index(counts: jnp.ndarray) -> jnp.ndarray:
    """Gini over per-item recommendation counts (reference formula at
    `src/utils/topk_evaluator.py:237-244`)."""
    n = counts.shape[0]
    sorted_counts = jnp.sort(counts)
    total = sorted_counts.sum()
    index = jnp.arange(1, n + 1, dtype=jnp.float32)
    gini = (2.0 * (index * sorted_counts).sum()) / (n * jnp.maximum(total, 1.0)) - (
        n + 1.0
    ) / n
    return jnp.where(total > 0, gini, 0.0)


def gini_trapz(counts_nonzero: jnp.ndarray, n_active: jnp.ndarray) -> jnp.ndarray:
    """Second Gini variant (reference ``cal_gini``,
    `src/utils/topk_evaluator.py:20-32`): trapezoidal Lorenz-curve integral
    over the *active* items only, with a prepended zero.

    Computed over a fixed-size sorted vector where inactive entries are
    sorted to the front as zeros — prepending one more zero and restricting
    the x-axis normalization to ``n_active`` reproduces the reference
    ``np.trapz`` result.
    """
    n_items = counts_nonzero.shape[0]
    # append the reference's explicit zero, then sort: zeros first
    s = jnp.sort(jnp.concatenate([counts_nonzero, jnp.zeros((1,), counts_nonzero.dtype)]))
    cum = jnp.cumsum(s)  # (n_items + 1,)
    total = jnp.maximum(cum[-1], 1.0)
    # The reference's Lorenz curve has n_active+1 points with x spacing
    # 1/n_active. Those points are exactly the trailing n_active cumsums plus
    # the zero immediately before them (position n_items - n_active).
    # trapz with uniform spacing h: B = h * (sum(y) - (y0 + yN)/2).
    idx = jnp.arange(n_items + 1, dtype=jnp.float32)
    window = idx >= (n_items - n_active)
    y = jnp.where(window, cum / total, 0.0)
    yN = cum[-1] / total  # == 1
    h = 1.0 / jnp.maximum(n_active, 1.0)
    B = h * (y.sum() - 0.5 * yN)  # y0 of the window is always 0
    A = 0.5 - B
    return jnp.where(n_active > 0, A / jnp.maximum(A + B, 1e-12), 0.0)
