"""Golden tests: jnp metric kernels vs direct numpy ports of the reference
formulas (`src/utils/metrics.py:12-118`, `src/utils/topk_evaluator.py:20-32,
237-244`)."""

import numpy as np
import pytest


# ---- numpy reference ports (straight from the reference formulas) --------
def np_recall(pos_index, pos_len):
    return (np.cumsum(pos_index, axis=1) / pos_len.reshape(-1, 1)).mean(axis=0)


def np_recall2(pos_index, pos_len):
    return np.cumsum(pos_index, axis=1).sum(axis=0) / pos_len.sum()


def np_ndcg(pos_index, pos_len):
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    idcg_len = np.where(pos_len > len_rank, len_rank, pos_len)
    iranks = np.zeros_like(pos_index, dtype=float)
    iranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    idcg = np.cumsum(1.0 / np.log2(iranks + 1), axis=1)
    for row, idx in enumerate(idcg_len):
        idcg[row, idx:] = idcg[row, idx - 1]
    ranks = np.zeros_like(pos_index, dtype=float)
    ranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    dcg = 1.0 / np.log2(ranks + 1)
    dcg = np.cumsum(np.where(pos_index, dcg, 0), axis=1)
    return (dcg / idcg).mean(axis=0)


def np_map(pos_index, pos_len):
    pre = pos_index.cumsum(axis=1) / np.arange(1, pos_index.shape[1] + 1)
    sum_pre = np.cumsum(pre * pos_index.astype(float), axis=1)
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    actual_len = np.where(pos_len > len_rank, len_rank, pos_len)
    result = np.zeros_like(pos_index, dtype=float)
    for row, lens in enumerate(actual_len):
        ranges = np.arange(1, pos_index.shape[1] + 1)
        ranges[lens:] = ranges[lens - 1]
        result[row] = sum_pre[row] / ranges
    return result.mean(axis=0)


def np_precision(pos_index, pos_len):
    return (pos_index.cumsum(axis=1) / np.arange(1, pos_index.shape[1] + 1)).mean(axis=0)


def np_cal_gini(d_counter):
    cum = np.cumsum(sorted(np.append(d_counter, 0)))
    xarray = np.array(range(0, len(cum))) / (len(cum) - 1)
    yarray = cum / cum[-1]
    B = np.trapz(yarray, x=xarray)
    A = 0.5 - B
    return A / (A + B)


@pytest.fixture(scope="module")
def rand_case():
    rng = np.random.default_rng(7)
    U, K = 64, 50
    hits = rng.random((U, K)) < 0.1
    pos_len = rng.integers(1, 80, U)
    return hits, pos_len


@pytest.mark.parametrize(
    "name,np_fn",
    [
        ("recall", np_recall),
        ("recall2", np_recall2),
        ("ndcg", np_ndcg),
        ("map", np_map),
        ("precision", np_precision),
    ],
)
def test_metric_parity(rand_case, name, np_fn):
    import jax.numpy as jnp

    from genmmrec_tpu.engine import metrics as M

    hits, pos_len = rand_case
    expected = np_fn(hits, pos_len)
    got = M.metrics_dict[name](
        jnp.asarray(hits), jnp.asarray(pos_len), jnp.ones(len(pos_len))
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_metric_weights_exclude_rows(rand_case):
    import jax.numpy as jnp

    from genmmrec_tpu.engine import metrics as M

    hits, pos_len = rand_case
    w = np.zeros(len(pos_len))
    w[:10] = 1.0
    got = M.recall_at(jnp.asarray(hits), jnp.asarray(pos_len), jnp.asarray(w))
    expected = np_recall(hits[:10], pos_len[:10])
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_gini_parity():
    import jax.numpy as jnp

    from genmmrec_tpu.engine import metrics as M

    rng = np.random.default_rng(3)
    n_items = 200
    counts = np.zeros(n_items, np.float32)
    active = rng.choice(n_items, 80, replace=False)
    counts[active] = rng.integers(1, 30, 80)

    # formula 1 (topk_evaluator.py:237-244)
    sorted_counts = np.sort(counts)
    index = np.arange(1, n_items + 1)
    expected1 = (2 * np.sum(index * sorted_counts)) / (
        n_items * counts.sum()
    ) - (n_items + 1) / n_items
    got1 = M.gini_index(jnp.asarray(counts))
    np.testing.assert_allclose(float(got1), expected1, rtol=1e-5)

    # formula 2 (cal_gini with nonzero counts)
    expected2 = np_cal_gini(counts[counts > 0])
    got2 = M.gini_trapz(jnp.asarray(counts), jnp.float32(80))
    np.testing.assert_allclose(float(got2), expected2, rtol=1e-4)


def test_gini_trapz_all_active():
    import jax.numpy as jnp

    from genmmrec_tpu.engine import metrics as M

    counts = np.arange(1, 11).astype(np.float32)
    expected = np_cal_gini(counts)
    got = M.gini_trapz(jnp.asarray(counts), jnp.float32(10))
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)
