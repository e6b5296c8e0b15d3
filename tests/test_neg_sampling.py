"""Negative sampling: exactness and uniformity including dense users."""

import jax
import jax.numpy as jnp
import numpy as np


def _mk(hist_rows, n_items):
    max_len = max(len(h) for h in hist_rows)
    hist = np.full((len(hist_rows), max_len), n_items, np.int32)
    for i, h in enumerate(hist_rows):
        hist[i, : len(h)] = sorted(h)
    pool = np.arange(n_items, dtype=np.int32)
    pad_to = -(-n_items // 128) * 128
    return jnp.asarray(hist), jnp.asarray(np.resize(pool, pad_to)), n_items


def test_dense_user_always_valid():
    """A user with all-but-two items in history must get one of the two."""
    n_items = 50
    hist_rows = [list(range(48))]  # free items: 48, 49
    hist, pool, n_pool = _mk(hist_rows, n_items)
    from genmmrec_tpu.data.arrays import sample_negatives

    users = jnp.zeros((256,), jnp.int32)
    got = set()
    for s in range(8):
        neg = np.asarray(
            sample_negatives(jax.random.PRNGKey(s), users, hist, pool, n_pool)
        )
        assert set(neg.tolist()) <= {48, 49}, neg
        got |= set(neg.tolist())
    assert got == {48, 49}  # both free items reachable


def test_sparse_user_distribution_roughly_uniform():
    n_items = 128
    hist_rows = [[0, 1, 2, 3]]
    hist, pool, n_pool = _mk(hist_rows, n_items)
    from genmmrec_tpu.data.arrays import sample_negatives

    users = jnp.zeros((4096,), jnp.int32)
    neg = np.asarray(sample_negatives(jax.random.PRNGKey(0), users, hist, pool, n_pool))
    assert not (set(neg.tolist()) & {0, 1, 2, 3})
    counts = np.bincount(neg, minlength=n_items)[4:]
    # rough uniformity over the 124 valid items
    assert counts.min() > 0
    assert counts.max() < counts.mean() * 3
