"""Graph operator tests: spmm vs dense reference, normalization parity."""

import numpy as np


def _random_graph(rng, n_users=12, n_items=9, n_edges=40):
    users = rng.integers(0, n_users, n_edges).astype(np.int32)
    items = rng.integers(0, n_items, n_edges).astype(np.int32)
    return users, items, n_users, n_items


def test_bipartite_norm_adj_matches_dense():
    import jax.numpy as jnp

    from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm

    rng = np.random.default_rng(0)
    users, items, n_users, n_items = _random_graph(rng)
    N = n_users + n_items
    g = bipartite_norm_adj(users, items, n_users, n_items)

    # dense reference (reference builder semantics: binary A, D^-1/2 A D^-1/2)
    A = np.zeros((N, N))
    A[users, items + n_users] = 1.0
    A[items + n_users, users] = 1.0
    deg = (A > 0).sum(1) + 1e-7
    d = np.power(deg, -0.5)
    L = d[:, None] * A * d[None, :]

    X = rng.normal(size=(N, 8)).astype(np.float32)
    expected = L @ X
    got = np.asarray(spmm(g, jnp.asarray(X)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_knn_graph_sparse_row_topk():
    from genmmrec_tpu.ops.graph import knn_graph_sparse

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(30, 16)).astype(np.float32)
    g = knn_graph_sparse(feats, topk=5, norm_type="sym")
    assert g.rows.shape[0] == 30 * 5
    # each row has exactly k entries
    counts = np.bincount(np.asarray(g.rows), minlength=30)
    assert (counts == 5).all()
    # self-similarity = 1 is max, so diagonal always included
    rows, cols = np.asarray(g.rows), np.asarray(g.cols)
    for i in range(30):
        assert i in cols[rows == i]


def test_edge_dropout_scales_and_masks():
    import jax

    from genmmrec_tpu.ops.graph import bipartite_norm_adj, edge_dropout

    rng = np.random.default_rng(2)
    users, items, n_users, n_items = _random_graph(rng)
    g = bipartite_norm_adj(users, items, n_users, n_items)
    g2 = edge_dropout(jax.random.PRNGKey(0), g, keep_prob=0.5)
    v, v2 = np.asarray(g.vals), np.asarray(g2.vals)
    kept = v2 != 0
    assert 0.1 < kept.mean() < 0.9
    np.testing.assert_allclose(v2[kept], v[kept] / 0.5, rtol=1e-5)


def test_degree_edge_dropout_keeps_exact_count():
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.ops.graph import degree_edge_dropout

    rng = np.random.default_rng(3)
    users, items, n_users, n_items = _random_graph(rng, n_edges=100)
    mask = degree_edge_dropout(
        jax.random.PRNGKey(0),
        jnp.asarray(users),
        jnp.asarray(items),
        n_users,
        n_items,
        keep_ratio=0.3,
    )
    assert int(np.asarray(mask).sum()) == 30
