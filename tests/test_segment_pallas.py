"""Pallas sorted-segment-sum kernel: correctness (interpret mode on CPU),
gradient parity, and the spmm dispatch plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genmmrec_tpu.ops.graph import SparseGraph, bipartite_norm_adj, spmm
from genmmrec_tpu.ops.segment_pallas import CHUNK, SUB, chunk_span, sorted_segment_sum


def _edges(n_rows, min_deg, seed=0):
    rng = np.random.default_rng(seed)
    deg = np.maximum(min_deg, rng.zipf(1.7, n_rows) % 40)
    rows = np.repeat(np.arange(n_rows, dtype=np.int32), deg)
    return rows


@pytest.mark.parametrize("d", [64, 128, 96])
def test_kernel_matches_segment_sum(d):
    n_rows = 3000
    rows = _edges(n_rows, 5)
    nnz = len(rows)
    if nnz < SUB * CHUNK:  # ensure the kernel path is exercised
        reps = -(-SUB * CHUNK // nnz) + 1
        rows = np.sort(np.concatenate([rows] * reps))
        nnz = len(rows)
    span = chunk_span(rows, n_rows)
    assert span > 0
    g = jax.random.normal(jax.random.PRNGKey(0), (nnz, d))
    rows_j = jnp.asarray(rows)
    ref = jax.ops.segment_sum(g, rows_j, num_segments=n_rows, indices_are_sorted=True)
    out = sorted_segment_sum(g, rows_j, n_rows, span, CHUNK, True)  # interpret
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_kernel_gradient_is_gather():
    n_rows = 2000
    rows = np.sort(np.concatenate([_edges(n_rows, 5)] * 4))
    nnz = len(rows)
    span = chunk_span(rows, n_rows)
    assert span > 0
    g = jax.random.normal(jax.random.PRNGKey(1), (nnz, 64))
    rows_j = jnp.asarray(rows)
    w = jax.random.normal(jax.random.PRNGKey(2), (n_rows, 64))

    loss_pal = lambda x: (sorted_segment_sum(x, rows_j, n_rows, span, CHUNK, True) * w).sum()
    loss_ref = lambda x: (
        jax.ops.segment_sum(x, rows_j, num_segments=n_rows, indices_are_sorted=True) * w
    ).sum()
    g_pal = jax.grad(loss_pal)(g)
    g_ref = jax.grad(loss_ref)(g)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_chunk_span_gates():
    # tiny graphs: disabled
    assert chunk_span(np.arange(100, dtype=np.int32), 100) == 0
    # big sorted graph with full rows: enabled, span modest
    rows = np.repeat(np.arange(20000, dtype=np.int32), 6)
    span = chunk_span(rows, 20000)
    assert 0 < span <= 512
    # a huge gap (empty rows) inflates the span; the VMEM gate may disable
    rows_gap = np.sort(np.concatenate([rows, np.array([10_000_000], np.int32)]))
    s2 = chunk_span(rows_gap, 10_000_001)
    assert s2 == 0  # output window alone would blow VMEM


def test_dense_rows_span_vmem_gate():
    """Regenerated-graph span (all rows non-empty) must disable the kernel
    past the VMEM-budget scale — observed live: DiffMM elec (255,404 rows,
    d=64) OOMed scoped VMEM when the span was hard-coded."""
    from genmmrec_tpu.ops.segment_pallas import dense_rows_span

    baby_n = 19445 + 7050
    assert dense_rows_span(baby_n) == CHUNK + 16
    elec_n = 192403 + 63001
    assert dense_rows_span(elec_n) == 0


def test_spmm_symmetric_grads():
    """Symmetric-graph SpMM: forward parity + x/vals gradients vs the XLA
    reference, with the transpose product routed through the kernel."""
    from genmmrec_tpu.ops.segment_pallas import spmm_symmetric

    rng = np.random.default_rng(5)
    n = 2500
    # build a symmetric graph: (i, j, v) and (j, i, v)
    a = rng.integers(0, n, 40000)
    b = rng.integers(0, n, 40000)
    rows = np.concatenate([a, b, np.arange(n)])
    cols = np.concatenate([b, a, np.arange(n)])
    vals = rng.random(len(a)).astype(np.float32)
    vals = np.concatenate([vals, vals, np.ones(n, np.float32)])
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order].astype(np.int32), cols[order].astype(np.int32), vals[order]
    span = chunk_span(rows, n)
    assert span > 0

    rows_j, cols_j, vals_j = jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)
    x = jax.random.normal(jax.random.PRNGKey(6), (n, 64))
    w = jax.random.normal(jax.random.PRNGKey(7), (n, 64))

    ref_fn = lambda v, xx: jax.ops.segment_sum(
        v[:, None] * xx[cols_j], rows_j, num_segments=n, indices_are_sorted=True
    )
    pal_fn = lambda v, xx: spmm_symmetric(rows_j, cols_j, v, xx, n, span, CHUNK, True)

    np.testing.assert_allclose(
        np.asarray(pal_fn(vals_j, x)), np.asarray(ref_fn(vals_j, x)), rtol=2e-3, atol=2e-3
    )
    g_ref = jax.grad(lambda v, xx: (ref_fn(v, xx) * w).sum(), argnums=(0, 1))(vals_j, x)
    g_pal = jax.grad(lambda v, xx: (pal_fn(v, xx) * w).sum(), argnums=(0, 1))(vals_j, x)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=2e-3, atol=2e-3)


def test_blocked_kernel_matches_segment_sum():
    """Row-blocked path (elec-scale graphs): forced small VMEM budget so a
    modest graph needs multiple blocks; forward + gradient parity."""
    import genmmrec_tpu.ops.segment_pallas as sp

    n_rows = 24000
    rows = np.sort(np.concatenate([_edges(n_rows, 4, seed=9)] * 2))
    nnz = len(rows)
    # shrink the budget so block_plan must split this graph
    old = sp._VMEM_BUDGET
    sp._VMEM_BUDGET = 4 * 1024 * 1024
    try:
        plan = sp.block_plan(rows, n_rows)
        assert plan is not None and plan[1] >= 2, f"plan={plan}"
        g = jax.random.normal(jax.random.PRNGKey(0), (nnz, 64))
        rows_j = jnp.asarray(rows)
        ref = jax.ops.segment_sum(
            g, rows_j, num_segments=n_rows, indices_are_sorted=True
        )
        out = sp.sorted_segment_sum_blocked(g, rows_j, n_rows, plan, sp.CHUNK, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )
        # gradient is a gather
        w = jax.random.normal(jax.random.PRNGKey(2), (n_rows, 64))
        g_pal = jax.grad(
            lambda x: (sp.sorted_segment_sum_blocked(x, rows_j, n_rows, plan, sp.CHUNK, True) * w).sum()
        )(g)
        g_ref = jax.grad(
            lambda x: (jax.ops.segment_sum(x, rows_j, num_segments=n_rows, indices_are_sorted=True) * w).sum()
        )(g)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-5, atol=1e-5)
    finally:
        sp._VMEM_BUDGET = old


def test_blocked_symmetric_spmm_grads():
    import genmmrec_tpu.ops.segment_pallas as sp

    rng = np.random.default_rng(11)
    n = 16000
    a = rng.integers(0, n, 120000)
    b = rng.integers(0, n, 120000)
    rows = np.concatenate([a, b, np.arange(n)])
    cols = np.concatenate([b, a, np.arange(n)])
    vals = rng.random(len(a)).astype(np.float32)
    vals = np.concatenate([vals, vals, np.ones(n, np.float32)])
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = (
        rows[order].astype(np.int32), cols[order].astype(np.int32), vals[order]
    )
    old = sp._VMEM_BUDGET
    sp._VMEM_BUDGET = 4 * 1024 * 1024
    try:
        plan = sp.block_plan(rows, n)
        assert plan is not None and plan[1] >= 2
        rows_j, cols_j, vals_j = jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)
        x = jax.random.normal(jax.random.PRNGKey(6), (n, 64))
        w = jax.random.normal(jax.random.PRNGKey(7), (n, 64))
        ref_fn = lambda v, xx: jax.ops.segment_sum(
            v[:, None] * xx[cols_j], rows_j, num_segments=n, indices_are_sorted=True
        )
        pal_fn = lambda v, xx: sp.spmm_symmetric_blocked(
            rows_j, cols_j, v, xx, n, plan, sp.CHUNK, True
        )
        np.testing.assert_allclose(
            np.asarray(pal_fn(vals_j, x)), np.asarray(ref_fn(vals_j, x)),
            rtol=2e-3, atol=2e-3,
        )
        g_ref = jax.grad(lambda v, xx: (ref_fn(v, xx) * w).sum(), argnums=(0, 1))(vals_j, x)
        g_pal = jax.grad(lambda v, xx: (pal_fn(v, xx) * w).sum(), argnums=(0, 1))(vals_j, x)
        np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=2e-3, atol=2e-3)
    finally:
        sp._VMEM_BUDGET = old


def test_block_plan_elec_scale_geometry():
    """The real elec adjacency shape must yield a feasible multi-block plan
    (this is the graph the round-2 gates turned the kernel OFF for)."""
    from genmmrec_tpu.ops.segment_pallas import _VMEM_BUDGET, _vmem_estimate, block_plan

    rng = np.random.default_rng(0)
    n_users, n_items, n_edges = 192403, 63001, 1_690_000
    u = rng.integers(0, n_users, n_edges)
    i = rng.integers(0, n_items, n_edges) + n_users
    rows = np.sort(np.concatenate([u, i]).astype(np.int32))
    plan = block_plan(rows, n_users + n_items)
    assert plan is not None
    spb, nblocks, nr_max, span, r0s = plan
    assert nblocks >= 2 and len(r0s) == nblocks
    assert _vmem_estimate(nr_max, span, 64) <= _VMEM_BUDGET


def test_builder_sets_span_and_spmm_dispatches():
    rng = np.random.default_rng(3)
    n_u, n_i = 3000, 1200
    users = rng.integers(0, n_u, 60000).astype(np.int64)
    items = rng.integers(0, n_i, 60000).astype(np.int64)
    g = bipartite_norm_adj(users, items, n_u, n_i)
    assert g.pallas_span > 0
    # on CPU the dispatch falls back to segment_sum — results must agree
    x = jax.random.normal(jax.random.PRNGKey(4), (n_u + n_i, 32))
    out = spmm(g, x)
    ref = jax.ops.segment_sum(
        g.vals[:, None] * x[g.cols], g.rows, num_segments=g.n_rows, indices_are_sorted=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
