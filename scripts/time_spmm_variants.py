"""Microbenchmark: separate passes vs row-stacked vs column-batched SpMM.

Verdict (TPU v5e, baby scale): column-wise batching over a SHARED graph
(spmm_multi) is ~2x cheaper than separate passes; ROW-wise batching of
different graphs into a block-diagonal never wins — scatter cost is
edge-proportional and the operand concat adds overhead. This is why only
spmm_multi lives in ops/graph.py; the block-diagonal helper was removed.

    regen 2 passes: 1.725 ms   direct-sum: 2.563 ms
    main 2 passes:  5.719 ms   spmm_multi: 3.142 ms
    two big graphs: 5.640 ms   direct-sum: 5.685 ms
    II 2 passes:    1.990 ms   direct-sum: 1.998 ms
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.ops.graph import SparseGraph, spmm, spmm_multi


def graph_direct_sum(g1, g2):
    """Block-diagonal row-stacking (kept here only for the measurement)."""
    return SparseGraph(
        rows=jnp.concatenate([g1.rows, g2.rows + g1.n_rows]),
        cols=jnp.concatenate([g1.cols, g2.cols + g1.n_cols]),
        vals=jnp.concatenate([g1.vals, g2.vals]),
        n_rows=g1.n_rows + g2.n_rows,
        n_cols=g1.n_cols + g2.n_cols,
        sorted=g1.sorted and g2.sorted,
    )

N_U, N_I, D = 19445, 7050, 64
N = N_U + N_I
NNZ_MAIN = 244766  # baby bipartite adj
NNZ_REGEN = 2 * N_U * 1 + N  # rebuild_k=1 + self loops

rng = np.random.default_rng(0)


def rand_graph(nnz, n, sorted_rows=True):
    rows = np.sort(rng.integers(0, n, nnz)).astype(np.int32) if sorted_rows else rng.integers(0, n, nnz).astype(np.int32)
    cols = rng.integers(0, n, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)
    return SparseGraph(
        rows=jnp.asarray(rows), cols=jnp.asarray(cols), vals=jnp.asarray(vals),
        n_rows=n, n_cols=n, sorted=sorted_rows,
    )


def bench(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


g1 = rand_graph(NNZ_REGEN, N, sorted_rows=False)
g2 = rand_graph(NNZ_REGEN, N, sorted_rows=False)
x = jnp.asarray(rng.random((N, D)).astype(np.float32))

two = jax.jit(lambda a: (spmm(g1, a), spmm(g2, a)))
pair = graph_direct_sum(g1, g2)
one = jax.jit(lambda a: jnp.split(spmm(pair, jnp.concatenate([a, a], axis=0)), 2, axis=0))
print(f"regen 2 passes: {bench(two, x):.3f} ms   direct-sum: {bench(one, x):.3f} ms")

gm = rand_graph(NNZ_MAIN, N, sorted_rows=True)
two_m = jax.jit(lambda a, b: (spmm(gm, a), spmm(gm, b)))
multi_m = jax.jit(lambda a, b: spmm_multi(gm, [a, b]))
y = jnp.asarray(rng.random((N, D)).astype(np.float32))
print(f"main 2 passes: {bench(two_m, x, y):.3f} ms   spmm_multi: {bench(multi_m, x, y):.3f} ms")

g3 = rand_graph(NNZ_MAIN, N, sorted_rows=True)
two_d = jax.jit(lambda a, b: (spmm(gm, a), spmm(g3, b)))
pair_d = graph_direct_sum(gm, g3)
one_d = jax.jit(
    lambda a, b: jnp.split(spmm(pair_d, jnp.concatenate([a, b], axis=0)), 2, axis=0)
)
print(f"two big graphs 2 passes: {bench(two_d, x, y):.3f} ms   direct-sum: {bench(one_d, x, y):.3f} ms")

# small graphs (KNN item-item, ~n_items*k edges)
nnz_ii = N_I * 10
gi = rand_graph(nnz_ii, N_I, sorted_rows=True)
gt = rand_graph(nnz_ii, N_I, sorted_rows=True)
xi = jnp.asarray(rng.random((N_I, D)).astype(np.float32))
two_ii = jax.jit(lambda a: (spmm(gi, a), spmm(gt, a)))
pair_ii = graph_direct_sum(gi, gt)
one_ii = jax.jit(lambda a: jnp.split(spmm(pair_ii, jnp.concatenate([a, a], axis=0)), 2, axis=0))
print(f"II 2 passes: {bench(two_ii, xi):.3f} ms   direct-sum: {bench(one_ii, xi):.3f} ms")
