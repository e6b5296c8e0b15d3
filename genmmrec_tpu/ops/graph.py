"""Sparse graph operators: the TPU-native replacement for
``torch.sparse.mm`` / ``torch-scatter`` / ``torch_geometric``.

The single hottest op in the reference is the (N+M)×(N+M) normalized
bipartite adjacency SpMM executed by every graph model on every batch
(e.g. `src/models/lightgcn.py:115-128`, `src/models/diffmm.py:129-169`).
cuSPARSE is replaced by a segment-sum formulation that XLA lowers to
sorted-scatter on TPU:

    out = segment_sum(vals[:, None] * X[cols], rows, N)

with edges pre-sorted by row (``indices_are_sorted=True``) — the layout a
Pallas row-blocked kernel can later slot into behind the same interface.

Edge dropout and epoch-varying graph topology keep **static shapes** by
masking edge values to zero rather than changing nnz (the reference rebuilds
scipy matrices on host per epoch, `src/common/trainer.py:529-576`).

Also provides the KNN-graph builders mirroring `src/utils/utils.py:130-197`
(build_sim / build_knn_neighbourhood / normalized laplacians) used by
LATTICE/FREEDOM/GUME/CoDMR/GenRec-V1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseGraph:
    """COO graph sorted by row; static nnz; value-masking for topology."""

    rows: jax.Array  # (nnz,) int32, sorted ascending when `sorted`
    cols: jax.Array  # (nnz,) int32
    vals: jax.Array  # (nnz,) float32
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    # epoch-regenerated graphs have data-dependent (unsorted) rows
    sorted: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # static chunk-span bound enabling the Pallas segment-sum kernel
    # (0 = disabled; see ops/segment_pallas.py). Set by host-side builders.
    pallas_span: int = dataclasses.field(default=0, metadata=dict(static=True))
    # value-symmetric square graph (Aᵀ == A): backward transpose products
    # route through the same sorted kernel instead of an unsorted scatter
    symmetric: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # row-blocked kernel plan for graphs whose full output exceeds the VMEM
    # budget (elec-scale adjacencies); see segment_pallas.block_plan
    pallas_plan: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]

    def with_span(self) -> "SparseGraph":
        """Compute the static Pallas span bound from the (host-resident)
        row array. Call once at graph-build time, never inside jit. Falls
        back to a row-blocked plan when the single-window output would blow
        the VMEM budget (elec scale)."""
        from genmmrec_tpu.ops.segment_pallas import block_plan, chunk_span

        if not self.sorted:
            return self
        rows_np = np.asarray(self.rows)
        span = chunk_span(rows_np, self.n_rows)
        plan = None
        if span == 0:
            plan = block_plan(rows_np, self.n_rows)
        return dataclasses.replace(self, pallas_span=span, pallas_plan=plan)


def spmm(g: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Sparse @ dense: (n_rows, n_cols) @ (n_cols, d) -> (n_rows, d)."""
    if g.sorted and jax.default_backend() != "cpu":
        if g.pallas_span > 0:
            from genmmrec_tpu.ops.segment_pallas import (
                sorted_segment_sum,
                spmm_symmetric,
            )

            if g.symmetric:
                return spmm_symmetric(
                    g.rows, g.cols, g.vals, x, g.n_rows, g.pallas_span
                )
            return sorted_segment_sum(
                g.vals[:, None] * x[g.cols], g.rows, g.n_rows, g.pallas_span
            )
        if g.pallas_plan is not None:
            from genmmrec_tpu.ops.segment_pallas import (
                sorted_segment_sum_blocked,
                spmm_symmetric_blocked,
            )

            if g.symmetric:
                return spmm_symmetric_blocked(
                    g.rows, g.cols, g.vals, x, g.n_rows, g.pallas_plan
                )
            return sorted_segment_sum_blocked(
                g.vals[:, None] * x[g.cols], g.rows, g.n_rows, g.pallas_plan
            )
    gathered = g.vals[:, None] * x[g.cols]
    return jax.ops.segment_sum(
        gathered, g.rows, num_segments=g.n_rows, indices_are_sorted=g.sorted
    )


def spmm_t(g: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Transpose SpMM: (n_cols, n_rows) @ (n_rows, d) without re-sorting."""
    gathered = g.vals[:, None] * x[g.rows]
    return jax.ops.segment_sum(gathered, g.cols, num_segments=g.n_cols)


def spmm_multi(g: SparseGraph, xs):
    """Batched SpMM over the SAME graph: one gather/scatter for several
    operands (column-concatenated).

    TPU perf note (measured on v5e): a d=128 pass costs the same as d=64,
    so propagating two towers in lockstep through one ``spmm_multi`` is ~2x
    cheaper than two ``spmm`` calls (baby scale: 5.7ms -> 3.1ms). Only this
    COLUMN-wise batching wins: ROW-wise batching (block-diagonal stacking of
    different graphs) measured slower — scatter cost is edge-proportional,
    and stacking adds operand concats (scripts/time_spmm_variants.py).
    Used by the multi-tower models (DiffMM/GUME/MGCN/SMORE/GenRecV1/MVDiff).
    """
    dims = [x.shape[1] for x in xs]
    out = spmm(g, jnp.concatenate(xs, axis=1))
    splits = np.cumsum(dims)[:-1].tolist()
    return jnp.split(out, splits, axis=1)


# ----------------------------------------------------------------------
def unique_ui_pairs(users: np.ndarray, items: np.ndarray):
    """Deduplicated (user, item) interaction pairs, sorted by (user, item).

    The reference's graph builders all collapse duplicate interactions to a
    single binary edge: the dict-based assemblies dedupe by construction
    (e.g. `src/models/lightgcn.py:72-78`), and the edge-list builders start
    from ``interaction_matrix`` after ``.astype(np.float32)``, which
    coalesces duplicates on modern scipy (then reset values with
    ``np.ones_like``, e.g. `src/models/ddrm.py:347-353`,
    `src/models/layergcn.py:85-90`).
    """
    pairs = np.unique(
        np.stack([users.astype(np.int64), items.astype(np.int64)], axis=1), axis=0
    )
    return pairs[:, 0], pairs[:, 1]


def bipartite_norm_adj(
    users: np.ndarray,
    items: np.ndarray,
    n_users: int,
    n_items: int,
    eps: float = 1e-7,
    weighted: bool = False,
) -> SparseGraph:
    """Symmetric-normalized (N+M)×(N+M) adjacency D^{-1/2} A D^{-1/2}.

    Built once on host from the train edge list; value parity with the
    reference builder (`src/models/lightgcn.py:65-101`): degree = row count
    + eps, then -0.5 power. Duplicate (u, i) pairs are deduplicated —
    matching the reference's dict-based assembly which collapses dupes.

    ``weighted=True`` keeps duplicate-interaction multiplicity as the edge
    weight and in the degrees — parity with the reference builders that
    assign the scipy interaction matrix into a lil block without resetting
    values (`src/models/rfmrec.py:89-107`: ``adj[:n_u, n_u:] = R`` where R
    sums repeated (u, i) rows).
    """
    N = n_users + n_items
    pairs, counts = np.unique(
        np.stack([users.astype(np.int64), items.astype(np.int64)], axis=1),
        axis=0, return_counts=True,
    )
    uu, ii = pairs[:, 0], pairs[:, 1] + n_users
    rows = np.concatenate([uu, ii])
    cols = np.concatenate([ii, uu])
    w = (
        np.concatenate([counts, counts]).astype(np.float64)
        if weighted
        else np.ones(rows.shape[0], np.float64)
    )
    deg = np.bincount(rows, weights=w, minlength=N) + eps
    d_inv_sqrt = np.power(deg, -0.5)
    vals = (w * d_inv_sqrt[rows] * d_inv_sqrt[cols]).astype(np.float32)
    order = np.argsort(rows, kind="stable")
    return SparseGraph(
        rows=jnp.asarray(rows[order].astype(np.int32)),
        cols=jnp.asarray(cols[order].astype(np.int32)),
        vals=jnp.asarray(vals[order]),
        n_rows=N,
        n_cols=N,
        symmetric=True,  # D^-1/2 A D^-1/2 of the symmetrized bipartite graph
    ).with_span()


def ui_norm_adj(
    users: np.ndarray,
    items: np.ndarray,
    n_users: int,
    n_items: int,
) -> SparseGraph:
    """Rectangular n_users×n_items D_u^{-1/2} R D_i^{-1/2} (DiffMM pattern,
    `src/common/trainer.py:460-485` buildUIMatrix normalization)."""
    pairs = np.unique(
        np.stack([users.astype(np.int64), items.astype(np.int64)], axis=1), axis=0
    )
    uu, ii = pairs[:, 0], pairs[:, 1]
    du = np.bincount(uu, minlength=n_users).astype(np.float64)
    di = np.bincount(ii, minlength=n_items).astype(np.float64)
    with np.errstate(divide="ignore"):
        du = np.where(du > 0, np.power(du, -0.5), 0.0)
        di = np.where(di > 0, np.power(di, -0.5), 0.0)
    vals = (du[uu] * di[ii]).astype(np.float32)
    order = np.argsort(uu, kind="stable")
    return SparseGraph(
        rows=jnp.asarray(uu[order].astype(np.int32)),
        cols=jnp.asarray(ii[order].astype(np.int32)),
        vals=jnp.asarray(vals[order]),
        n_rows=n_users,
        n_cols=n_items,
    ).with_span()


# ----------------------------------------------------------------------
def edge_dropout(key: jax.Array, g: SparseGraph, keep_prob: float, paired: bool = False) -> SparseGraph:
    """Bernoulli edge dropout with 1/keep rescale, static shape.

    With ``paired=True`` the nnz is assumed to be [forward; backward] halves
    of a symmetrized bipartite graph and the same mask is applied to both —
    preserving symmetry like the reference's sparse dropout on the stacked
    edge list.
    """
    if paired:
        half = g.nnz // 2
        m = jax.random.bernoulli(key, keep_prob, (half,))
        mask = jnp.concatenate([m, m]).astype(g.vals.dtype)
    else:
        mask = jax.random.bernoulli(key, keep_prob, (g.nnz,)).astype(g.vals.dtype)
    return dataclasses.replace(g, vals=g.vals * mask / keep_prob)


def degree_edge_dropout(
    key: jax.Array,
    users: jnp.ndarray,
    items: jnp.ndarray,
    n_users: int,
    n_items: int,
    keep_ratio: float,
) -> jnp.ndarray:
    """Degree-sensitive edge sampling (FREEDOM,
    `src/models/freedom.py:128-140`): edge keep probability ∝
    1/sqrt(deg_u * deg_i), sampled without replacement via Gumbel top-k.

    Returns a boolean keep mask of static shape (n_edges,) with
    floor(n_edges * keep_ratio) True entries.
    """
    n_edges = users.shape[0]
    deg_u = jax.ops.segment_sum(jnp.ones(n_edges), users, num_segments=n_users)
    deg_i = jax.ops.segment_sum(jnp.ones(n_edges), items, num_segments=n_items)
    weights = 1.0 / jnp.sqrt(jnp.maximum(deg_u[users] * deg_i[items], 1e-12))
    # Gumbel-top-k = sampling without replacement proportional to weights
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (n_edges,)) + 1e-20) + 1e-20)
    scores = jnp.log(weights) + gumbel
    k = int(n_edges * keep_ratio)
    thresh = jnp.sort(scores)[n_edges - k]
    return scores >= thresh


# ----------------------------------------------------------------------
# KNN item-item graphs (LATTICE/FREEDOM/GUME pattern, utils.py:130-197)
def build_sim(features: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity matrix of row-normalized features."""
    x = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12
    )
    return x @ x.T


def knn_graph_dense(
    sim: jnp.ndarray, topk: int, norm_type: str = "sym"
) -> jnp.ndarray:
    """Dense KNN adjacency: keep row-wise top-k sims, normalize laplacian."""
    n = sim.shape[0]
    vals, idx = jax.lax.top_k(sim, topk)
    adj = jnp.zeros_like(sim).at[jnp.arange(n)[:, None], idx].set(vals)
    return norm_laplacian_dense(adj, norm_type)


def norm_laplacian_dense(adj: jnp.ndarray, norm_type: str = "sym") -> jnp.ndarray:
    rowsum = adj.sum(axis=-1)
    if norm_type == "sym":
        d = jnp.where(rowsum > 0, rowsum**-0.5, 0.0)
        return adj * d[:, None] * d[None, :]
    if norm_type == "rw":
        d = jnp.where(rowsum > 0, 1.0 / rowsum, 0.0)
        return adj * d[:, None]
    return adj


def knn_graph_sparse(
    features: np.ndarray, topk: int, norm_type: str = "sym"
) -> SparseGraph:
    """Sparse KNN graph (init-time; sim+top-k on device), nnz = n*topk.

    ``norm_type``:
    - "sym" / "rw": replacement for
      ``build_knn_normalized_graph(..., is_sparse=True)``
      (`src/utils/utils.py:184-197`) — cosine-similarity edge VALUES,
      normalized by the weighted degree (torch_scatter.scatter_add there,
      numpy segment sums here). Used by MGCN/SMORE/GUME/CoDMR/MVDiff and the
      GenRecV1 trainer (`src/common/trainer.py:682-687`).
    - "binary_row": replacement for the model-local ``get_knn_adj_mat`` +
      ``compute_normalized_laplacian`` pattern
      (`src/models/freedom.py:79-101`, duplicated in cohesion/dragon/pgl/
      damrs) — edge values are BINARY ones and both sides normalize by the
      out-degree table (row_sum indexed at row and col), giving a uniform
      1/(topk+1e-7) weight.
    """
    f = np.asarray(features, np.float32)
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    n = f.shape[0]
    # blocked DEVICE top-k: the elec image graph is a 63k x 63k x 4096 sim
    # sweep (~32 TFLOP) — minutes of single-core numpy but ~1 s of MXU time.
    # Blocks bound the (block, n) sim matrix; rows are padded so one compile
    # serves every block.
    block = max(1, min(n, 8192))
    n_pad = -(-n // block) * block
    f_dev = jnp.asarray(np.pad(f, ((0, n_pad - n), (0, 0))))

    @partial(jax.jit, static_argnames=("k",))
    def _block_topk(fd, start, k):
        blk = jax.lax.dynamic_slice_in_dim(fd, start, block, axis=0)
        sim = jnp.dot(blk, fd[:n].T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(sim, k)

    rows_list, cols_list, vals_list = [], [], []
    for s in range(0, n_pad, block):
        v_blk, i_blk = _block_topk(f_dev, s, k=topk)
        real = min(block, n - s)
        rows_list.append(np.repeat(np.arange(s, s + real), topk).astype(np.int64))
        cols_list.append(np.asarray(i_blk[:real]).reshape(-1).astype(np.int64))
        vals_list.append(np.asarray(v_blk[:real]).reshape(-1).astype(np.float64))
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    vals = np.concatenate(vals_list)
    if norm_type == "sym":
        deg = np.zeros(n)
        np.add.at(deg, rows, vals)
        with np.errstate(divide="ignore"):
            dis = np.where(deg > 0, np.power(deg, -0.5), 0.0)
        vals = dis[rows] * vals * dis[cols]
    elif norm_type == "binary_row":
        deg = np.zeros(n)
        np.add.at(deg, rows, np.ones_like(vals))
        dis = np.power(deg + 1e-7, -0.5)
        vals = dis[rows] * dis[cols]
    elif norm_type == "rw":
        deg = np.zeros(n)
        np.add.at(deg, rows, vals)
        vals = np.where(deg[rows] > 0, vals / deg[rows], 0.0)
    return SparseGraph(
        rows=jnp.asarray(rows.astype(np.int32)),
        cols=jnp.asarray(cols.astype(np.int32)),
        vals=jnp.asarray(vals.astype(np.float32)),
        n_rows=n,
        n_cols=n,
    ).with_span()
