"""Message-passing micro-library on segment reductions.

TPU-native replacement for the torch_geometric ``MessagePassing`` +
``torch_scatter`` kernels the reference depends on (MMGCN/GRCN/DualGNN/
DRAGON/MVGAE, see SURVEY §2.4): gather by edge index → segment reduce, plus
the index-op utilities (self loops, degree, edge dropout by value masking).
Edges are (src, dst) int32 arrays with static length.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def degree(index: jnp.ndarray, num_nodes: int, weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    w = jnp.ones_like(index, dtype=jnp.float32) if weights is None else weights
    return jax.ops.segment_sum(w, index, num_segments=num_nodes)


def sort_edges_by_dst(
    src: np.ndarray, dst: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host-side edge preprocessing: order by destination so the segment
    reduction is sorted and the Pallas kernel span bound applies. Returns
    (src_sorted, dst_sorted, pallas_span); pass the span into ``propagate``.
    Call once at model init, never inside jit."""
    from genmmrec_tpu.ops.segment_pallas import chunk_span

    order = np.argsort(dst, kind="stable")
    src_s, dst_s = np.asarray(src)[order], np.asarray(dst)[order]
    return src_s, dst_s, chunk_span(dst_s, num_nodes)


def propagate(
    x: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_nodes: int,
    aggr: str = "add",
    edge_weight: Optional[jnp.ndarray] = None,
    pallas_span: int = 0,
) -> jnp.ndarray:
    """out[d] = aggr_{(s,d)∈E} w_sd * x[s].

    With ``pallas_span > 0`` (edges pre-sorted by dst via
    ``sort_edges_by_dst``) the add/mean reductions run on the Pallas
    sorted-segment-sum kernel instead of XLA's serialized scatter."""
    msgs = x[src]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    use_pallas = pallas_span > 0 and jax.default_backend() != "cpu"
    if aggr == "add":
        if use_pallas:
            from genmmrec_tpu.ops.segment_pallas import sorted_segment_sum

            return sorted_segment_sum(msgs, dst, num_nodes, pallas_span)
        return jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)
    if aggr == "mean":
        if use_pallas:
            from genmmrec_tpu.ops.segment_pallas import sorted_segment_sum

            s = sorted_segment_sum(msgs, dst, num_nodes, pallas_span)
        else:
            s = jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)
        d = degree(dst, num_nodes)
        return s / jnp.maximum(d, 1.0)[:, None]
    if aggr == "max":
        return jax.ops.segment_max(msgs, dst, num_segments=num_nodes)
    raise ValueError(f"unknown aggr {aggr}")


def add_self_loops(src: jnp.ndarray, dst: jnp.ndarray, num_nodes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    loops = jnp.arange(num_nodes, dtype=src.dtype)
    return jnp.concatenate([src, loops]), jnp.concatenate([dst, loops])


def segment_softmax(scores: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Softmax over edges grouped by destination (torch_geometric.utils.softmax)."""
    seg_max = jax.ops.segment_max(scores, index, num_segments=num_segments)
    ex = jnp.exp(scores - seg_max[index])
    seg_sum = jax.ops.segment_sum(ex, index, num_segments=num_segments)
    return ex / jnp.maximum(seg_sum[index], 1e-16)


def dropout_edge_mask(key: jax.Array, n_edges: int, keep_prob: float) -> jnp.ndarray:
    """Static-shape edge dropout: a 0/1 mask to multiply into edge weights."""
    return jax.random.bernoulli(key, keep_prob, (n_edges,)).astype(jnp.float32)
