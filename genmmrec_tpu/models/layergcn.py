"""LayerGCN: layer-refined graph convolution.

Parity with reference `src/models/layergcn.py`: per-epoch edge pruning that
alternates between degree-probability sampling and uniform random sampling
(``pruning_random`` toggle, :51-70), layer-refined propagation where each
layer's output is re-weighted by its cosine similarity to the ego embedding
(:125-139), **sum**-reduced BPR plus L2 regularization; eval uses the full
(unpruned) adjacency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.common.losses import l2_loss
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, spmm


class LayerGCN(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.latent_dim = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.dropout = scalar(config["dropout"])

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        self.ui_users = jnp.asarray(users.astype(np.int32))
        self.ui_items = jnp.asarray(items.astype(np.int32))
        self.n_edges = len(users)
        rows = np.concatenate([users, items + self.n_users]).astype(np.int32)
        cols = np.concatenate([items + self.n_users, users]).astype(np.int32)
        self._order = np.argsort(rows, kind="stable")
        self._perm = jnp.asarray(self._order.astype(np.int32))
        self.adj_rows = jnp.asarray(rows[self._order])
        self.adj_cols = jnp.asarray(cols[self._order])
        from genmmrec_tpu.ops.segment_pallas import chunk_span

        self._pspan = chunk_span(rows[self._order], self.n_users + self.n_items)
        du = np.bincount(users, minlength=self.n_users) + 1e-7
        di = np.bincount(items, minlength=self.n_items) + 1e-7
        self.edge_values = jnp.asarray(
            (np.power(du, -0.5)[users] * np.power(di, -0.5)[items]).astype(np.float32)
        )

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_embeddings": xavier_uniform(ku, (self.n_users, self.latent_dim)),
            "item_embeddings": xavier_uniform(ki, (self.n_items, self.latent_dim)),
        }

    def _norm_vals(self, keep):
        du = jax.ops.segment_sum(keep, self.ui_users, num_segments=self.n_users) + 1e-7
        di = jax.ops.segment_sum(keep, self.ui_items, num_segments=self.n_items) + 1e-7
        v = keep * du[self.ui_users] ** -0.5 * di[self.ui_items] ** -0.5
        return jnp.concatenate([v, v])[self._perm]

    def init_state(self, key):
        return {"masked_vals": self._norm_vals(jnp.ones(self.n_edges))}

    def pre_epoch(self, params, state, key, epoch):
        if self.dropout <= 0.0:
            return {"masked_vals": self._norm_vals(jnp.ones(self.n_edges))}
        n_keep = int(self.n_edges * (1.0 - self.dropout))
        # alternate degree-probability / uniform pruning (pruning_random ^=)
        g = -jnp.log(-jnp.log(jax.random.uniform(key, (self.n_edges,)) + 1e-20) + 1e-20)
        deg_scores = jnp.log(self.edge_values) + g
        rand_scores = g
        scoresv = jax.lax.cond(
            epoch % 2 == 0, lambda _: deg_scores, lambda _: rand_scores, None
        )
        thresh = jnp.sort(scoresv)[self.n_edges - n_keep]
        keep = (scoresv >= thresh).astype(jnp.float32)
        return {"masked_vals": self._norm_vals(keep)}

    def _graph(self, vals):
        N = self.n_users + self.n_items
        return SparseGraph(
            rows=self.adj_rows,
            cols=self.adj_cols,
            vals=vals,
            n_rows=N,
            n_cols=N,
            pallas_span=self._pspan,
            symmetric=True,  # [v, v] over mirrored edges
        )

    def propagate(self, params, vals):
        ego = jnp.concatenate(
            [params["user_embeddings"], params["item_embeddings"]], axis=0
        )
        adj = self._graph(vals)
        x = ego
        acc = jnp.zeros_like(ego)
        # safe norm: sqrt(max(Σx², ε)) — plain linalg.norm has a NaN gradient
        # at x=0, and edge pruning CAN zero out a low-degree node's whole row
        # (torch's F.cosine_similarity clamps the same way)
        safe_n = lambda v: v / jnp.sqrt(
            jnp.maximum((v * v).sum(-1, keepdims=True), 1e-24)
        )
        ego_n = safe_n(ego)
        for _ in range(self.n_layers):
            x = spmm(adj, x)
            x_n = safe_n(x)
            weights = (x_n * ego_n).sum(-1)
            x = weights[:, None] * x
            acc = acc + x
        return acc[: self.n_users], acc[self.n_users :]

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia = self.propagate(params, state["masked_vals"])
        u, p_e, n_e = ua[users], ia[pos], ia[neg]
        # SUM-reduced BPR (layergcn.py bpr_loss uses torch.sum)
        mf = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum()
        reg = l2_loss(
            params["user_embeddings"][users],
            params["item_embeddings"][pos],
            params["item_embeddings"][neg],
        )
        total = mf + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.propagate(params, self._norm_vals(jnp.ones(self.n_edges)))

    def scores(self, params, state, users):
        ua, ia = self.propagate(params, self._norm_vals(jnp.ones(self.n_edges)))
        return ua[users] @ ia.T
