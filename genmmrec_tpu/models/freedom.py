"""FREEDOM: freezing the multimodal item graph, denoising the UI graph.

Parity with reference `src/models/freedom.py:22-221`:
- frozen item-item KNN graph mixed across modalities with ``mm_image_weight``
  (`freedom.py:64-77`);
- per-epoch degree-sensitive edge sampling of the UI graph
  (`pre_epoch_processing`, :128-143) — kept edges re-normalized, symmetric;
- forward: ``n_mm_layers`` item-graph hops on the item-id embedding, then
  ``n_ui_layers`` UI hops with layer-mean, final items += item-graph output;
- loss: BPR on the masked graph plus ``reg_weight``-scaled modal BPR terms
  (projected raw features as item scores); full-sort uses the *unmasked*
  graph (:212-220).

TPU-native: the per-epoch graph rebuild is a pure jit state transform — a
static-shape keep-mask (Gumbel top-k == multinomial without replacement) and
on-device renormalization; no host scipy round-trip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import apply_linear, linear_params, xavier_normal, xavier_uniform
from genmmrec_tpu.common.losses import bpr_loss
from genmmrec_tpu.models.base import RecModel
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm


class FREEDOM(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_dim = int(config["embedding_size"])
        self.feat_embed_dim = int(config["feat_embed_dim"])
        self.knn_k = int(config["knn_k"])
        self.n_layers = int(config["n_mm_layers"])
        self.n_ui_layers = int(config["n_ui_layers"])
        self.reg_weight = float(config["reg_weight"])
        self.mm_image_weight = float(config["mm_image_weight"])
        self.dropout = float(config["dropout"])

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        self.ui_users = jnp.asarray(users.astype(np.int32))
        self.ui_items = jnp.asarray(items.astype(np.int32))
        self.n_edges = len(users)
        # static symmetric edge layout: [u -> i+n_users ; i+n_users -> u]
        rows = np.concatenate([users, items + self.n_users]).astype(np.int32)
        cols = np.concatenate([items + self.n_users, users]).astype(np.int32)
        self._order = np.argsort(rows, kind="stable")
        # sorted edge i corresponds to concat-layout index _perm[i]
        self._perm = jnp.asarray(self._order.astype(np.int32))
        from genmmrec_tpu.ops.segment_pallas import chunk_span

        self._pspan = chunk_span(rows[self._order], self.n_users + self.n_items)
        self.adj_rows = jnp.asarray(rows[self._order])
        self.adj_cols = jnp.asarray(cols[self._order])

        # rectangular-normalized edge weights for degree-sensitive sampling
        du = np.bincount(users, minlength=self.n_users) + 1e-7
        di = np.bincount(items, minlength=self.n_items) + 1e-7
        self.edge_values = jnp.asarray(
            (np.power(du, -0.5)[users] * np.power(di, -0.5)[items]).astype(np.float32)
        )

        # frozen multimodal item graph (host-built at init, like the cached
        # mm_adj_freedomdsp file in the reference)
        mm = None
        if self.v_feat is not None:
            mm = knn_graph_sparse(self.v_feat_np, self.knn_k, norm_type="binary_row")
            mm = dataclasses.replace(mm, vals=mm.vals * self.mm_image_weight)
        if self.t_feat is not None:
            tg = knn_graph_sparse(self.t_feat_np, self.knn_k, norm_type="binary_row")
            w = (1.0 - self.mm_image_weight) if mm is not None else 1.0
            tg = dataclasses.replace(tg, vals=tg.vals * w)
            if mm is None:
                mm = tg
            else:  # sparse sum = edge-list union (kept concatenated)
                rows2 = jnp.concatenate([mm.rows, tg.rows])
                order = jnp.argsort(rows2, stable=True)
                mm = SparseGraph(
                    rows=rows2[order],
                    cols=jnp.concatenate([mm.cols, tg.cols])[order],
                    vals=jnp.concatenate([mm.vals, tg.vals])[order],
                    n_rows=self.n_items,
                    n_cols=self.n_items,
                )
        self.mm_adj = mm

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 4)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, self.embedding_dim)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, self.embedding_dim)),
        }
        if self.v_feat is not None:
            params["image_trs"] = linear_params(
                ks[2], self.v_feat.shape[1], self.feat_embed_dim, init=xavier_normal
            )
        if self.t_feat is not None:
            params["text_trs"] = linear_params(
                ks[3], self.t_feat.shape[1], self.feat_embed_dim, init=xavier_normal
            )
        return params

    def init_state(self, key):
        return {"masked_vals": self._full_norm_vals()}

    def _full_norm_vals(self):
        """Symmetric D^{-1/2}AD^{-1/2} values over the static edge layout."""
        ones = jnp.ones(self.n_edges)
        du = jax.ops.segment_sum(ones, self.ui_users, num_segments=self.n_users) + 1e-7
        di = jax.ops.segment_sum(ones, self.ui_items, num_segments=self.n_items) + 1e-7
        v = du[self.ui_users] ** -0.5 * di[self.ui_items] ** -0.5
        return jnp.concatenate([v, v])[self._perm]

    def pre_epoch(self, params, state, key, epoch):
        if self.dropout <= 0.0:
            return {"masked_vals": self._full_norm_vals()}
        n_keep = int(self.n_edges * (1.0 - self.dropout))
        # multinomial-without-replacement ∝ edge_values via Gumbel top-k
        g = -jnp.log(-jnp.log(jax.random.uniform(key, (self.n_edges,)) + 1e-20) + 1e-20)
        scoresv = jnp.log(self.edge_values) + g
        thresh = jnp.sort(scoresv)[self.n_edges - n_keep]
        keep = (scoresv >= thresh).astype(jnp.float32)
        du = jax.ops.segment_sum(keep, self.ui_users, num_segments=self.n_users) + 1e-7
        di = jax.ops.segment_sum(keep, self.ui_items, num_segments=self.n_items) + 1e-7
        v = keep * du[self.ui_users] ** -0.5 * di[self.ui_items] ** -0.5
        vals = jnp.concatenate([v, v])[self._perm]
        return {"masked_vals": vals}

    # ------------------------------------------------------------------
    def _ui_graph(self, vals) -> SparseGraph:
        return SparseGraph(
            rows=self.adj_rows,
            cols=self.adj_cols,
            vals=vals,
            n_rows=self.n_users + self.n_items,
            n_cols=self.n_users + self.n_items,
            pallas_span=self._pspan,
            symmetric=True,  # [v, v] over mirrored edges
        )

    def propagate(self, params, vals):
        h = params["item_id_embedding"]
        for _ in range(self.n_layers):
            h = spmm(self.mm_adj, h)
        adj = self._ui_graph(vals)
        ego = jnp.concatenate([params["user_embedding"], params["item_id_embedding"]], axis=0)
        layers = [ego]
        x = ego
        for _ in range(self.n_ui_layers):
            x = spmm(adj, x)
            layers.append(x)
        out = jnp.mean(jnp.stack(layers, axis=1), axis=1)
        return out[: self.n_users], out[self.n_users :] + h

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia = self.propagate(params, state["masked_vals"])
        u = ua[users]
        mf = bpr_loss((u * ia[pos]).sum(1), (u * ia[neg]).sum(1), w, gamma=0.0)
        mf_t = mf_v = 0.0
        if self.t_feat is not None:
            tf = apply_linear(params["text_trs"], self.t_feat)
            mf_t = bpr_loss((u * tf[pos]).sum(1), (u * tf[neg]).sum(1), w, gamma=0.0)
        if self.v_feat is not None:
            vf = apply_linear(params["image_trs"], self.v_feat)
            mf_v = bpr_loss((u * vf[pos]).sum(1), (u * vf[neg]).sum(1), w, gamma=0.0)
        total = mf + self.reg_weight * (mf_t + mf_v)
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.propagate(params, self._full_norm_vals())

    def scores(self, params, state, users):
        ua, ia = self.propagate(params, self._full_norm_vals())
        return ua[users] @ ia.T
