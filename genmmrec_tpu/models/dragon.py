"""DRAGON: dyadic graph + user co-occurrence graph (ECAI '23).

Parity with reference `src/models/dragon.py:20-300`: DualGNN's modal GCN
towers and user-user aggregation, plus a frozen mixed item-item KNN graph
hop added to the item representation, and the 'cat' construction: the final
representation concatenates the modal towers (2·d), users weighted by the
softmax-initialized ``weight_u``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.models.base import scalar
from genmmrec_tpu.models.dualgnn import DualGNN
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm


class DRAGON(DualGNN):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.feat_embed_dim = scalar(config["feat_embed_dim"] or 64, int)
        self.knn_k = scalar(config["knn_k"] or 10, int)
        self.mm_image_weight = scalar(config["mm_image_weight"] or 0.1)
        self.n_mm_layers = scalar(config["n_mm_layers"] or 1, int)

        mm = knn_graph_sparse(self.v_feat_np, self.knn_k, norm_type="binary_row")
        mm = dataclasses.replace(mm, vals=mm.vals * self.mm_image_weight)
        tg = knn_graph_sparse(self.t_feat_np, self.knn_k, norm_type="binary_row")
        tg = dataclasses.replace(tg, vals=tg.vals * (1.0 - self.mm_image_weight))
        rows2 = jnp.concatenate([mm.rows, tg.rows])
        order = jnp.argsort(rows2, stable=True)
        self.mm_adj = SparseGraph(
            rows=rows2[order],
            cols=jnp.concatenate([mm.cols, tg.cols])[order],
            vals=jnp.concatenate([mm.vals, tg.vals])[order],
            n_rows=self.n_items,
            n_cols=self.n_items,
        ).with_span()

    def forward(self, params):
        v_rep = self._tower(
            params["v_preference"], params["v_mlp"], params["v_mlp1"], self.v_feat,
            self.src_v, self.dst_v, self._span_v,
        )
        t_rep = self._tower(
            params["t_preference"], params["t_mlp"], params["t_mlp1"], self.t_feat,
            self.src_t, self.dst_t, self._span_t,
        )
        representation = jnp.concatenate([v_rep, t_rep], axis=1)  # 'cat'
        # users: weight_u-scaled concat of tower halves (dragon.py:231-244)
        wu = jnp.transpose(params["weight_u"], (0, 2, 1))  # (U, 1, 2)
        user_stack = jnp.stack([v_rep[: self.n_users], t_rep[: self.n_users]], axis=2)
        user_w = wu * user_stack  # (U, d, 2)
        user_rep = jnp.concatenate([user_w[:, :, 0], user_w[:, :, 1]], axis=1)

        item_rep = representation[self.n_users :]
        h = item_rep
        for _ in range(self.n_mm_layers):
            h = spmm(self.mm_adj, h)
        h_u1 = jnp.einsum("uk,ukd->ud", self.user_nbr_w, user_rep[self.user_nbrs])
        user_rep = user_rep + h_u1
        item_rep = item_rep + h
        return jnp.concatenate([user_rep, item_rep], axis=0)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        out = self.forward(params)
        u = out[users]
        p_e = out[pos + self.n_users]
        n_e = out[neg + self.n_users]
        denom = jnp.maximum(w.sum(), 1.0)
        per = -jnp.log2(jax.nn.sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) + 1e-12)
        loss = (per * w).sum() / denom
        reg = (
            (params["v_preference"][users] ** 2).mean()
            + (params["t_preference"][users] ** 2).mean()
            + (params["weight_u"] ** 2).mean()
        )
        total = loss + self.reg_weight * reg
        return total, (total,)
