"""COHESION: composite GCN with dual-stage fusion and adaptive modality
weighting (reference `src/models/cohesion.py:31-459`).

- three GCNLayer towers (id / visual / text): MLP-projected features
  RMS-combined with the id feature (``sqrt((id²+feat²)/2)``), user
  preference matrices, layer-refined propagation with cosine re-weighting
  over the per-epoch degree-masked adjacency;
- representation = concat(id, v, t) (3·64); user side adds the user-user
  top-40 co-occurrence aggregation, item side adds a mixed modal-KNN hop;
- adaptive optimization: per-modality score softmax indicator re-weights
  the three 64-d segments in the BPR scores;
- loss: −mean(log₂ σ) + preference/weight_u regularization.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.dualgnn import DualGNN
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


class COHESION(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.dim = scalar(config["embedding_size"], int)
        self.feat_embed_dim = scalar(config["feat_embed_dim"], int)
        self.n_layers = scalar(config["n_mm_layers"], int)
        self.knn_k = scalar(config["knn_k"], int)
        self.mm_image_weight = scalar(config["mm_image_weight"])
        self.dropout = scalar(config["dropout"])
        self.num_layer = scalar(config["num_layer"] or 2, int)
        self.reg_weight = scalar(config["reg_weight"])
        self.dim_latent = 64
        self.k = 40
        self.N = self.n_users + self.n_items

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

        self._pspan = chunk_span(rows[self._order], self.N)
        du = np.bincount(users, minlength=self.n_users) + 1e-7
        di = np.bincount(items, minlength=self.n_items) + 1e-7
        self.edge_values = jnp.asarray(
            (np.power(du, -0.5)[users] * np.power(di, -0.5)[items]).astype(np.float32)
        )

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
        # user-user co-occurrence graph (shared builder with DualGNN)
        DualGNN._build_user_graph(self, config, users, items)

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 12)
        d = self.dim_latent

        def tower(k, feat_dim):
            tk = jax.random.split(k, 3)
            return {
                "preference": xavier_normal(tk[0], (self.n_users, d)),
                "mlp": {"w": xavier_normal(tk[1], (4 * d, feat_dim)), "b": jnp.zeros((4 * d,))},
                "mlp1": {"w": xavier_normal(tk[2], (d, 4 * d)), "b": jnp.zeros((d,))},
            }

        return {
            "id_feat": xavier_normal(ks[0], (self.n_items, d)),
            "id_gcn": tower(ks[1], d),
            "v_gcn": tower(ks[2], self.v_feat.shape[1]),
            "t_gcn": tower(ks[3], self.t_feat.shape[1]),
            "weight_u": jax.nn.softmax(xavier_normal(ks[4], (self.n_users, 2, 1)), axis=1),
        }

    def init_state(self, key):
        v = self.edge_values
        return {"masked_vals": jnp.concatenate([v, v])[self._perm]}

    def pre_epoch(self, params, state, key, epoch):
        if self.dropout <= 0:
            return self.init_state(key)
        n_keep = int(self.n_edges * (1.0 - self.dropout))
        g = -jnp.log(-jnp.log(jax.random.uniform(key, (self.n_edges,)) + 1e-20) + 1e-20)
        sc = jnp.log(self.edge_values) + g
        thresh = jnp.sort(sc)[self.n_edges - n_keep]
        keep = (sc >= thresh).astype(jnp.float32)
        du = jax.ops.segment_sum(keep, self.ui_users, num_segments=self.n_users) + 1e-7
        di = jax.ops.segment_sum(keep, self.ui_items, num_segments=self.n_items) + 1e-7
        v = keep * du[self.ui_users] ** -0.5 * di[self.ui_items] ** -0.5
        return {"masked_vals": jnp.concatenate([v, v])[self._perm]}

    def _graph(self, vals):
        return SparseGraph(
            rows=self.adj_rows,
            cols=self.adj_cols,
            vals=vals,
            n_rows=self.N,
            n_cols=self.N,
            pallas_span=self._pspan,
            symmetric=True,  # [v, v] over mirrored edges
        )

    def _tower(self, tp, feats, id_feat, adj, rms_combine=True):
        tf = jax.nn.leaky_relu(feats @ tp["mlp"]["w"].T + tp["mlp"]["b"], 0.01)
        tf = tf @ tp["mlp1"]["w"].T + tp["mlp1"]["b"]
        if rms_combine:
            tf = jnp.sqrt(jnp.abs((id_feat * id_feat + tf * tf) / 2.0) + 1e-8)
        x = _l2n(jnp.concatenate([tp["preference"], tf], axis=0))
        ego = x
        acc = x
        cur = x
        for _ in range(self.num_layer):
            cur = spmm(adj, cur)
            wgt = ( _l2n(cur) * _l2n(ego)).sum(-1)
            cur = wgt[:, None] * cur
            acc = acc + cur
        return acc

    def forward(self, params, state):
        adj = self._graph(state["masked_vals"])
        id_rep = self._tower(params["id_gcn"], params["id_feat"], params["id_feat"], adj, rms_combine=True)
        id_rep = jax.lax.stop_gradient(id_rep)  # reference uses id_rep.data
        v_rep = self._tower(params["v_gcn"], self.v_feat, params["id_feat"], adj)
        t_rep = self._tower(params["t_gcn"], self.t_feat, params["id_feat"], adj)

        user_rep = jnp.concatenate(
            [id_rep[: self.n_users], v_rep[: self.n_users], t_rep[: self.n_users]], axis=1
        )
        item_rep = jnp.concatenate(
            [id_rep[self.n_users :], v_rep[self.n_users :], t_rep[self.n_users :]], axis=1
        )
        h_i = item_rep
        for _ in range(self.n_layers):
            h_i = spmm(self.mm_adj, h_i)
        h_u = jnp.einsum("uk,ukd->ud", self.user_nbr_w, user_rep[self.user_nbrs])
        return user_rep + h_u, item_rep + h_i

    def _adaptive_scores(self, u, p_e, n_e):
        d = self.dim_latent
        pos_seg = (u * p_e).reshape(-1, 3, d).sum(-1)
        neg_seg = (u * n_e).reshape(-1, 3, d).sum(-1)
        indicator = 1.0 - jax.lax.stop_gradient(jax.nn.softmax(pos_seg - neg_seg, axis=-1))
        wgt = jnp.repeat(indicator[:, :, None], d, axis=2).reshape(-1, 3 * d)
        pos = (u * p_e * wgt).sum(1)
        neg = (u * n_e * wgt).sum(1)
        return pos, neg

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        user_rep, item_rep = self.forward(params, state)
        u, p_e, n_e = user_rep[users], item_rep[pos], item_rep[neg]
        pos_s, neg_s = self._adaptive_scores(u, p_e, n_e)
        denom = jnp.maximum(w.sum(), 1.0)
        loss = -(jnp.log2(jax.nn.sigmoid(pos_s - neg_s) + 1e-12) * w).sum() / denom
        reg = (
            (params["v_gcn"]["preference"][users] ** 2).mean()
            + (params["t_gcn"]["preference"][users] ** 2).mean()
            + (params["weight_u"] ** 2).mean()
        )
        total = loss + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.forward(params, state)

    def scores(self, params, state, users):
        user_rep, item_rep = self.forward(params, state)
        return user_rep[users] @ item_rep.T
