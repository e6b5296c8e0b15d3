"""PGL: perturbed graph learning variant.

Parity with reference `src/models/pgl.py:22-271`: item side = concatenated
normalized modal projections (2·d), user side = two d-dim user tables
concatenated; frozen FREEDOM-style mixed modal item graph; training graph =
'local' (per-epoch degree-sensitive 30% edge sample, re-normalized,
symmetric) or 'global' (thresholded SVD product subgraph built at init);
loss = BPR + dropout-perturbed self-InfoNCE; eval uses the full adjacency.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal, xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


class PGL(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.mode = str(scalar(config["mode"], str) if config["mode"] else "local")
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.feat_embed_dim = scalar(config["feat_embed_dim"], int)
        self.knn_k = scalar(config["knn_k"], int)
        self.n_layers = scalar(config["n_mm_layers"], int)
        self.n_ui_layers = scalar(config["n_ui_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.mm_image_weight = scalar(config["mm_image_weight"])
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

        # frozen mixed modal graph (FREEDOM builder)
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
        if self.mode == "global":
            self._build_global_subgraph(users, items)

    def _build_global_subgraph(self, users, items):
        """Thresholded SVD product subgraph (pgl.py:140-158), host init."""
        from scipy.sparse import coo_matrix
        from scipy.sparse.linalg import svds

        N = self.n_users + self.n_items
        deg = np.bincount(
            np.concatenate([users, items + self.n_users]), minlength=N
        ).astype(np.float64) + 1e-7
        dis = np.power(deg, -0.5)
        r = np.concatenate([users, items + self.n_users])
        c = np.concatenate([items + self.n_users, users])
        v = dis[r] * dis[c]
        L = coo_matrix((v, (r, c)), shape=(N, N)).tocsc()
        k = min(self.embedding_dim, N - 2)
        u, s, vt = svds(L, k=k)
        nb = int(0.25 * self.embedding_dim)
        prod = s[:nb] * s[-nb:]
        M = u[:, :nb] @ np.diag(prod) @ vt[:nb, :]
        M = M * (np.abs(M) >= 1e-3)
        rr, cc = np.nonzero(M)
        order = np.argsort(rr, kind="stable")
        self.sub_graph = SparseGraph(
            rows=jnp.asarray(rr[order].astype(np.int32)),
            cols=jnp.asarray(cc[order].astype(np.int32)),
            vals=jnp.asarray(M[rr, cc][order].astype(np.float32)),
            n_rows=N,
            n_cols=N,
        ).with_span()

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 4)
        return {
            "user_image": xavier_uniform(ks[0], (self.n_users, self.embedding_dim)),
            "user_text": xavier_uniform(ks[1], (self.n_users, self.embedding_dim)),
            "image_trs": {
                "w": xavier_normal(ks[2], (self.feat_embed_dim, self.v_feat.shape[1])),
                "b": jnp.zeros((self.feat_embed_dim,)),
            },
            "text_trs": {
                "w": xavier_normal(ks[3], (self.feat_embed_dim, self.t_feat.shape[1])),
                "b": jnp.zeros((self.feat_embed_dim,)),
            },
        }

    def init_state(self, key):
        return {"sub_vals": self._full_vals()}

    def _full_vals(self):
        v = self.edge_values
        return jnp.concatenate([v, v])[self._perm]

    def pre_epoch(self, params, state, key, epoch):
        if self.mode != "local":
            return state
        n_keep = int(self.n_edges * 0.3)
        g = -jnp.log(-jnp.log(jax.random.uniform(key, (self.n_edges,)) + 1e-20) + 1e-20)
        sc = jnp.log(self.edge_values) + g
        thresh = jnp.sort(sc)[self.n_edges - n_keep]
        keep = (sc >= thresh).astype(jnp.float32)
        du = jax.ops.segment_sum(keep, self.ui_users, num_segments=self.n_users) + 1e-7
        di = jax.ops.segment_sum(keep, self.ui_items, num_segments=self.n_items) + 1e-7
        v = keep * du[self.ui_users] ** -0.5 * di[self.ui_items] ** -0.5
        return {"sub_vals": jnp.concatenate([v, v])[self._perm]}

    def _train_graph(self, state):
        if self.mode == "global":
            return self.sub_graph
        N = self.n_users + self.n_items
        return SparseGraph(
            rows=self.adj_rows,
            cols=self.adj_cols,
            vals=state["sub_vals"],
            n_rows=N,
            n_cols=N,
            pallas_span=self._pspan,
            symmetric=True,  # [v, v] over mirrored edges
        )

    def forward(self, params, adj):
        image_feats = _l2n(self.v_feat @ params["image_trs"]["w"].T + params["image_trs"]["b"])
        text_feats = _l2n(self.t_feat @ params["text_trs"]["w"].T + params["text_trs"]["b"])
        user_embeds = jnp.concatenate([params["user_image"], params["user_text"]], axis=1)
        item_embeds = jnp.concatenate([image_feats, text_feats], axis=1)
        h = item_embeds
        for _ in range(self.n_layers):
            h = spmm(self.mm_adj, h)
        ego = jnp.concatenate([user_embeds, item_embeds], axis=0)
        acc, x = ego, ego
        for _ in range(self.n_ui_layers):
            x = spmm(adj, x)
            acc = acc + x
        out = acc / (self.n_ui_layers + 1)
        return out[: self.n_users], out[self.n_users :] + h

    def _infonce(self, v1, v2, temp, weights):
        n1, n2 = _l2n(v1), _l2n(v2)
        pos = jnp.exp((n1 * n2).sum(-1) / temp)
        ttl = jnp.exp(n1 @ n2.T / temp).sum(1)
        per = -jnp.log(pos / ttl)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia = self.forward(params, self._train_graph(state))
        u, p_e, n_e = ua[users], ia[pos], ia[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        mf = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom

        def drop(k, x):
            keep = jax.random.bernoulli(k, 1.0 - self.dropout, x.shape)
            return jnp.where(keep, x / (1.0 - self.dropout), 0.0)

        k1, k2, k3, k4 = jax.random.split(key, 4)
        cl = (
            self._infonce(drop(k1, u), drop(k2, u), 0.2, w)
            + self._infonce(drop(k3, p_e), drop(k4, p_e), 0.2, w)
        ) / 2.0
        total = mf + self.reg_weight * cl
        return total, (total,)

    def full_embeddings(self, params, state):
        N = self.n_users + self.n_items
        full = SparseGraph(
            rows=self.adj_rows,
            cols=self.adj_cols,
            vals=self._full_vals(),
            n_rows=N,
            n_cols=N,
            pallas_span=self._pspan,
            symmetric=True,
        )
        return self.forward(params, full)

    def scores(self, params, state, users):
        ua, ia = self.full_embeddings(params, state)
        return ua[users] @ ia.T
