"""MGCN: modality-purified graph convolution (MM '23).

Parity with reference `src/models/mgcn.py:22-263`: behavior-guided purifier
(modal-gated item embeddings), user-item LightGCN view, item-item KNN modal
views lifted to users via the normalized R block, behavior-aware fuser
(common attention + preference gates), BPR + batch-scaled reg + InfoNCE
(temp 0.2) between side and content views.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm, spmm_multi

_EPS = 1e-12


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), _EPS)


def _sym_ui_adj(users, items, n_users, n_items):
    """Jointly rowsum^-0.5-normalized UI adjacency + its normalized R block
    (mgcn.py:109-136)."""
    N = n_users + n_items
    rows = np.concatenate([users, items + n_users]).astype(np.int64)
    cols = np.concatenate([items + n_users, users]).astype(np.int64)
    vals = np.ones(len(rows), np.float64)
    deg = np.zeros(N)
    np.add.at(deg, rows, vals)
    with np.errstate(divide="ignore"):
        dis = np.power(deg, -0.5)
    dis[np.isinf(dis)] = 0.0
    nvals = (dis[rows] * vals * dis[cols]).astype(np.float32)
    order = np.argsort(rows, kind="stable")
    adj = SparseGraph(
        rows=jnp.asarray(rows[order].astype(np.int32)),
        cols=jnp.asarray(cols[order].astype(np.int32)),
        vals=jnp.asarray(nvals[order]),
        n_rows=N,
        n_cols=N,
        symmetric=True,  # UI-only edges, joint rowsum^-1/2 normalization
    ).with_span()
    half = len(users)
    order_u = np.argsort(users, kind="stable")
    R = SparseGraph(
        rows=jnp.asarray(np.asarray(users)[order_u].astype(np.int32)),
        cols=jnp.asarray(np.asarray(items)[order_u].astype(np.int32)),
        vals=jnp.asarray(nvals[:half][order_u]),
        n_rows=n_users,
        n_cols=n_items,
    ).with_span()
    return adj, R


class MGCN(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.cl_loss = scalar(config["cl_loss"])
        self.n_ui_layers = scalar(config["n_ui_layers"], int)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.knn_k = scalar(config["knn_k"], int)
        self.n_layers = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj, self.R = _sym_ui_adj(users, items, self.n_users, self.n_items)
        self.image_original_adj = knn_graph_sparse(self.v_feat_np, self.knn_k, "sym")
        self.text_original_adj = knn_graph_sparse(self.t_feat_np, self.knn_k, "sym")

    def init_params(self, key):
        ks = jax.random.split(key, 12)
        lin = lambda k, i, o, b=True: (
            {"w": xavier_uniform(k, (o, i)), "b": jnp.zeros((o,))}
            if b
            else {"w": xavier_uniform(k, (o, i))}
        )
        d = self.embedding_dim
        return {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            "image_trs": lin(ks[2], self.v_feat.shape[1], d),
            "text_trs": lin(ks[3], self.t_feat.shape[1], d),
            "query1": lin(ks[4], d, d),
            "query2": lin(ks[5], d, 1, b=False),
            "gate_v": lin(ks[6], d, d),
            "gate_t": lin(ks[7], d, d),
            "gate_image_prefer": lin(ks[8], d, d),
            "gate_text_prefer": lin(ks[9], d, d),
        }

    @staticmethod
    def _lin(p, x):
        y = x @ p["w"].T
        return y + p["b"] if "b" in p else y

    def forward(self, params, train=False):
        p = params
        image_feats = self._lin(p["image_trs"], self.v_feat)
        text_feats = self._lin(p["text_trs"], self.t_feat)
        gate = lambda q, x: jax.nn.sigmoid(self._lin(q, x))

        image_item = p["item_id_embedding"] * gate(p["gate_v"], image_feats)
        text_item = p["item_id_embedding"] * gate(p["gate_t"], text_feats)

        ego = jnp.concatenate([p["user_embedding"], p["item_id_embedding"]], axis=0)
        acc = ego
        x = ego
        for _ in range(self.n_ui_layers):
            x = spmm(self.norm_adj, x)
            acc = acc + x
        content = acc / (self.n_ui_layers + 1)

        for _ in range(self.n_layers):
            image_item = spmm(self.image_original_adj, image_item)
        for _ in range(self.n_layers):
            text_item = spmm(self.text_original_adj, text_item)
        # the two R-lifts share R: one column-batched pass
        img_u, txt_u = spmm_multi(self.R, [image_item, text_item])
        image_embeds = jnp.concatenate([img_u, image_item], axis=0)
        text_embeds = jnp.concatenate([txt_u, text_item], axis=0)

        query = lambda x: self._lin(p["query2"], jnp.tanh(self._lin(p["query1"], x)))
        att = jnp.concatenate([query(image_embeds), query(text_embeds)], axis=-1)
        wgt = jax.nn.softmax(att, axis=-1)
        common = wgt[:, 0:1] * image_embeds + wgt[:, 1:2] * text_embeds
        sep_img = gate(p["gate_image_prefer"], content) * (image_embeds - common)
        sep_txt = gate(p["gate_text_prefer"], content) * (text_embeds - common)
        side = (sep_img + sep_txt + common) / 3.0

        all_e = content + side
        u, i = all_e[: self.n_users], all_e[self.n_users :]
        if train:
            return u, i, side, content
        return u, i

    def _infonce(self, v1, v2, temp, weights):
        n1, n2 = _l2n(v1), _l2n(v2)
        pos = jnp.exp((n1 * n2).sum(-1) / temp)
        ttl = jnp.exp(n1 @ n2.T / temp).sum(1)
        per = -jnp.log(pos / ttl)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia, side, content = self.forward(params, train=True)
        u, p_e, n_e = ua[users], ia[pos], ia[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        mf = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom
        reg = self.reg_weight * 0.5 * ((u**2).sum() + (p_e**2).sum() + (n_e**2).sum()) / self.batch_size
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl = self._infonce(side_i[pos], cont_i[pos], 0.2, w) + self._infonce(
            side_u[users], cont_u[users], 0.2, w
        )
        total = mf + reg + self.cl_loss * cl
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.forward(params)

    def scores(self, params, state, users):
        ua, ia = self.forward(params)
        return ua[users] @ ia.T
