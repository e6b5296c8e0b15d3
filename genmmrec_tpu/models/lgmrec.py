"""LGMRec: local + global (hypergraph) multimodal embedding (AAAI '24).

Parity with reference `src/models/lgmrec.py:18-215`: frozen raw modal
features; CGE LightGCN embedding; MGE modality propagation seeded by
mean-pooled user features; Gumbel-softmax hyperedge assignment matrices per
modality with dropout, HGNN layers (item→hyper→item/user), fused as
``lge + α·normalize(ghe)``; BPR + hypergraph contrastive (sum-reduced) +
norm regularization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.common.losses import emb_loss
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, bipartite_norm_adj, spmm

_EPS = 1e-12


def _l2n(x):
    # sqrt(sum+eps) keeps the gradient finite at exactly-zero rows
    return x / jnp.sqrt((x**2).sum(axis=1, keepdims=True) + _EPS)


class LGMRec(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.feat_embed_dim = scalar(config["feat_embed_dim"], int)
        self.n_mm_layer = scalar(config["n_mm_layers"], int)
        self.n_ui_layers = scalar(config["n_ui_layers"], int)
        self.n_hyper_layer = scalar(config["n_hyper_layer"], int)
        self.hyper_num = scalar(config["hyper_num"], int)
        self.keep_rate = scalar(config["keep_rate"])
        self.alpha = scalar(config["alpha"])
        self.cl_weight = scalar(config["cl_weight"])
        self.reg_weight = scalar(config["reg_weight"])
        self.tau = 0.2

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj = bipartite_norm_adj(users, items, self.n_users, self.n_items)
        order = np.argsort(users, kind="stable")
        self.adj = SparseGraph(
            rows=jnp.asarray(users[order].astype(np.int32)),
            cols=jnp.asarray(items[order].astype(np.int32)),
            vals=jnp.ones(len(users), jnp.float32),
            n_rows=self.n_users,
            n_cols=self.n_items,
        ).with_span()
        # reference num_inters comes from a binary (A>0) degree over the
        # deduped dict-assembled graph (lgmrec.py:71-77)
        from genmmrec_tpu.ops.graph import unique_ui_pairs

        uu, _ii = unique_ui_pairs(users, items)
        deg_u = np.bincount(uu, minlength=self.n_users).astype(np.float32)
        self.inv_inters_u = jnp.asarray(1.0 / (deg_u + 1e-7))

    def init_params(self, key):
        ks = jax.random.split(key, 6)
        return {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, self.embedding_dim)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, self.embedding_dim)),
            "item_image_trs": xavier_uniform(ks[2], (self.v_feat.shape[1], self.feat_embed_dim)),
            "v_hyper": xavier_uniform(ks[3], (self.v_feat.shape[1], self.hyper_num)),
            "item_text_trs": xavier_uniform(ks[4], (self.t_feat.shape[1], self.feat_embed_dim)),
            "t_hyper": xavier_uniform(ks[5], (self.t_feat.shape[1], self.hyper_num)),
        }

    def _cge(self, params):
        x = jnp.concatenate([params["user_embedding"], params["item_id_embedding"]], axis=0)
        acc = x
        for _ in range(self.n_ui_layers):
            x = spmm(self.norm_adj, x)
            acc = acc + x
        return acc / (self.n_ui_layers + 1)

    def _mge(self, params, modality):
        feats = self.v_feat if modality == "v" else self.t_feat
        trs = params["item_image_trs"] if modality == "v" else params["item_text_trs"]
        item_feats = feats @ trs
        user_feats = spmm(self.adj, item_feats) * self.inv_inters_u[:, None]
        x = jnp.concatenate([user_feats, item_feats], axis=0)
        for _ in range(self.n_mm_layer):
            x = spmm(self.norm_adj, x)
        return x

    def _gumbel_softmax(self, key, logits):
        g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
        return jax.nn.softmax((logits + g) / self.tau, axis=1)

    def _hgnn(self, i_hyper, u_hyper, embeds):
        i_ret = embeds
        u_ret = None
        for _ in range(self.n_hyper_layer):
            lat = i_hyper.T @ i_ret
            i_ret = i_hyper @ lat
            u_ret = u_hyper @ lat
        return u_ret, i_ret

    def forward(self, params, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        drop = lambda k, x: (
            jnp.where(
                jax.random.bernoulli(k, self.keep_rate, x.shape), x / self.keep_rate, 0.0
            )
            if self.keep_rate < 1.0
            else x
        )

        iv = self.v_feat @ params["v_hyper"]
        uv = spmm(self.adj, iv)
        iv = self._gumbel_softmax(ks[0], iv)
        uv = self._gumbel_softmax(ks[1], uv)
        it = self.t_feat @ params["t_hyper"]
        ut = spmm(self.adj, it)
        it = self._gumbel_softmax(ks[2], it)
        ut = self._gumbel_softmax(ks[3], ut)

        cge = self._cge(params)
        mge = _l2n(self._mge(params, "v")) + _l2n(self._mge(params, "t"))
        lge = cge + mge

        item_cge = cge[self.n_users :]
        uv_e, iv_e = self._hgnn(drop(ks[4], iv), drop(ks[5], uv), item_cge)
        ut_e, it_e = self._hgnn(drop(ks[6], it), drop(ks[7], ut), item_cge)
        ghe = jnp.concatenate([uv_e, iv_e], axis=0) + jnp.concatenate([ut_e, it_e], axis=0)
        all_embs = lge + self.alpha * _l2n(ghe)
        return (
            all_embs[: self.n_users],
            all_embs[self.n_users :],
            (uv_e, iv_e, ut_e, it_e),
        )

    def _ssl_triple(self, e1, e2, all_e, weights):
        n1, n2, na = _l2n(e1), _l2n(e2), _l2n(all_e)
        pos = jnp.exp((n1 * n2).sum(1) / self.tau)
        ttl = jnp.exp(n1 @ na.T / self.tau).sum(1)
        return -(jnp.log(pos / ttl) * weights).sum()

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia, (uv_e, iv_e, ut_e, it_e) = self.forward(params, key)
        u, p_e, n_e = ua[users], ia[pos], ia[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        bpr = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom
        hcl = self._ssl_triple(uv_e[users], ut_e[users], ut_e, w) + self._ssl_triple(
            iv_e[pos], it_e[pos], it_e, w
        )
        reg = emb_loss(u, p_e, n_e)
        total = bpr + self.cl_weight * hcl + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        ua, ia, _ = self.forward(params)
        return ua, ia

    def scores(self, params, state, users):
        ua, ia, _ = self.forward(params)
        return ua[users] @ ia.T
