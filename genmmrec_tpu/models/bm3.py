"""BM3: Bootstrap Latent Representations for Multi-modal Recommendation.

Parity with reference `src/models/bm3.py:23-155`: LightGCN propagation with
item-id residual, a shared linear predictor, dropout-perturbed detached
targets, cosine bootstrap losses (u↔i and modal↔id / modal↔modal), no
negative sampling (``use_neg_sampling: False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import apply_linear, linear_params, xavier_normal, xavier_uniform
from genmmrec_tpu.common.losses import emb_loss
from genmmrec_tpu.models.base import RecModel
from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm


def _cos_loss(a, b, weights):
    """1 - cosine_similarity(a, b) weighted mean over rows."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    cos = (an * bn).sum(-1)
    return ((1.0 - cos) * weights).sum() / jnp.maximum(weights.sum(), 1.0)


class BM3(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_dim = int(config["embedding_size"])
        self.feat_embed_dim = int(config["embedding_size"])
        self.n_layers = int(config["n_layers"])
        self.reg_weight = float(config["reg_weight"])
        self.cl_weight = float(config["cl_weight"])
        self.dropout = float(config["dropout"])
        self.norm_adj = bipartite_norm_adj(
            np.asarray(data.users), np.asarray(data.items), self.n_users, self.n_items
        )

    def init_params(self, key):
        ks = jax.random.split(key, 5)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, self.embedding_dim)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, self.embedding_dim)),
            "predictor": linear_params(ks[2], self.embedding_dim, self.embedding_dim, init=xavier_normal),
        }
        if self.v_feat is not None:
            params["image_embedding"] = self.v_feat  # trainable copy (from_pretrained, freeze=False)
            params["image_trs"] = linear_params(
                ks[3], self.v_feat.shape[1], self.feat_embed_dim, init=xavier_normal
            )
        if self.t_feat is not None:
            params["text_embedding"] = self.t_feat
            params["text_trs"] = linear_params(
                ks[4], self.t_feat.shape[1], self.feat_embed_dim, init=xavier_normal
            )
        return params

    def propagate(self, params):
        h = params["item_id_embedding"]
        ego = jnp.concatenate([params["user_embedding"], h], axis=0)
        layers = [ego]
        x = ego
        for _ in range(self.n_layers):
            x = spmm(self.norm_adj, x)
            layers.append(x)
        out = jnp.mean(jnp.stack(layers, axis=1), axis=1)
        return out[: self.n_users], out[self.n_users :] + h

    def loss(self, params, state, batch, key):
        k_u, k_i, k_t, k_v = jax.random.split(key, 4)
        u_online_ori, i_online_ori = self.propagate(params)
        sg = jax.lax.stop_gradient
        drop = lambda k, x: jnp.where(
            jax.random.bernoulli(k, 1.0 - self.dropout, x.shape), x / (1.0 - self.dropout), 0.0
        )
        u_target = drop(k_u, sg(u_online_ori))
        i_target = drop(k_i, sg(i_online_ori))

        pred = lambda x: apply_linear(params["predictor"], x)
        u_online = pred(u_online_ori)
        i_online = pred(i_online_ori)

        users, items, w = batch["users"], batch["pos"], batch["weight"]
        loss_t = loss_v = loss_tv = loss_vt = 0.0
        if self.t_feat is not None:
            t_feat_online = apply_linear(params["text_trs"], params["text_embedding"])
            t_feat_target = drop(k_t, sg(t_feat_online))
            t_on = pred(t_feat_online)[items]
            loss_t = _cos_loss(t_on, sg(i_target[items]), w)
            loss_tv = _cos_loss(t_on, sg(t_feat_target[items]), w)
        if self.v_feat is not None:
            v_feat_online = apply_linear(params["image_trs"], params["image_embedding"])
            v_feat_target = drop(k_v, sg(v_feat_online))
            v_on = pred(v_feat_online)[items]
            loss_v = _cos_loss(v_on, sg(i_target[items]), w)
            loss_vt = _cos_loss(v_on, sg(v_feat_target[items]), w)

        loss_ui = _cos_loss(u_online[users], sg(i_target[items]), w)
        loss_iu = _cos_loss(i_online[items], sg(u_target[users]), w)

        total = (
            loss_ui
            + loss_iu
            + self.reg_weight * emb_loss(u_online_ori, i_online_ori)
            + self.cl_weight * (loss_t + loss_v + loss_tv + loss_vt)
        )
        return total, (total,)

    def full_embeddings(self, params, state):
        u_online, i_online = self.propagate(params)
        pred = lambda x: apply_linear(params["predictor"], x)
        return pred(u_online), pred(i_online)

    def scores(self, params, state, users):
        u_online, i_online = self.propagate(params)
        pred = lambda x: apply_linear(params["predictor"], x)
        return pred(u_online)[users] @ pred(i_online).T
