"""VBPR (He & McAuley, AAAI 2016).

Parity with reference `src/models/vbpr.py:20-106`: user embedding of size
2*d; item side = [id embedding (d) ; linear projection of raw multimodal
features (d)]; BPR + embedding regularization; full-sort = U @ Iᵀ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genmmrec_tpu.common.init import apply_linear, linear_params, xavier_normal, xavier_uniform
from genmmrec_tpu.common.losses import bpr_loss, emb_loss
from genmmrec_tpu.models.base import RecModel


class VBPR(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_size = int(config["embedding_size"])
        self.reg_weight = float(config["reg_weight"])
        self.feat_dim = self.item_raw_features.shape[1]

    def init_params(self, key):
        ku, ki, kl = jax.random.split(key, 3)
        return {
            "u_embedding": xavier_uniform(ku, (self.n_users, self.embedding_size * 2)),
            "i_embedding": xavier_uniform(ki, (self.n_items, self.embedding_size)),
            # reference re-inits Linear with xavier_normal via module.apply
            # reference VBPR runs self.apply(xavier_normal_initialization),
            # which zeroes Linear biases (common/init.py:8-24)
            "item_linear": linear_params(
                kl, self.feat_dim, self.embedding_size, init=xavier_normal,
                zero_bias=True,
            ),
        }

    def _item_embeddings(self, params):
        proj = apply_linear(params["item_linear"], self.item_raw_features)
        return jnp.concatenate([params["i_embedding"], proj], axis=-1)

    def loss(self, params, state, batch, key):
        item_emb = self._item_embeddings(params)
        u = params["u_embedding"][batch["users"]]
        pos = item_emb[batch["pos"]]
        neg = item_emb[batch["neg"]]
        w = batch["weight"]
        mf = bpr_loss((u * pos).sum(1), (u * neg).sum(1), w)
        reg = emb_loss(u, pos, neg)
        total = mf + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        return params["u_embedding"], self._item_embeddings(params)

    def scores(self, params, state, users):
        item_emb = self._item_embeddings(params)
        return params["u_embedding"][users] @ item_emb.T
