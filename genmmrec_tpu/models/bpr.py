"""BPR matrix factorization (Rendle et al., UAI 2009).

Parity with reference `src/models/bpr.py:20-95`: xavier-normal user/item
embedding tables, pairwise BPR loss + Frobenius embedding regularization,
full-sort scores = U @ Iᵀ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.common.losses import bpr_loss, emb_loss
from genmmrec_tpu.models.base import RecModel


class BPR(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_size = int(config["embedding_size"])
        self.reg_weight = float(config["reg_weight"])

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_normal(ku, (self.n_users, self.embedding_size)),
            "item_emb": xavier_normal(ki, (self.n_items, self.embedding_size)),
        }

    def loss(self, params, state, batch, key):
        u = params["user_emb"][batch["users"]]
        pos = params["item_emb"][batch["pos"]]
        neg = params["item_emb"][batch["neg"]]
        w = batch["weight"]
        pos_s = (u * pos).sum(axis=1)
        neg_s = (u * neg).sum(axis=1)
        mf = bpr_loss(pos_s, neg_s, w)
        reg = emb_loss(u, pos, neg)
        total = mf + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        return params["user_emb"], params["item_emb"]

    def scores(self, params, state, users):
        return params["user_emb"][users] @ params["item_emb"].T
