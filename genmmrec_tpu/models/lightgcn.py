"""LightGCN (He et al., SIGIR 2020).

Parity with reference `src/models/lightgcn.py:23-164`: xavier-uniform
embedding tables, n_layers of normalized-adjacency propagation with layer
averaging, BPR + ego-embedding regularization.

TPU-native: the propagation is the shared segment-sum SpMM
(`genmmrec_tpu/ops/graph.py`), recomputed per batch exactly like the
reference (full-graph forward every step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.common.losses import bpr_loss, emb_loss
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm


class LightGCN(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.latent_dim = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.norm_adj = bipartite_norm_adj(
            np.asarray(data.users), np.asarray(data.items), self.n_users, self.n_items
        )

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.n_users, self.latent_dim)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.latent_dim)),
        }

    def propagate(self, params):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        layers = [ego]
        x = ego
        for _ in range(self.n_layers):
            x = spmm(self.norm_adj, x)
            layers.append(x)
        out = jnp.mean(jnp.stack(layers, axis=1), axis=1)
        return out[: self.n_users], out[self.n_users :]

    def loss(self, params, state, batch, key):
        u_all, i_all = self.propagate(params)
        u = u_all[batch["users"]]
        pos = i_all[batch["pos"]]
        neg = i_all[batch["neg"]]
        w = batch["weight"]
        mf = bpr_loss((u * pos).sum(1), (u * neg).sum(1), w)
        reg = emb_loss(
            params["user_emb"][batch["users"]],
            params["item_emb"][batch["pos"]],
            params["item_emb"][batch["neg"]],
        )
        total = mf + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.propagate(params)

    def scores(self, params, state, users):
        u_all, i_all = self.propagate(params)
        return u_all[users] @ i_all.T
