"""Shared LightGCN encoder (reference `src/common/encoders.py:11-131`),
used by SELFCFED_LGN. Functional form: params are an explicit dict; sparse
edge dropout is value masking."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.ops.graph import bipartite_norm_adj, edge_dropout, spmm


class LightGCNEncoder:
    def __init__(self, config, data, n_layers_key: str = "n_layers"):
        from genmmrec_tpu.models.base import scalar

        self.n_users = data.n_users
        self.n_items = data.n_items
        self.latent_size = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config[n_layers_key] or 3, int)
        self.norm_adj = bipartite_norm_adj(
            np.asarray(data.users), np.asarray(data.items), self.n_users, self.n_items
        )

    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_emb": xavier_uniform(ku, (self.n_users, self.latent_size)),
            "item_emb": xavier_uniform(ki, (self.n_items, self.latent_size)),
        }

    def propagate(self, params, dropout_key=None, keep_prob=1.0):
        adj = self.norm_adj
        if dropout_key is not None and keep_prob < 1.0:
            adj = edge_dropout(dropout_key, adj, keep_prob)
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = x
        for _ in range(self.n_layers):
            x = spmm(adj, x)
            acc = acc + x
        out = acc / (self.n_layers + 1)
        return out[: self.n_users], out[self.n_users :]
