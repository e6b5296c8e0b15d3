"""GRCN: graph-refined convolutional network (MM '20).

Parity with reference `src/models/grcn.py:20-343`:
- ``CGCN`` content towers per modality: MLP-projected features + user
  preference matrix, dot-product GAT attention with segment softmax over
  destinations; routing iterations refine the preference (over the directed
  u→i edge list, mirroring the reference's flow), final pass over the
  symmetrized edges also yields the per-edge confidence ``alpha``;
- edge weights: modal alphas scaled by the learned ``model_specific_conf``
  ([conf[src] on forward edges ; conf[dst] on backward]), max over
  modalities, relu-pruned;
- ``EGCN`` id tower: two SAGE (add-aggregated, weight-multiplied) hops,
  output ``x + x̂₁ + x̂₂``; fusion = concat(id, content reps);
- pairwise loss via the [[1],[-1]] score matmul + preference/id reg means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.mp import propagate, segment_softmax

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


class GRCN(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.dim_x = scalar(config["embedding_size"], int)
        self.dim_C = scalar(config["latent_embedding"] or 64, int)
        self.num_routing = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.N = self.n_users + self.n_items

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        users = users.astype(np.int32)
        items = (items + self.n_users).astype(np.int32)
        self.src_d = jnp.asarray(users)  # directed u -> i
        self.dst_d = jnp.asarray(items)
        # symmetric edges sorted by destination (Pallas segment-sum path);
        # _perm_s maps concat layout [u->i ; i->u] -> sorted order so
        # per-edge tensors built in concat layout can be re-aligned
        src_s = np.concatenate([users, items])
        dst_s = np.concatenate([items, users])
        order = np.argsort(dst_s, kind="stable")
        from genmmrec_tpu.ops.segment_pallas import chunk_span

        self._pspan = chunk_span(dst_s[order], self.N)
        self._perm_s = jnp.asarray(order.astype(np.int32))
        self.src_s = jnp.asarray(src_s[order])
        self.dst_s = jnp.asarray(dst_s[order])
        self.E = len(users)

    def init_params(self, key):
        ks = jax.random.split(key, 8)
        num_modal = 2
        return {
            "id_embedding": xavier_normal(ks[0], (self.N, self.dim_x)),
            "v_preference": xavier_normal(ks[1], (self.n_users, self.dim_C)),
            "v_mlp": {
                "w": xavier_normal(ks[2], (self.dim_C, self.v_feat.shape[1])),
                "b": jnp.zeros((self.dim_C,)),
            },
            "t_preference": xavier_normal(ks[3], (self.n_users, self.dim_C)),
            "t_mlp": {
                "w": xavier_normal(ks[4], (self.dim_C, self.t_feat.shape[1])),
                "b": jnp.zeros((self.dim_C,)),
            },
            "model_specific_conf": xavier_normal(ks[5], (self.N, num_modal)),
        }

    def _gat_pass(self, x, src, dst, span=0):
        """Dot-product attention propagation; returns (out, alpha)."""
        scores = (x[src] * x[dst]).sum(-1)
        alpha = segment_softmax(scores, dst, self.N)
        out = propagate(x, src, dst, self.N, "add", edge_weight=alpha, pallas_span=span)
        return out, alpha

    def _cgcn(self, pref, mlp, feats):
        features = jax.nn.leaky_relu(feats @ mlp["w"].T + mlp["b"], 0.01)
        preference = _l2n(pref)
        features = _l2n(features)
        for _ in range(self.num_routing):
            x = jnp.concatenate([preference, features], axis=0)
            x_hat, _ = self._gat_pass(x, self.src_d, self.dst_d)
            preference = _l2n(preference + x_hat[: self.n_users])
        x = jnp.concatenate([preference, features], axis=0)
        x_hat, alpha = self._gat_pass(x, self.src_s, self.dst_s, self._pspan)
        return x + x_hat, alpha[:, None]

    def forward(self, params):
        v_rep, w_v = self._cgcn(params["v_preference"], params["v_mlp"], self.v_feat)
        t_rep, w_t = self._cgcn(params["t_preference"], params["t_mlp"], self.t_feat)
        content_rep = jnp.concatenate([v_rep, t_rep], axis=1)
        weight = jnp.concatenate([w_v, w_t], axis=1)  # (2E, 2)

        # conf built in concat layout [u->i ; i->u] -> re-align to the sorted
        # edge order that alpha/src_s/dst_s use
        conf = jnp.concatenate(
            [
                params["model_specific_conf"][self.src_d],
                params["model_specific_conf"][self.dst_d],
            ],
            axis=0,
        )[self._perm_s]  # (2E, 2)
        weight = jnp.max(weight * conf, axis=1, keepdims=True)
        weight = jax.nn.relu(weight)[:, 0]

        x = _l2n(params["id_embedding"])
        x1 = propagate(
            x, self.src_s, self.dst_s, self.N, "add",
            edge_weight=weight, pallas_span=self._pspan,
        )
        x2 = propagate(
            x1, self.src_s, self.dst_s, self.N, "add",
            edge_weight=weight, pallas_span=self._pspan,
        )
        id_rep = x + x1 + x2
        return jnp.concatenate([id_rep, content_rep], axis=1)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        out = self.forward(params)
        u = out[users]
        p_e = out[pos + self.n_users]
        n_e = out[neg + self.n_users]
        denom = jnp.maximum(w.sum(), 1.0)
        per = -jnp.log(jax.nn.sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) + 1e-12)
        loss = (per * w).sum() / denom
        id_emb = params["id_embedding"]
        reg = (
            (id_emb[users] ** 2).mean()
            + (id_emb[pos + self.n_users] ** 2).mean()
            + (id_emb[neg + self.n_users] ** 2).mean()
            + (params["v_preference"] ** 2).mean()
            + (params["v_preference"][users] ** 2).mean()
            + (params["t_preference"][users] ** 2).mean()
        )
        total = loss + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        out = self.forward(params)
        return out[: self.n_users], out[self.n_users :]

    def scores(self, params, state, users):
        out = self.forward(params)
        return out[users] @ out[self.n_users :].T
