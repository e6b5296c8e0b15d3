"""MMGCN: multi-modal graph convolution network (MM '19).

Parity with reference `src/models/mmgcn.py:22-215`: per-modality GCN towers
over the symmetric UI edge list — each of the 3 layers does mean-aggregated
message passing (x@W then neighbor mean), a linear id-combination
(``x_hat = leaky(W1 x) + id_embedding``) and a fusion layer
(``leaky(g(cat(h, x_hat)))`` — the reference's ``concate='False'`` is a
truthy string, so its concat branch is the behavior to match, mmgcn.py:32);
the visual tower adds a 256-d latent projection
and a per-user trainable preference matrix; final representation averages
modality towers; pairwise loss via the [[1],[-1]] score matmul.

Delta: the reference's ``id_embedding``/``preference`` tensors are detached
from the optimizer by a ``.to(device)`` bug (`mmgcn.py:55,126`); here they
are proper trainable parameters (original-paper behavior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.mp import propagate


def _uniform_init(key, shape, bound_dim):
    b = 1.0 / np.sqrt(bound_dim)
    return jax.random.uniform(key, shape, minval=-b, maxval=b)


class MMGCN(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.dim_x = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.aggr = "mean"
        self.dim_latent_v = 256

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        items = items + self.n_users
        src = np.concatenate([users, items]).astype(np.int32)
        dst = np.concatenate([items, users]).astype(np.int32)
        self.N = self.n_users + self.n_items
        from genmmrec_tpu.ops.mp import sort_edges_by_dst

        src, dst, self._pspan = sort_edges_by_dst(src, dst, self.N)
        self.src = jnp.asarray(src)
        self.dst = jnp.asarray(dst)

    def _tower_params(self, key, dim_feat, dim_latent):
        ks = jax.random.split(key, 12)
        d_in = dim_latent if dim_latent else dim_feat
        p = {
            "preference": xavier_normal(ks[0], (self.n_users, d_in)),
            "conv1_w": _uniform_init(ks[1], (d_in, d_in), d_in),
            "lin1": {"w": xavier_normal(ks[2], (self.dim_x, d_in)), "b": jnp.zeros((self.dim_x,))},
            # the reference sets concate='False' — a truthy STRING — so its
            # fusion layers actually take cat(h, x_hat) (mmgcn.py:32,134)
            "g1": {"w": xavier_normal(ks[3], (self.dim_x, d_in + self.dim_x)), "b": jnp.zeros((self.dim_x,))},
            "conv2_w": _uniform_init(ks[4], (self.dim_x, self.dim_x), self.dim_x),
            "lin2": {"w": xavier_normal(ks[5], (self.dim_x, self.dim_x)), "b": jnp.zeros((self.dim_x,))},
            "g2": {"w": xavier_normal(ks[6], (self.dim_x, 2 * self.dim_x)), "b": jnp.zeros((self.dim_x,))},
            "conv3_w": _uniform_init(ks[7], (self.dim_x, self.dim_x), self.dim_x),
            "lin3": {"w": xavier_normal(ks[8], (self.dim_x, self.dim_x)), "b": jnp.zeros((self.dim_x,))},
            "g3": {"w": xavier_normal(ks[9], (self.dim_x, 2 * self.dim_x)), "b": jnp.zeros((self.dim_x,))},
        }
        if dim_latent:
            p["mlp"] = {
                "w": xavier_normal(ks[10], (dim_latent, dim_feat)),
                "b": jnp.zeros((dim_latent,)),
            }
        return p

    def init_params(self, key):
        ks = jax.random.split(key, 3)
        params = {
            "id_embedding": xavier_normal(ks[0], (self.N, self.dim_x)),
        }
        if self.v_feat is not None:
            params["v_gcn"] = self._tower_params(ks[1], self.v_feat.shape[1], self.dim_latent_v)
        if self.t_feat is not None:
            params["t_gcn"] = self._tower_params(ks[2], self.t_feat.shape[1], None)
        return params

    def _tower(self, p, features, id_embedding, has_latent):
        lin = lambda q, x: x @ q["w"].T + q["b"]
        lrelu = lambda x: jax.nn.leaky_relu(x, 0.01)
        feats = lin(p["mlp"], features) if has_latent else features
        x = jnp.concatenate([p["preference"], feats], axis=0)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        for li in (1, 2, 3):
            h = lrelu(
                propagate(
                    x @ p[f"conv{li}_w"], self.src, self.dst, self.N, self.aggr,
                    pallas_span=self._pspan,
                )
            )
            x_hat = lrelu(lin(p[f"lin{li}"], x)) + id_embedding
            x = lrelu(lin(p[f"g{li}"], jnp.concatenate([h, x_hat], axis=1)))
        return x

    def forward(self, params):
        rep = None
        n = 0
        if self.v_feat is not None:
            rep = self._tower(params["v_gcn"], self.v_feat, params["id_embedding"], True)
            n += 1
        if self.t_feat is not None:
            t = self._tower(params["t_gcn"], self.t_feat, params["id_embedding"], False)
            rep = t if rep is None else rep + t
            n += 1
        return rep / n

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        out = self.forward(params)
        u = out[users]
        p_e = out[pos + self.n_users]
        n_e = out[neg + self.n_users]
        pos_s = (u * p_e).sum(1)
        neg_s = (u * n_e).sum(1)
        denom = jnp.maximum(w.sum(), 1.0)
        # reference: -mean(log σ(score @ [[1],[-1]])) over interleaved rows
        per = -(
            jnp.log(jax.nn.sigmoid(pos_s - neg_s) + 1e-12)
        )
        loss = (per * w).sum() / denom
        reg = (
            (params["id_embedding"][users] ** 2).mean()
            + (params["id_embedding"][pos + self.n_users] ** 2).mean()
            + (params["id_embedding"][neg + self.n_users] ** 2).mean()
        )
        if self.v_feat is not None:
            reg = reg + (params["v_gcn"]["preference"] ** 2).mean()
        total = loss + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        out = self.forward(params)
        return out[: self.n_users], out[self.n_users :]

    def scores(self, params, state, users):
        out = self.forward(params)
        return out[users] @ out[self.n_users :].T
