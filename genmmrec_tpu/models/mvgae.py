"""MVGAE: multimodal variational graph auto-encoder (TMM '21).

Parity with reference `src/models/mvgae.py:27-348`: three GCN towers
(visual, text, collaborative) each emitting (μ, logσ²) via mean-aggregated
self-looped message passing with normalize+dropout updates; modality fusion
by a two-stage Product-of-Experts; reparameterized z with 0.1-scaled noise;
loss = Σ over {fused, v, t, c} of (sum-reduced log₂-BPR reconstruction with
max-over-negatives + β·KL); amazon-style sigmoid regularization on z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.mp import degree, propagate

MAX_LOGVAR = 10.0
_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


def _uniform_init(key, shape, bound_dim):
    b = 1.0 / np.sqrt(bound_dim)
    return jax.random.uniform(key, shape, minval=-b, maxval=b)


class MVGAE(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.dim_x = scalar(config["embedding_size"], int)
        self.num_layer = scalar(config["n_layers"], int)
        self.beta = scalar(config["beta"])
        self.dim_latent = 128
        self.N = self.n_users + self.n_items

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        users = users.astype(np.int32)
        items = (items + self.n_users).astype(np.int32)
        loops = np.arange(self.N, dtype=np.int32)
        src = np.concatenate([users, items, loops])
        dst = np.concatenate([items, users, loops])
        from genmmrec_tpu.ops.mp import sort_edges_by_dst

        src, dst, self._pspan = sort_edges_by_dst(src, dst, self.N)
        self.src, self.dst = jnp.asarray(src), jnp.asarray(dst)

    def _tower_params(self, key, dim_feat):
        ks = jax.random.split(key, 16)
        d, dl = self.dim_x, self.dim_latent
        lin = lambda k, i, o: {"w": xavier_normal(k, (o, i)), "b": jnp.zeros((o,))}
        conv = lambda k, i, o: {
            "w": _uniform_init(k, (i, o), i),
            "b": _uniform_init(jax.random.fold_in(k, 1), (o,), i),
        }
        return {
            "preference": xavier_normal(ks[0], (self.n_users, dl)),
            "mlp": lin(ks[1], dim_feat, dl),
            "conv1": conv(ks[2], dl, d),
            "g1": lin(ks[3], d, d),
            "conv2": conv(ks[4], d, d),
            "g2": lin(ks[5], d, d),
            "conv4": conv(ks[6], d, d),
            "lin4": lin(ks[7], d, d),
            "g4": lin(ks[8], d, d),
            "conv5": conv(ks[9], d, d),
            "lin5": lin(ks[10], d, d),
            "g5": lin(ks[11], d, d),
        }

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        return {
            "collaborative": xavier_normal(ks[0], (self.n_items, self.dim_x)),
            "v_gcn": self._tower_params(ks[1], self.v_feat.shape[1]),
            "t_gcn": self._tower_params(ks[2], self.t_feat.shape[1]),
            "c_gcn": self._tower_params(ks[3], self.dim_x),
        }

    def _conv(self, p, x, key=None):
        h = propagate(
            x @ p["w"], self.src, self.dst, self.N, "mean", pallas_span=self._pspan
        )
        h = h + p["b"]
        h = _l2n(h)
        if key is not None:  # dropout p=0.1 in train
            keep = jax.random.bernoulli(key, 0.9, h.shape)
            h = jnp.where(keep, h / 0.9, 0.0)
        return h

    def _tower(self, tp, features, key=None):
        lrelu = lambda x: jax.nn.leaky_relu(x, 0.01)
        lin = lambda q, x: x @ q["w"].T + q["b"]
        ks = jax.random.split(key, 4) if key is not None else [None] * 4
        tf = lin(tp["mlp"], features)
        x = _l2n(jnp.concatenate([tp["preference"], tf], axis=0))
        if self.num_layer > 0:
            x = lrelu(lin(tp["g1"], lrelu(self._conv(tp["conv1"], x, ks[0]))))
        if self.num_layer > 1:
            x = lrelu(lin(tp["g2"], lrelu(self._conv(tp["conv2"], x, ks[1]))))
        mu = lin(tp["g4"], lrelu(self._conv(tp["conv4"], x, ks[2]))) + lrelu(lin(tp["lin4"], x))
        logvar = lin(tp["g5"], lrelu(self._conv(tp["conv5"], x, ks[3]))) + lrelu(lin(tp["lin5"], x))
        return mu, logvar

    @staticmethod
    def _poe(mus, logvars, eps=1e-8):
        var = jnp.exp(jnp.stack(logvars)) + eps
        T = 1.0 / var
        pd_mu = (jnp.stack(mus) * T).sum(0) / T.sum(0)
        pd_var = 1.0 / T.sum(0)
        return pd_mu, jnp.log(pd_var)

    def forward(self, params, key=None):
        ks = jax.random.split(key, 3) if key is not None else [None] * 3
        v_mu, v_lv = self._tower(params["v_gcn"], self.v_feat, ks[0])
        t_mu, t_lv = self._tower(params["t_gcn"], self.t_feat, ks[1])
        c_mu, c_lv = self._tower(params["c_gcn"], params["collaborative"], ks[2])
        pd_mu, pd_lv = self._poe([v_mu, t_mu], [v_lv, t_lv])
        pd_mu, pd_lv = self._poe([pd_mu, c_mu], [pd_lv, c_lv])
        return pd_mu, pd_lv, (v_mu, v_lv), (t_mu, t_lv), (c_mu, c_lv)

    def _reparam(self, key, mu, logvar):
        logvar = jnp.clip(logvar, max=MAX_LOGVAR)
        return mu + jax.random.normal(key, mu.shape) * 0.1 * jnp.exp(0.5 * logvar)

    def _recon(self, z, users, pos, neg, weights):
        z = jax.nn.sigmoid(z)  # amazon-style regularization
        pos_s = jax.nn.sigmoid((z[users] * z[pos + self.n_users]).sum(1))
        neg_s = jax.nn.sigmoid((z[users] * z[neg + self.n_users]).sum(1))
        per = -jnp.log2(jax.nn.sigmoid(pos_s - neg_s) + 1e-12)
        return (per * weights).sum()

    @staticmethod
    def _kl(mu, logvar):
        logvar = jnp.clip(logvar, max=MAX_LOGVAR)
        return -0.5 * (1 + logvar - mu**2 - jnp.exp(logvar)).sum(1).mean()

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        k_f, k_z, k_v, k_t, k_c = jax.random.split(key, 5)
        pd_mu, pd_lv, (v_mu, v_lv), (t_mu, t_lv), (c_mu, c_lv) = self.forward(params, k_f)
        z = self._reparam(k_z, pd_mu, pd_lv)
        total = self._recon(z, users, pos, neg, w) + self.beta * self._kl(pd_mu, pd_lv)
        for kk, (mu, lv) in ((k_v, (v_mu, v_lv)), (k_t, (t_mu, t_lv)), (k_c, (c_mu, c_lv))):
            zz = self._reparam(kk, mu, lv)
            total = total + self._recon(zz, users, pos, neg, w) + self.beta * self._kl(mu, lv)
        return total, (total,)

    def full_embeddings(self, params, state):
        pd_mu, _, _, _, _ = self.forward(params)
        result = jax.nn.sigmoid(pd_mu)
        return result[: self.n_users], result[self.n_users :]

    def scores(self, params, state, users):
        pd_mu, _, _, _, _ = self.forward(params)
        result = jax.nn.sigmoid(pd_mu)
        return result[users] @ result[self.n_users :].T
