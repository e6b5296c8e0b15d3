"""SELFCF_{ed}: self-supervised CF with embedding dropout.

Parity with reference `src/models/selfcfed_lgn.py:28-78`: LightGCN encoder
(shared, `common/encoders.py`), dropout-perturbed detached targets, linear
predictor, negative-cosine losses halved, L2 regularization; prediction sums
both online→target directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genmmrec_tpu.common.encoders import LightGCNEncoder
from genmmrec_tpu.common.init import apply_linear, linear_params, xavier_normal
from genmmrec_tpu.common.losses import l2_loss
from genmmrec_tpu.models.base import RecModel, scalar


class SELFCFED_LGN(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.latent_size = scalar(config["embedding_size"], int)
        self.dropout = scalar(config["dropout"])
        self.reg_weight = scalar(config["reg_weight"])
        self.encoder = LightGCNEncoder(config, data)

    def init_params(self, key):
        ke, kp = jax.random.split(key)
        return {
            "encoder": self.encoder.init_params(ke),
            "predictor": linear_params(kp, self.latent_size, self.latent_size, init=xavier_normal),
        }

    def loss(self, params, state, batch, key):
        users, items, w = batch["users"], batch["pos"], batch["weight"]
        k_u, k_i = jax.random.split(key)
        u_online, i_online = self.encoder.propagate(params["encoder"])
        sg = jax.lax.stop_gradient
        drop = lambda k, x: jnp.where(
            jax.random.bernoulli(k, 1.0 - self.dropout, x.shape),
            x / (1.0 - self.dropout),
            0.0,
        )
        u_target = drop(k_u, sg(u_online))
        i_target = drop(k_i, sg(i_online))

        reg = l2_loss(u_online, i_online)
        pred = lambda x: apply_linear(params["predictor"], x)
        u_on, i_on = pred(u_online), pred(i_online)

        def neg_cos(p, z):
            pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
            zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
            per = -(pn * zn).sum(-1)
            return (per * w).sum() / jnp.maximum(w.sum(), 1.0)

        loss_ui = neg_cos(u_on[users], sg(i_target[items])) / 2
        loss_iu = neg_cos(i_on[items], sg(u_target[users])) / 2
        total = loss_ui + loss_iu + self.reg_weight * reg
        return total, (total,)

    def eval_artifacts(self, params, state):
        u_online, i_online = self.encoder.propagate(params["encoder"])
        pred = lambda x: apply_linear(params["predictor"], x)
        return u_online, i_online, pred(u_online), pred(i_online)

    def scores_cached(self, params, state, users, artifacts):
        u_online, i_online, u_on, i_on = artifacts
        return u_on[users] @ i_online.T + u_online[users] @ i_on.T

    def scores(self, params, state, users):
        return self.scores_cached(params, state, users, self.eval_artifacts(params, state))
