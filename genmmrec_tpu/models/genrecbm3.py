"""GenRecBM3: BM3 with IPW causal denoising + RF generation hooks
(reference `src/models/genrecbm3.py:17-333`).

- propensity-weighted denoising GCN (α·S+β propensity over train edges,
  T/e IPW adjacency, relu-MLP layers) producing denoised embeddings used as
  the RF target; propensity BCE added to the loss;
- RF generator conditioned on the projected modal features (user side
  lifted via R); training mixes return originals, inference mixes
  ``orig + ratio·generated`` into the BM3 representation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from genmmrec_tpu.common.init import apply_linear, linear_params, xavier_normal
from genmmrec_tpu.models import rf_modules as rf
from genmmrec_tpu.models.base import scalar
from genmmrec_tpu.models.bm3 import BM3
from genmmrec_tpu.models.rf_host import RFHostMixin


class GenRecBM3(RFHostMixin, BM3):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_dim)
        self._rf_condition_dim = 2 * self.feat_embed_dim
        self.ps_loss_weight = scalar(config["ps_loss_weight"], default=0.1)

    def init_params(self, key):
        params = super().init_params(key)
        k_cd = jax.random.fold_in(key, 99)
        params["causal_denoiser"] = rf.init_causal_denoiser(
            k_cd, self.embedding_dim, self.n_layers
        )
        return params

    def rf_condition_feats(self, params):
        return [
            apply_linear(params["image_trs"], params["image_embedding"]),
            apply_linear(params["text_trs"], params["text_embedding"]),
        ]

    def _denoised(self, params):
        ego = jnp.concatenate(
            [params["user_embedding"], params["item_id_embedding"]], axis=0
        )
        return rf.causal_denoise(
            params["causal_denoiser"],
            ego,
            self.data.users,
            self.data.items,
            jnp.ones_like(self.data.users, dtype=jnp.float32),
            self.n_users,
            self.n_items,
        )

    def rf_host_repr(self, params, state):
        # RF target = the IPW-denoised embedding (genrecbm3.py:90)
        denoised, _ = self._denoised(params)
        return jax.lax.stop_gradient(denoised)

    def loss(self, params, state, batch, key):
        total, parts = super().loss(params, state, batch, key)
        _, ps_loss = self._denoised(params)
        total = total + self.ps_loss_weight * ps_loss
        return total, (total,)

    def full_embeddings(self, params, state):
        if not self.use_rf:
            return BM3.full_embeddings(self, params, state)
        u, i = self.propagate(params)
        final = jnp.concatenate([u, i], axis=0)
        conditions = self._rf_conditions(params)
        generated = rf.generate(params["rf"], self.rf_cfg, jax.random.PRNGKey(0), conditions)
        warmed = (state["rf_epoch"] >= self.rf_cfg.warmup_epochs).astype(jnp.float32)
        mixed = final + warmed * self.rf_cfg.inference_mix_ratio * generated
        pred = lambda x: apply_linear(params["predictor"], x)
        return pred(mixed[: self.n_users]), pred(mixed[self.n_users :])

    def scores(self, params, state, users):
        u, i = self.full_embeddings(params, state)
        return u[users] @ i.T
