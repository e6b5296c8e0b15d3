"""RF-GUME: GUME enhanced with the pluggable Rectified-Flow generator.

Parity with reference `src/models/rfgume.py:14-395` — the RF-subclass
integration exemplar:
- the RF generator learns to produce GUME's ``extended_id_embeds`` from the
  explicit modal embeddings (conditions), with a user-prior guidance
  ``Z_u − mean(Z_u)`` and zero item prior;
- training: RF trains itself on detached targets/conditions (its loss is
  added to the total; its params update via a dedicated AdamW — here an
  ``optax.multi_transform`` label); host embeddings are unchanged
  (mix returns originals in training);
- inference: ``extended_id = original + inference_mix_ratio · RF-generated``
  once past the warmup epochs;
- optional causal denoising of the RF target (``use_denoise``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from genmmrec_tpu.models import rf_modules as rf
from genmmrec_tpu.models.gume import GUME
from genmmrec_tpu.ops.graph import spmm


class RFGUME(GUME):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.use_rf = True if config["use_rf"] is None else bool(config["use_rf"])
        self.rf_cfg = rf.RFConfig.from_config(
            config, self.n_users, self.n_items, self.embedding_dim
        )
        self.use_denoise = bool(config["use_denoise"])
        self.ps_loss_weight = float(config["ps_loss_weight"] or 0.1)
        # conditions = [explicit_image, explicit_text] concatenated
        self.condition_dim = 2 * self.embedding_dim

    # ------------------------------------------------------------------
    def init_params(self, key):
        k_host, k_rf, k_cd = jax.random.split(key, 3)
        params = super().init_params(k_host)
        if self.use_rf:
            params["rf"] = rf.init_velocity_net(k_rf, self.rf_cfg, self.condition_dim)
        if self.use_denoise:
            params["causal_denoiser"] = rf.init_causal_denoiser(k_cd, self.embedding_dim)
        return params

    def param_labels(self, params):
        labels = {
            k: jax.tree_util.tree_map(lambda _: "main", v)
            for k, v in params.items()
            if k not in ("rf",)
        }
        if "rf" in params:
            labels["rf"] = jax.tree_util.tree_map(lambda _: "rf", params["rf"])
        return labels

    def label_transforms(self):
        return {"rf": optax.adamw(self.rf_cfg.learning_rate)}

    def init_state(self, key):
        return {"epoch": jnp.int32(0)}

    def pre_epoch(self, params, state, key, epoch):
        return {**state, "epoch": jnp.int32(epoch)}

    # ------------------------------------------------------------------
    def _rf_x0(self, params):
        """RF source distribution X0; None = standard Gaussian. RFGUMETime
        overrides this with the historical-graph embeddings."""
        return None

    def _mix_eval(self, original, generated, warmed):
        """Inference-time mixing rule (rfgume.py: additive residual)."""
        return original + warmed * self.rf_cfg.inference_mix_ratio * generated

    def _explicit_embeds(self, params):
        p = params
        img_space = jax.nn.sigmoid(
            self._lin(p["image_trans"], self._lin(p["image_reduce"], self.v_feat))
        )
        txt_space = jax.nn.sigmoid(
            self._lin(p["text_trans"], self._lin(p["text_reduce"], self.t_feat))
        )
        image_item = p["item_id_embedding"] * img_space
        text_item = p["item_id_embedding"] * txt_space
        exp_img_item = self._conv_ii(self.image_original_adj, image_item)
        exp_txt_item = self._conv_ii(self.text_original_adj, text_item)
        explicit_image = jnp.concatenate([spmm(self.R, exp_img_item), exp_img_item], axis=0)
        explicit_text = jnp.concatenate([spmm(self.R, exp_txt_item), exp_txt_item], axis=0)
        return explicit_image, explicit_text

    def loss(self, params, state, batch, key):
        total, parts = super().loss(params, state, batch, key)
        if not self.use_rf:
            return total, parts
        k_rf, k_cd = jax.random.split(jax.random.fold_in(key, 7))

        sg = jax.lax.stop_gradient
        explicit_image, explicit_text = self._explicit_embeds(params)
        conditions = sg(jnp.concatenate([explicit_image, explicit_text], axis=-1))

        rf_target = sg(
            self._conv_ui(self.norm_adj, params["user_embedding"], params["item_id_embedding"])
        )
        ps_loss = 0.0
        if self.use_denoise:
            ego = jnp.concatenate(
                [params["user_embedding"], params["item_id_embedding"]], axis=0
            )
            denoised, ps_loss = rf.causal_denoise(
                params["causal_denoiser"],
                ego,
                self.data.users,
                self.data.items,
                jnp.ones_like(self.data.users, dtype=jnp.float32),
                self.n_users,
                self.n_items,
            )
            rf_target = sg(denoised)

        # user prior: Z_u − mean(Z_u); zero item prior (rfgume.py:152-166)
        Z_u = explicit_image[: self.n_users] + explicit_text[: self.n_users]
        user_prior = Z_u - Z_u.mean(axis=0, keepdims=True)
        full_prior = sg(
            jnp.concatenate(
                [user_prior, jnp.zeros((self.n_items, self.embedding_dim))], axis=0
            )
        )

        x0 = self._rf_x0(params)
        rf_total, rf_loss, cl_loss = rf.rf_losses_staged(
            params["rf"],
            self.rf_cfg,
            k_rf,
            state["epoch"],
            rf_target,
            conditions,
            full_prior,
            batch["users"],
            batch["pos"],
            batch["weight"],
            fixed_noise=sg(x0) if x0 is not None else None,
        )
        total = total + rf_total
        if self.use_denoise:
            total = total + self.ps_loss_weight * ps_loss
        return total, (total,)

    def full_embeddings(self, params, state):
        if not self.use_rf:
            return super().full_embeddings(params, state)
        explicit_image, explicit_text = self._explicit_embeds(params)
        conditions = jnp.concatenate([explicit_image, explicit_text], axis=-1)
        generated = rf.generate_staged(
            params["rf"],
            self.rf_cfg,
            jax.random.PRNGKey(0),
            conditions,
            state["epoch"],
            start_noise=self._rf_x0(params),
        )
        original = self._conv_ui(
            self.norm_adj, params["user_embedding"], params["item_id_embedding"]
        )
        warmed = (state["epoch"] >= self.rf_cfg.warmup_epochs).astype(jnp.float32)
        mixed = self._mix_eval(original, generated, warmed)
        all_e = self.forward(params, extended_id_override=mixed)
        return all_e[: self.n_users], all_e[self.n_users :]

    def scores(self, params, state, users):
        usr, itm = self.full_embeddings(params, state)
        return usr[users] @ itm.T
