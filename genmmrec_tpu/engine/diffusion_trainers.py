"""Specialized multi-phase trainers for generative models.

Parity targets: ``DiffMMTrainer`` (`src/common/trainer.py:410-585`),
``GenRecV1Trainer`` (:588-820), ``MVDiffTrainer`` (:822-1202). Each epoch
runs extra phases before the standard BPR epoch:

DiffMM (`trainer.py:487-585`):
  1. train the per-modality Denoise MLPs with their own Adam optimizers over
     dense per-user interaction vectors;
  2. reverse-diffuse every user's vector, take top-``rebuild_k`` items, and
     rebuild the two modal user-item graphs (+ self loops, sym-normalized,
     edge-dropped);
  3. delegate to the generic BPR/CL epoch.

TPU-native deltas: phase 1 is one jitted ``lax.scan`` over user batches
(vs a torch DataLoader loop with per-batch ``.item()`` syncs); phase 2 is a
single jitted chunked ``p_sample`` + top-k + segment-sum normalization (vs
nested Python edge loops + scipy block assembly + host→GPU upload,
`trainer.py:540-576`).
"""

from __future__ import annotations

from functools import partial
from logging import getLogger
from time import time

import jax
import jax.numpy as jnp
import optax

from genmmrec_tpu.engine.trainer import Trainer


class DiffMMTrainer(Trainer):
    def __init__(self, config, model, mg: bool = False):
        super().__init__(config, model, mg)
        self._diff_built = False

    # ------------------------------------------------------------------
    def _build_diffusion_phase(self):
        if self._diff_built:
            return
        model = self.model
        B = self.train_batch_size
        U = model.n_users
        self._n_user_batches = -(-U // B)
        U_pad = self._n_user_batches * B
        self._diff_opt = optax.adam(self.learning_rate)

        def user_vectors(users):
            return model.interaction_vectors(users)

        def diffusion_batch(carry, xs):
            dn_img, dn_txt, opt_i, opt_t, i_embeds, img_feats, txt_feats = carry
            users, key = xs
            k_img, k_txt = jax.random.split(key)
            valid = (users < U).astype(jnp.float32)
            x_start = user_vectors(jnp.minimum(users, U - 1)) * valid[:, None]

            def modal_loss(dn, feats, k):
                diff, gc = model.diffusion_losses(dn, x_start, i_embeds, feats, k)
                # means over real users only
                denom = jnp.maximum(valid.sum(), 1.0)
                return ((diff * valid).sum() + model.e_loss * (gc * valid).sum()) / denom

            li, gi = jax.value_and_grad(modal_loss)(dn_img, img_feats, k_img)
            lt, gt = jax.value_and_grad(modal_loss)(dn_txt, txt_feats, k_txt)
            ui, opt_i = self._diff_opt.update(gi, opt_i, dn_img)
            dn_img = optax.apply_updates(dn_img, ui)
            ut, opt_t = self._diff_opt.update(gt, opt_t, dn_txt)
            dn_txt = optax.apply_updates(dn_txt, ut)
            return (dn_img, dn_txt, opt_i, opt_t, i_embeds, img_feats, txt_feats), (li, lt)

        @jax.jit
        def diffusion_epoch(params, opt_i, opt_t, key):
            k_perm, k_scan = jax.random.split(key)
            perm = jax.random.permutation(k_perm, U_pad)
            batches = perm.reshape(self._n_user_batches, B).astype(jnp.int32)
            keys = jax.random.split(k_scan, self._n_user_batches)
            i_embeds = jax.lax.stop_gradient(params["rec"]["iEmbeds"])
            img_feats = jax.lax.stop_gradient(model.get_image_feats(params))
            txt_feats = jax.lax.stop_gradient(model.get_text_feats(params))
            carry = (
                params["denoise_image"],
                params["denoise_text"],
                opt_i,
                opt_t,
                i_embeds,
                img_feats,
                txt_feats,
            )
            carry, (li, lt) = jax.lax.scan(diffusion_batch, carry, (batches, keys))
            new_params = {**params, "denoise_image": carry[0], "denoise_text": carry[1]}
            return new_params, carry[2], carry[3], li.sum(), lt.sum()

        @jax.jit
        def regenerate(params, key):
            k_img, k_txt = jax.random.split(key)
            users = jnp.arange(U_pad, dtype=jnp.int32).reshape(self._n_user_batches, B)

            def topk_for(dn_params):
                def one(u):
                    x_start = user_vectors(jnp.minimum(u, U - 1))
                    denoised = model.p_sample_users(dn_params, x_start)
                    _, idx = jax.lax.top_k(denoised, model.rebuild_k)
                    return idx

                return jax.lax.map(one, users).reshape(U_pad, model.rebuild_k)[:U]

            g_img = model.rebuild_ui_graph(topk_for(params["denoise_image"]), k_img)
            g_txt = model.rebuild_ui_graph(topk_for(params["denoise_text"]), k_txt)
            return {"image_ui": g_img, "text_ui": g_txt}

        self._diffusion_epoch = diffusion_epoch
        self._regenerate = regenerate
        self._diff_built = True

    # ------------------------------------------------------------------
    def _epoch_prelude(self, params, key, epoch_idx):
        self._build_diffusion_phase()
        if not hasattr(self, "_diff_opt_state_i"):
            self._diff_opt_state_i = self._diff_opt.init(params["denoise_image"])
            self._diff_opt_state_t = self._diff_opt.init(params["denoise_text"])
        k_diff, k_regen = jax.random.split(key)
        t0 = time()
        params, self._diff_opt_state_i, self._diff_opt_state_t, li, lt = (
            self._diffusion_epoch(
                params, self._diff_opt_state_i, self._diff_opt_state_t, k_diff
            )
        )
        new_graphs = self._regenerate(params, k_regen)
        self._state = {**self._state, **new_graphs}
        steps = max(1, self._n_user_batches)
        getLogger().info(
            "Diffusion Loss: Image=%.4f, Text=%.4f [%.2fs]",
            float(li) / steps,
            float(lt) / steps,
            time() - t0,
        )
        return params


class GenRecV1Trainer(Trainer):
    """Filled in alongside the GenRecV1 model (round-1 WIP: falls back to
    the generic trainer so the model can at least be constructed)."""


class MVDiffTrainer(Trainer):
    """Filled in alongside the MVDiff model (round-1 WIP)."""
