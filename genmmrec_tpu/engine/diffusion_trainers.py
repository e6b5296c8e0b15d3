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
    """GenRec-V1 3-phase trainer (reference `trainer.py:588-820`): train the
    single flip-diffusion ModalDenoiseTransformer, regenerate the UI graph
    from Bayesian reverse sampling with gen_topk blending and optional
    multimodal interest debiasing, then run the standard BPR/CL epoch.

    TPU-native: clustering runs once on host at init; the per-batch debias
    (reference: Python loops over sampled flip pairs) is a vectorized jnp
    transform using precomputed per-user cluster tables."""

    def __init__(self, config, model, mg: bool = False):
        super().__init__(config, model, mg)
        self._diff_built = False
        self._debias_tables = None
        if bool(config["OpenInterestDebiase"]):
            self._init_interest_clustering()

    def _init_interest_clustering(self):
        import numpy as np

        from genmmrec_tpu.common.interest_cluster import (
            DEFAULT_K,
            OPTIMAL_K,
            MultimodalCluster,
            build_debias_tables,
        )

        cfg = self.config
        cluster = MultimodalCluster(
            kmeans_cluster_num=int(cfg["kmeans_cluster_num"] or 20),
            use_auto_optimal_k=bool(cfg["use_auto_optimal_k"]),
        )
        ks = OPTIMAL_K.get(str(cfg["dataset"]), DEFAULT_K)
        getLogger().info("Performing Multimodal Clustering...")
        img_labels = cluster.multimodal_specific_cluster(
            np.asarray(self.model.v_feat), "image_modal", ks.get("image", 18)
        )
        txt_labels = cluster.multimodal_specific_cluster(
            np.asarray(self.model.t_feat), "text_modal", ks.get("text", 59)
        )
        self._debias_tables = build_debias_tables(
            np.asarray(self.model.data.users),
            np.asarray(self.model.data.items),
            self.model.n_users,
            img_labels,
            txt_labels,
        )
        getLogger().info("Multimodal Clustering Done.")

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
        sample_ratio = float(self.config["sample_ratio"] or 0.1)
        debias_tables = self._debias_tables

        def diffusion_batch(carry, xs):
            dn, opt_s, i_embeds, img_feats, txt_feats = carry
            users, key = xs
            valid = (users < U).astype(jnp.float32)
            x_start = model.interaction_vectors(jnp.minimum(users, U - 1)) * valid[:, None]

            def loss_fn(dn):
                return model.diffusion_losses(
                    dn, x_start, i_embeds, img_feats, txt_feats, key
                )

            l, g = jax.value_and_grad(loss_fn)(dn)
            upd, opt_s = self._diff_opt.update(g, opt_s, dn)
            dn = optax.apply_updates(dn, upd)
            return (dn, opt_s, i_embeds, img_feats, txt_feats), l

        @jax.jit
        def diffusion_epoch(params, opt_s, key):
            k_perm, k_scan = jax.random.split(key)
            perm = jax.random.permutation(k_perm, U_pad)
            batches = perm.reshape(self._n_user_batches, B).astype(jnp.int32)
            keys = jax.random.split(k_scan, self._n_user_batches)
            i_embeds = jax.lax.stop_gradient(params["rec"]["item_id_embedding"])
            img_feats = jax.lax.stop_gradient(model.get_image_feats(params))
            txt_feats = jax.lax.stop_gradient(model.get_text_feats(params))
            carry = (params["denoise_image"], opt_s, i_embeds, img_feats, txt_feats)
            carry, losses = jax.lax.scan(diffusion_batch, carry, (batches, keys))
            return {**params, "denoise_image": carry[0]}, carry[1], losses.sum()

        @jax.jit
        def regenerate(params, key):
            k_gen, k_debias, k_drop = jax.random.split(key, 3)
            users = jnp.arange(U_pad, dtype=jnp.int32).reshape(self._n_user_batches, B)
            gen_keys = jax.random.split(k_gen, self._n_user_batches)
            db_keys = jax.random.split(k_debias, self._n_user_batches)

            def one(xs):
                u, kg, kd = xs
                u_c = jnp.minimum(u, U - 1)
                x_start = model.interaction_vectors(u_c)
                blended, probs = model.generate(params["denoise_image"], x_start, kg)
                if debias_tables is not None:
                    blended = _debias(kd, u_c, x_start, blended)
                _, idx = jax.lax.top_k(blended * probs, model.rebuild_k)
                return idx

            def _debias(kd, u, x_start, blended):
                from genmmrec_tpu.common.interest_cluster import interest_debias

                return interest_debias(
                    kd, u, x_start, blended, debias_tables, sample_ratio
                )

            topk = jax.lax.map(one, (users, gen_keys, db_keys)).reshape(
                U_pad, model.rebuild_k
            )[:U]
            return {"image_ui": model.rebuild_ui_graph(topk, k_drop)}

        self._diffusion_epoch = diffusion_epoch
        self._regenerate = regenerate
        self._diff_built = True

    # ------------------------------------------------------------------
    def _epoch_prelude(self, params, key, epoch_idx):
        self._build_diffusion_phase()
        if not hasattr(self, "_diff_opt_state"):
            self._diff_opt_state = self._diff_opt.init(params["denoise_image"])
        k_diff, k_regen = jax.random.split(key)
        t0 = time()
        params, self._diff_opt_state, loss_sum = self._diffusion_epoch(
            params, self._diff_opt_state, k_diff
        )
        new_graphs = self._regenerate(params, k_regen)
        self._state = {**self._state, **new_graphs}
        getLogger().info(
            "Diffusion Loss: %.4f [%.2fs]",
            float(loss_sum) / max(1, self._n_user_batches),
            time() - t0,
        )
        return params


class MVDiffTrainer(Trainer):
    """Filled in alongside the MVDiff model (round-1 WIP)."""
