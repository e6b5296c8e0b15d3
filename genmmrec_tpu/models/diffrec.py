"""DiffRec: Diffusion Recommender Model (SIGIR 2023).

Parity with reference `src/models/diffrec.py:313-396`: DDPM over the dense
per-user interaction vector (dim = n_items), DNN x0-prediction denoiser with
sinusoidal time embedding, linear/linear-var schedules, SNR loss weighting
with importance-sampled timesteps (Lt history), inference = full reverse
chain from the (optionally re-noised) history vector.

TPU-native deltas: the per-user interaction vectors are materialized on
device from the padded history matrix (the reference slices a host CSR per
batch, `diffrec.py:359-365`); the Lt importance buffer is threaded state
updated inside the jitted epoch scan; p_sample is a ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion import (
    apply_dnn,
    init_dnn,
    init_lt_state,
    make_schedule,
    p_sample_loop,
    q_sample,
    sample_timesteps,
    snr,
    update_lt_state,
)


class DiffRec(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.steps = scalar(config["steps"], int)
        self.noise_scale = scalar(config["noise_scale"])
        self.noise_min = scalar(config["noise_min"])
        self.noise_max = scalar(config["noise_max"])
        self.dropout = scalar(config["dropout"])
        self.reweight = bool(config["reweight"])
        self.sampling_steps = scalar(config["sampling_steps"] or 0, int)
        self.emb_size = scalar(config["embedding_size"], int)

        dims = config["dims"] if isinstance(config["dims"], list) else [config["dims"]]
        self.out_dims = list(dims) + [self.n_items]
        self.in_dims = self.out_dims[::-1]

        self.sched = make_schedule(
            str(config["noise_schedule"]),
            self.noise_scale,
            self.noise_min,
            self.noise_max,
            self.steps,
        )

    # ------------------------------------------------------------------
    def interaction_vectors(self, users: jnp.ndarray) -> jnp.ndarray:
        """(B, n_items) dense binary history rows from the padded hist."""
        B = users.shape[0]
        h = self.data.hist[users]  # (B, max_hist), pad = n_items
        x = jnp.zeros((B, self.n_items), jnp.float32)
        return x.at[jnp.arange(B)[:, None], h].set(1.0, mode="drop")

    def init_params(self, key):
        return {"dnn": init_dnn(key, self.in_dims, self.out_dims, self.emb_size)}

    def init_state(self, key):
        return init_lt_state(self.steps)

    # ------------------------------------------------------------------
    def _diffusion_loss(self, params, state, users, weight, key):
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        x_start = self.interaction_vectors(users)
        B = x_start.shape[0]
        ts, pt = sample_timesteps(
            k_t, state, B, method="importance" if self.reweight else "uniform"
        )
        noise = jax.random.normal(k_noise, x_start.shape)
        x_t = q_sample(self.sched, x_start, ts, noise) if self.noise_scale != 0 else x_start
        model_out = apply_dnn(
            params["dnn"], x_t, ts, dropout=self.dropout, key=k_drop
        )
        mse = jnp.mean((x_start - model_out) ** 2, axis=1)
        if self.reweight:
            w = snr(self.sched, ts - 1) - snr(self.sched, ts)
            w = jnp.where(ts == 0, 1.0, w)
        else:
            w = jnp.ones((B,))
        losses = w * mse
        new_state = update_lt_state(state, ts, losses, weight) if self.reweight else state
        losses = losses / pt
        total = (losses * weight).sum() / jnp.maximum(weight.sum(), 1.0)
        return total, new_state

    def loss_and_update(self, params, state, batch, key):
        total, new_state = self._diffusion_loss(
            params, state, batch["users"], batch["weight"], key
        )
        return total, ((total,), new_state)

    def loss(self, params, state, batch, key):
        total, _ = self._diffusion_loss(
            params, state, batch["users"], batch["weight"], key
        )
        return total, (total,)

    # ------------------------------------------------------------------
    def scores(self, params, state, users):
        x_start = self.interaction_vectors(users)
        denoise = lambda x, t: apply_dnn(params["dnn"], x, t)
        return p_sample_loop(
            self.sched, denoise, x_start, self.sampling_steps, sampling_noise=False
        )
