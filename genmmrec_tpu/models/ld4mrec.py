"""LD4MRec: lightweight (few-step) diffusion over interaction vectors.

Parity with reference `src/models/ld4mrec.py:15-392`:
- SVD user encoder (top-k of R, u·√s) + one-hop normalized multimodal user
  preference aggregation, projected — concatenated as the condition;
- CNet: FiLM-modulated conditional residual blocks over a hidden projection
  of the noisy interaction vector (:15-87);
- paper-specific noise schedule (1−ᾱ linear in t, betas clamped, :208-239);
- label-smoothed x0 target, importance-sampled timesteps from an EMA loss
  history (threaded model state), one-step inference at the learnable
  ``t_in``.

TPU-native: SVD runs on host at init; the EMA loss history lives in the
``state`` pytree updated per batch inside the jitted epoch scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion.dnn import timestep_embedding  # noqa: F401


def _ld4_time_embedding(t, dim):
    """LD4MRec's own sinusoidal embedding (`src/models/ld4mrec.py:241-250`):
    [sin, cos] order with exp(-log(1e4) * i / (half - 1)) frequencies —
    different from the DiffRec DNN embedding."""
    import math

    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _lin(key, d_in, d_out):
    return {"w": xavier_normal(key, (d_out, d_in)), "b": jnp.zeros((d_out,))}


def _ap(p, x):
    return x @ p["w"].T + p["b"]


def _ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


class LD4MRec(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_size = scalar(config["embedding_size"], int)
        self.steps = scalar(config["steps"], int)
        self.svd_k = scalar(config["svd_k"], int)
        self.smoothing_gamma = scalar(config["smoothing_gamma"])
        self.cnet_hidden = scalar(config["cnet_hidden_size"], int)
        self.cnet_layers = scalar(config["cnet_n_layers"], int)
        self.dropout = scalar(config["dropout"])
        self.min_noise_level = scalar(config["min_noise_level"], default=0.001)

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))

        # SVD user encoder (host)
        from scipy.sparse import coo_matrix
        from scipy.sparse.linalg import svds

        R = coo_matrix(
            (np.ones(len(users), np.float32), (users, items)),
            shape=(self.n_users, self.n_items),
        )
        k = min(self.svd_k, min(R.shape) - 1)
        try:
            u, s, _ = svds(R.tocsc(), k=k)
            u, s = u[:, ::-1], s[::-1]
            # canonicalize the per-column sign ambiguity of svds (flips with
            # the input's storage format): largest-|entry| positive
            flip = np.sign(u[np.abs(u).argmax(axis=0), np.arange(u.shape[1])])
            u = u * np.where(flip == 0, 1.0, flip)[None, :]
            svd_emb = (u * np.sqrt(s)).astype(np.float32)
            if k < self.svd_k:
                svd_emb = np.pad(svd_emb, ((0, 0), (0, self.svd_k - k)))
        except Exception:
            svd_emb = np.random.default_rng(0).normal(
                size=(self.n_users, self.svd_k)
            ).astype(np.float32)
        self.user_svd_emb = jnp.asarray(svd_emb)

        # one-hop normalized multimodal user aggregation (host);
        # LD4MRec concatenates (vision, text) — NOT the VBPR (text, vision)
        # order of item_raw_features (`src/models/ld4mrec.py:168-171`)
        feats = np.concatenate(
            [np.asarray(f, np.float32) for f in (self.v_feat_np, self.t_feat_np) if f is not None],
            axis=1,
        )
        Rd = R.tocsr()
        du = np.asarray(Rd.sum(1)).ravel()
        di = np.asarray(Rd.sum(0)).ravel()
        with np.errstate(divide="ignore"):
            du = np.where(du > 0, du**-0.5, 0.0)
            di = np.where(di > 0, di**-0.5, 0.0)
        user_mm = (Rd.multiply(du[:, None]).multiply(di[None, :])) @ feats
        self.user_mm_emb = jnp.asarray(np.asarray(user_mm, np.float32))
        self.mm_dim = feats.shape[1]
        # large host-precomputed arrays ride as jit ARGUMENTS, not closure
        # constants — inlined constants blow up the compiled program (the
        # remote-compile tunnel rejects >~100MB HLO at baby scale)
        self.buffer_names = self.buffer_names + ("user_svd_emb", "user_mm_emb")

        # paper noise schedule
        t = np.arange(1, self.steps + 1, dtype=np.float64)
        one_minus = self.min_noise_level + (t - 1) / (self.steps - 1) * (
            1 - self.min_noise_level
        )
        alpha_bar = 1 - one_minus
        ab_prev = np.concatenate([[1.0], alpha_bar[:-1]])
        betas = np.clip(1 - alpha_bar / ab_prev, 0.0001, 0.9999)
        self.alpha_bar = jnp.asarray(np.cumprod(1 - betas).astype(np.float32))

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 6 + self.cnet_layers)
        h = self.cnet_hidden
        cond_dim = self.svd_k + self.embedding_size
        layers = []
        for i in range(self.cnet_layers):
            lk = jax.random.split(ks[6 + i], 4)
            layers.append(
                {
                    "ln": {"g": jnp.ones((h,)), "b": jnp.zeros((h,))},
                    "l1": _lin(lk[0], h, h),
                    "l2": _lin(lk[1], h, h),
                    "scale": _lin(lk[2], h, h),
                    "shift": _lin(lk[3], h, h),
                }
            )
        return {
            "mm_project": _lin(ks[0], self.mm_dim, self.embedding_size),
            "item_proj": _lin(ks[1], self.n_items, h),
            "cond_proj": _lin(ks[2], cond_dim, h),
            "time_proj": _lin(ks[3], h, h),
            "output_proj": _lin(ks[4], h, self.n_items),
            "t_in": jnp.zeros((1,)),
            "layers": layers,
        }

    def init_state(self, key):
        return {"loss_history": jnp.ones((self.steps,))}

    def interaction_vectors(self, users):
        B = users.shape[0]
        hh = self.data.hist[users]
        x = jnp.zeros((B, self.n_items), jnp.float32)
        return x.at[jnp.arange(B)[:, None], hh].set(1.0, mode="drop")

    def _cnet(self, params, x_t, t_emb, condition, key=None):
        h = _ap(params["item_proj"], x_t)
        gcond = _ap(params["cond_proj"], condition) + _ap(params["time_proj"], t_emb)
        for i, lp in enumerate(params["layers"]):
            res = h
            z = _ln(h, lp["ln"])
            z = z * (1.0 + _ap(lp["scale"], gcond)) + _ap(lp["shift"], gcond)
            z = jax.nn.gelu(_ap(lp["l1"], z))
            if key is not None and self.dropout > 0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(key, i), 1.0 - self.dropout, z.shape
                )
                z = jnp.where(keep, z / (1.0 - self.dropout), 0.0)
            h = res + _ap(lp["l2"], z)
        return _ap(params["output_proj"], h)

    def _condition(self, params, users):
        u_mm = _ap(params["mm_project"], self.user_mm_emb[users])
        return jnp.concatenate([self.user_svd_emb[users], u_mm], axis=1)

    def loss_and_update(self, params, state, batch, key):
        users, w = batch["users"], batch["weight"]
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        x_in = self.interaction_vectors(users)
        gamma = self.smoothing_gamma
        x0_target = x_in * (1 - gamma) + (1 - x_in) * gamma

        probs = jnp.sqrt(state["loss_history"] ** 2)
        probs = probs / probs.sum()
        t = jax.random.categorical(k_t, jnp.log(probs), shape=(users.shape[0],))
        ab = self.alpha_bar[t][:, None]
        noise = jax.random.normal(k_noise, x_in.shape)
        x_t = jnp.sqrt(ab) * x_in + jnp.sqrt(1 - ab) * noise

        t_emb = _ld4_time_embedding(t, self.cnet_hidden)
        cond = self._condition(params, users)
        pred_x0 = self._cnet(params, x_t, t_emb, cond, k_drop)
        per = ((pred_x0 - x0_target) ** 2).mean(axis=1)

        # EMA loss-history update (reference per-sample loop, here a scatter)
        upd = jax.lax.stop_gradient(per)
        t_drop = jnp.where(w > 0, t, self.steps)
        hist = state["loss_history"]
        new_hist = hist.at[t_drop].set(
            0.9 * hist[jnp.minimum(t_drop, self.steps - 1)] + 0.1 * upd, mode="drop"
        )
        total = (per * w).sum() / jnp.maximum(w.sum(), 1.0)
        return total, ((total,), {"loss_history": new_hist})

    def loss(self, params, state, batch, key):
        total, (parts, _) = self.loss_and_update(params, state, batch, key)
        return total, parts

    def scores(self, params, state, users):
        x_in = self.interaction_vectors(users)
        t_val = jnp.abs(params["t_in"]).repeat(users.shape[0])
        t_emb = _ld4_time_embedding(t_val, self.cnet_hidden)
        cond = self._condition(params, users)
        return self._cnet(params, x_in, t_emb, cond)
