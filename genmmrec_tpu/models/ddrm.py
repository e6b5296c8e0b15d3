"""DDRM: Denoising Diffusion Recommender Model (SIGIR 2024).

Parity with reference `src/models/ddrm.py:302-594`:
- LightGCN encoder with normal(0, 0.1) embeddings and rowsum-normalized
  adjacency (:16-72, :347-370);
- two conditional DNN denoisers over user/item **embeddings** — input is
  ``[noise_emb ; time_emb ; condition_emb]`` (:128-154);
- training: element-wise softplus BPR + scalar reg, mixed with the
  embedding-reconstruction MSE by ``alpha``, re-weighted per element by
  ``σ(pos_score)^β`` (:384-433);
- inference: mean of the user's history item embeddings, q-noised to step
  T−1, then ``sampling_steps`` reverse steps of the item denoiser
  conditioned on the user embedding, scored against all items (:435-594).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion.dnn import _denoiser_linear, timestep_embedding
from genmmrec_tpu.models.diffusion.schedule import make_schedule, q_posterior_mean, q_sample
from genmmrec_tpu.ops.graph import SparseGraph, spmm


def _rowsum_norm_adj(users, items, n_users, n_items):
    """Rowsum-normalized symmetric adjacency (ddrm.py:347-364): degrees from
    summed values (duplicates count), inf → 0 — subtly different from the
    LightGCN builder's +1e-7 count-based degrees."""
    from genmmrec_tpu.ops.graph import unique_ui_pairs

    users, items = unique_ui_pairs(users, items)
    N = n_users + n_items
    rows = np.concatenate([users, items + n_users]).astype(np.int64)
    cols = np.concatenate([items + n_users, users]).astype(np.int64)
    deg = np.bincount(rows, minlength=N).astype(np.float64)
    with np.errstate(divide="ignore"):
        dis = np.power(deg, -0.5)
    dis[np.isinf(dis)] = 0.0
    vals = (dis[rows] * dis[cols]).astype(np.float32)
    order = np.argsort(rows, kind="stable")
    return SparseGraph(
        rows=jnp.asarray(rows[order].astype(np.int32)),
        cols=jnp.asarray(cols[order].astype(np.int32)),
        vals=jnp.asarray(vals[order]),
        n_rows=N,
        n_cols=N,
        symmetric=True,  # mirrored edges, joint normalization
    ).with_span()


def _init_cond_dnn(key, dims, latent_dim):
    """Conditional DNN: in_dims_temp = [2*latent + time_emb] + hidden."""
    out_dims = list(dims) + [latent_dim]
    in_dims = out_dims[::-1]
    in_dims_temp = [in_dims[0] * 2 + latent_dim] + list(in_dims[1:])
    n_in, n_out = len(in_dims) - 1, len(out_dims) - 1
    ks = jax.random.split(key, n_in + n_out + 1)
    return {
        "emb_layer": _denoiser_linear(ks[0], latent_dim, latent_dim),
        "in_layers": [
            _denoiser_linear(ks[1 + i], in_dims_temp[i], in_dims_temp[i + 1])
            for i in range(n_in)
        ],
        "out_layers": [
            _denoiser_linear(ks[1 + n_in + i], out_dims[i], out_dims[i + 1])
            for i in range(n_out)
        ],
    }


def _act(name, x):
    return {"tanh": jnp.tanh, "sigmoid": jax.nn.sigmoid, "relu": jax.nn.relu}[name](x)


def _apply_cond_dnn(params, noise_emb, con_emb, t, act="tanh", norm=False, dropout=0.0, key=None):
    latent = params["emb_layer"]["w"].shape[1]
    emb = timestep_embedding(t, latent) @ params["emb_layer"]["w"].T + params["emb_layer"]["b"]
    if norm:
        noise_emb = noise_emb / jnp.maximum(
            jnp.linalg.norm(noise_emb, axis=-1, keepdims=True), 1e-12
        )
    if dropout > 0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout, noise_emb.shape)
        noise_emb = jnp.where(keep, noise_emb / (1.0 - dropout), 0.0)
    h = jnp.concatenate([noise_emb, emb, con_emb], axis=-1)
    for layer in params["in_layers"]:
        h = _act(act, h @ layer["w"].T + layer["b"])
    n_out = len(params["out_layers"])
    for i, layer in enumerate(params["out_layers"]):
        h = h @ layer["w"].T + layer["b"]
        if i != n_out - 1:
            h = _act(act, h)
    return h


class DDRM(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.latent_dim = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config["lightGCN_n_layers"], int)
        self.steps = scalar(config["steps"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.alpha = scalar(config["alpha"])
        self.beta = scalar(config["beta"])
        self.act = str(config["act"] or "tanh")
        self.norm = bool(config["norm"])
        self.sampling_steps = scalar(config["sampling_steps"] or 0, int)
        self.sampling_noise = bool(config["sampling_noise"])
        self.dims = config["dims"] if isinstance(config["dims"], list) else [config["dims"]]

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj = _rowsum_norm_adj(users, items, self.n_users, self.n_items)
        # raw R for mean-history at inference
        order = np.argsort(users, kind="stable")
        self.R = SparseGraph(
            rows=jnp.asarray(users[order].astype(np.int32)),
            cols=jnp.asarray(items[order].astype(np.int32)),
            vals=jnp.ones(len(users), jnp.float32),
            n_rows=self.n_users,
            n_cols=self.n_items,
        )
        self.sched = make_schedule(
            str(config["noise_schedule"] or "linear-var"),
            scalar(config["noise_scale"]),
            scalar(config["noise_min"]),
            scalar(config["noise_max"]),
            self.steps,
        )

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        return {
            "user_emb": 0.1 * jax.random.normal(ks[0], (self.n_users, self.latent_dim)),
            "item_emb": 0.1 * jax.random.normal(ks[1], (self.n_items, self.latent_dim)),
            "user_reverse": _init_cond_dnn(ks[2], self.dims, self.latent_dim),
            "item_reverse": _init_cond_dnn(ks[3], self.dims, self.latent_dim),
        }

    def encode(self, params):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = x
        for _ in range(self.n_layers):
            x = spmm(self.norm_adj, x)
            acc = acc + x
        out = acc / (self.n_layers + 1)
        return out[: self.n_users], out[self.n_users :]

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        k_t, k_un, k_in = jax.random.split(key, 3)
        all_users, all_items = self.encode(params)
        u_e, p_e, n_e = all_users[users], all_items[pos], all_items[neg]

        B = users.shape[0]
        ts = jax.random.randint(k_t, (B,), 0, self.steps)
        noise_u = jax.random.normal(k_un, u_e.shape)
        noise_i = jax.random.normal(k_in, p_e.shape)
        noised_u = q_sample(self.sched, u_e, ts, noise_u)
        noised_i = q_sample(self.sched, p_e, ts, noise_i)
        out_u = _apply_cond_dnn(
            params["user_reverse"], noised_u, p_e, ts, self.act, self.norm
        )
        out_i = _apply_cond_dnn(
            params["item_reverse"], noised_i, u_e, ts, self.act, self.norm
        )
        recon = (((u_e - out_u) ** 2).mean(1) + ((p_e - out_i) ** 2).mean(1)) / 2.0

        u0 = params["user_emb"][users]
        p0 = params["item_emb"][pos]
        n0 = params["item_emb"][neg]
        denom = jnp.maximum(w.sum(), 1.0)
        reg = 0.5 * (
            (u0**2).sum() + (p0**2).sum() + (n0**2).sum()
        ) / B  # scalar, reference divides by len(user)

        pos_s = (u_e * p_e).sum(1)
        neg_s = (u_e * n_e).sum(1)
        bpr_el = jax.nn.softplus(neg_s - pos_s)
        weight = jax.lax.stop_gradient(jax.nn.sigmoid(pos_s)) ** self.beta
        loss_el = (1 - self.alpha) * (bpr_el + reg * self.reg_weight) + self.alpha * recon
        total = (loss_el * weight * w).sum() / denom
        return total, (total,)

    def eval_artifacts(self, params, state):
        return self.encode(params)

    def scores_cached(self, params, state, users, artifacts):
        all_users, all_items = artifacts
        u_e = all_users[users]
        # mean-history item embedding per user via padded hist
        h = self.data.hist[users]  # (B, max_hist), pad=n_items
        valid = (h < self.n_items).astype(jnp.float32)
        gathered = all_items[jnp.minimum(h, self.n_items - 1)] * valid[..., None]
        mean_hist = gathered.sum(1) / jnp.maximum(valid.sum(1, keepdims=True), 1.0)

        key = jax.random.PRNGKey(0)
        tT = jnp.full((u_e.shape[0],), self.steps - 1, jnp.int32)
        x_t = q_sample(self.sched, mean_hist, tT, jax.random.normal(key, mean_hist.shape))
        for i in range(self.sampling_steps - 1, -1, -1):
            t = jnp.full((x_t.shape[0],), i, jnp.int32)
            pred_x0 = _apply_cond_dnn(
                params["item_reverse"], x_t, u_e, t, self.act, self.norm
            )
            x_t = q_posterior_mean(self.sched, pred_x0, x_t, t)
        return x_t @ all_items.T

    def scores(self, params, state, users):
        return self.scores_cached(params, state, users, self.eval_artifacts(params, state))
