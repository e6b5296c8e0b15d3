"""MCDRec: Multimodal Conditioned Diffusion for Recommendation (WWW 2024).

Parity with reference `src/models/mcdrec.py:159-380`:
- LightGCN backbone with normal(0, 0.1) embeddings over a rowsum-normalized
  adjacency;
- conditional U-Net denoiser over item embeddings reshaped to √d×√d with
  visual/text condition channels and additive time embedding (:16-85);
- per-epoch Diffusion-Guided graph Denoising (DGD): reverse-diffuse ALL
  items from noise, fuse ``diffused = item_emb + ω·x_p``, score existing
  edges, re-sample (1−ρ) of them ∝ relu(1+τ·score), rebuild the graph
  (``pre_epoch_processing``, :218-314);
- loss = BPR + λ_dm · MSE(U-Net x0 prediction, item embedding) (:331-374).

TPU-native deltas: DGD keeps **static nnz** — a Gumbel top-k keep mask over
the fixed train edge list with on-device re-normalization (the reference
rebuilds scipy matrices host-side); convolutions via
``lax.conv_general_dilated`` with batch-stat BatchNorm.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion.dnn import timestep_embedding
from genmmrec_tpu.models.diffusion.schedule import make_schedule, q_posterior_mean, q_sample
from genmmrec_tpu.ops.graph import SparseGraph, spmm


def _conv_init(key, out_c, in_c, k=3):
    """torch Conv2d default (kaiming uniform a=√5 → U(±1/√fan_in))."""
    kw, kb = jax.random.split(key)
    fan_in = in_c * k * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (out_c, in_c, k, k), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_c,), minval=-bound, maxval=bound),
    }


def _conv(p, x, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def _bn2d(x, p, eps=1e-5):
    mu = x.mean(axis=(0, 2, 3), keepdims=True)
    var = x.var(axis=(0, 2, 3), keepdims=True)
    g = p["g"][None, :, None, None]
    b = p["b"][None, :, None, None]
    return (x - mu) / jnp.sqrt(var + eps) * g + b


def _conv_block_init(key, in_c, out_c):
    k1, k2 = jax.random.split(key)
    return {
        "c1": _conv_init(k1, out_c, in_c),
        "bn1": {"g": jnp.ones((out_c,)), "b": jnp.zeros((out_c,))},
        "c2": _conv_init(k2, out_c, out_c),
        "bn2": {"g": jnp.ones((out_c,)), "b": jnp.zeros((out_c,))},
    }


def _conv_block(p, x):
    x = jax.nn.silu(_bn2d(_conv(p["c1"], x), p["bn1"]))
    return jax.nn.silu(_bn2d(_conv(p["c2"], x), p["bn2"]))


class MCDRec(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.latent_dim = scalar(config["embedding_size"], int)
        self.height = int(math.sqrt(self.latent_dim))
        assert self.height * self.height == self.latent_dim, (
            "Embedding size must be a perfect square for U-Net reshaping"
        )
        self.n_layers = scalar(config["lightGCN_n_layers"], int)
        self.lambda_dm = scalar(config["lambda_dm"])
        self.tau = scalar(config["tau"])
        self.rho = scalar(config["rho"])
        self.omega = 0.1
        self.steps = scalar(config["steps"], int)

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        self.edge_users = jnp.asarray(users.astype(np.int32))
        self.edge_items = jnp.asarray(items.astype(np.int32))
        self.n_edges = len(users)
        rows = np.concatenate([users, items + self.n_users]).astype(np.int32)
        cols = np.concatenate([items + self.n_users, users]).astype(np.int32)
        self._order = np.argsort(rows, kind="stable")
        self._perm = jnp.asarray(self._order.astype(np.int32))
        self.adj_rows = jnp.asarray(rows[self._order])
        self.adj_cols = jnp.asarray(cols[self._order])
        from genmmrec_tpu.ops.segment_pallas import chunk_span

        self._pspan = chunk_span(rows[self._order], self.n_users + self.n_items)

        # plain linear schedule, float32 betas (mcdrec.py:107-113) — reuse
        # the shared builder without beta pinning
        self.sched = make_schedule(
            "linear",
            scalar(config["noise_scale"]),
            scalar(config["noise_min"]),
            scalar(config["noise_max"]),
            self.steps,
            beta_fixed=False,
        )

    # edge layout arrays ride as jit arguments alongside v_feat/t_feat —
    # closure constants inflate the remote-compile payload (see
    # RecModel.buffer_names)
    buffer_names = RecModel.buffer_names + (
        "edge_users", "edge_items", "_perm", "adj_rows", "adj_cols",
    )

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 10)
        params = {
            "user_emb": 0.1 * jax.random.normal(ks[0], (self.n_users, self.latent_dim)),
            "item_emb": 0.1 * jax.random.normal(ks[1], (self.n_items, self.latent_dim)),
            "unet": {
                "enc1": _conv_block_init(ks[2], 3, 16),
                "enc2": _conv_block_init(ks[3], 16, 32),
                "dec1": _conv_block_init(ks[4], 48, 16),
                "final": _conv_init(ks[5], 1, 16, k=1),
                "time1": {
                    "w": xavier_normal(ks[6], (self.latent_dim, self.latent_dim)),
                    "b": jnp.zeros((self.latent_dim,)),
                },
                "time2": {
                    "w": xavier_normal(ks[7], (self.latent_dim, self.latent_dim)),
                    "b": jnp.zeros((self.latent_dim,)),
                },
            },
        }
        if self.v_feat is not None:
            params["v_mlp"] = {
                "w": xavier_normal(ks[8], (self.latent_dim, self.v_feat.shape[1])),
                "b": jnp.zeros((self.latent_dim,)),
            }
        if self.t_feat is not None:
            params["t_mlp"] = {
                "w": xavier_normal(ks[9], (self.latent_dim, self.t_feat.shape[1])),
                "b": jnp.zeros((self.latent_dim,)),
            }
        return params

    def unet_apply(self, up, x, t, h_v, h_t):
        B = x.shape[0]
        H = self.height
        img = jnp.stack(
            [x.reshape(B, H, H), h_v.reshape(B, H, H), h_t.reshape(B, H, H)], axis=1
        )
        t_emb = timestep_embedding(t, self.latent_dim)
        t_emb = jax.nn.silu(t_emb @ up["time1"]["w"].T + up["time1"]["b"])
        t_emb = (t_emb @ up["time2"]["w"].T + up["time2"]["b"]).reshape(B, 1, H, H)
        e1 = _conv_block(up["enc1"], img + t_emb)
        e2 = _conv_block(up["enc2"], e1)
        d1 = _conv_block(up["dec1"], jnp.concatenate([e2, e1], axis=1))
        out = _conv(up["final"], d1, padding=0)
        return out.reshape(B, self.latent_dim)

    def _modal_cond(self, params, idx=None):
        def proj(p, f):
            return f @ p["w"].T + p["b"]

        v = (
            proj(params["v_mlp"], self.v_feat if idx is None else self.v_feat[idx])
            if self.v_feat is not None
            else jnp.zeros(
                ((self.n_items if idx is None else idx.shape[0]), self.latent_dim)
            )
        )
        t = (
            proj(params["t_mlp"], self.t_feat if idx is None else self.t_feat[idx])
            if self.t_feat is not None
            else jnp.zeros_like(v)
        )
        return v, t

    # ------------------------------------------------------------------
    def init_state(self, key):
        return {"graph_vals": self._norm_vals(jnp.ones(self.n_edges))}

    def _norm_vals(self, keep):
        """Rowsum-normalized values over the static symmetric edge layout
        (duplicates sum, inf→0 — mcdrec.py get_norm_adj_mat)."""
        du = jax.ops.segment_sum(keep, self.edge_users, num_segments=self.n_users)
        di = jax.ops.segment_sum(keep, self.edge_items, num_segments=self.n_items)
        dis_u = jnp.where(du > 0, du**-0.5, 0.0)
        dis_i = jnp.where(di > 0, di**-0.5, 0.0)
        v = keep * dis_u[self.edge_users] * dis_i[self.edge_items]
        return jnp.concatenate([v, v])[self._perm]

    def pre_epoch(self, params, state, key, epoch):
        """DGD: diffusion-guided edge resampling (mcdrec.py:218-314)."""
        k_x, k_loop, k_gumbel = jax.random.split(key, 3)
        h_v, h_t = self._modal_cond(params)
        x = jax.random.normal(k_x, (self.n_items, self.latent_dim))

        def body(x, inp):
            i, k = inp
            t = jnp.full((self.n_items,), i, jnp.int32)
            pred_x0 = self.unet_apply(params["unet"], x, t, h_v, h_t)
            mean = q_posterior_mean(self.sched, pred_x0, x, t)
            var = self.sched.posterior_variance[t][:, None]
            noise = jax.random.normal(k, x.shape)
            nonzero = (t != 0).astype(x.dtype)[:, None]
            return mean + nonzero * jnp.sqrt(var) * noise, None

        steps_rev = jnp.arange(self.steps - 1, -1, -1)
        keys = jax.random.split(k_loop, self.steps)
        x, _ = jax.lax.scan(body, x, (steps_rev, keys))

        diffused = params["item_emb"] + self.omega * x
        scoresv = (params["user_emb"][self.edge_users] * diffused[self.edge_items]).sum(1)
        weights = jax.nn.relu(1.0 + self.tau * scoresv) + 1e-8
        # multinomial without replacement ∝ weights via Gumbel top-k
        g = -jnp.log(-jnp.log(jax.random.uniform(k_gumbel, (self.n_edges,)) + 1e-20) + 1e-20)
        sc = jnp.log(weights) + g
        n_keep = max(1, int(self.n_edges * (1.0 - self.rho)))
        thresh = jnp.sort(sc)[self.n_edges - n_keep]
        keep = (sc >= thresh).astype(jnp.float32)
        return {"graph_vals": self._norm_vals(keep)}

    # ------------------------------------------------------------------
    def _graph(self, state):
        N = self.n_users + self.n_items
        return SparseGraph(
            rows=self.adj_rows, cols=self.adj_cols, vals=state["graph_vals"],
            n_rows=N, n_cols=N,
            pallas_span=self._pspan, symmetric=True,  # [v, v] mirrored edges
        )

    def encode(self, params, state):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = x
        for _ in range(self.n_layers):
            x = spmm(self._graph(state), x)
            acc = acc + x
        out = acc / (self.n_layers + 1)
        return out[: self.n_users], out[self.n_users :]

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        k_t, k_noise = jax.random.split(key)
        all_users, all_items = self.encode(params, state)
        u_e, p_e, n_e = all_users[users], all_items[pos], all_items[neg]
        pos_s = (u_e * p_e).sum(1)
        neg_s = (u_e * n_e).sum(1)
        denom = jnp.maximum(w.sum(), 1.0)
        bpr = -(jnp.log(jax.nn.sigmoid(pos_s - neg_s) + 1e-12) * w).sum() / denom

        x0 = params["item_emb"][pos]
        h_v, h_t = self._modal_cond(params, pos)
        B = pos.shape[0]
        ts = jax.random.randint(k_t, (B,), 0, self.steps)
        x_t = q_sample(self.sched, x0, ts, jax.random.normal(k_noise, x0.shape))
        pred = self.unet_apply(params["unet"], x_t, ts, h_v, h_t)
        dm = (((pred - x0) ** 2).mean(1) * w).sum() / denom
        total = bpr + self.lambda_dm * dm
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.encode(params, state)

    def scores(self, params, state, users):
        all_users, all_items = self.encode(params, state)
        return all_users[users] @ all_items.T
