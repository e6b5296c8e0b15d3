"""DiffGraph: heterogeneous graph diffusion (reference
`src/models/diffgraph.py:11-433`).

- two stacks of bipartite DGL-style layers (symmetric degree-normalized
  message passing, leaky-relu 0.5 activations, l2-normalized layer sums)
  over the target and behavior graphs (single behavior == same graph here);
- user/item Denoise MLPs: diffuse the *behavior* embedding toward the
  *target* embedding (SNR-weighted MSE on the full matrices, indexed at the
  batch), the one-step prediction added back into the scoring embeddings;
- inference: full reverse p_sample of both denoisers, added to the target
  embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion import (
    apply_dnn,
    init_dnn,
    make_schedule,
    p_sample_loop,
    q_sample,
    snr,
)
from genmmrec_tpu.ops.mp import degree, propagate

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


class DiffGraph(RecModel):
    is_multimodal = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.latdim = scalar(config["embedding_size"], int)
        self.gcn_layer = scalar(config["gcn_layer"] or 2, int)
        self.steps = scalar(config["steps"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.sampling_steps = scalar(config["sampling_steps"] or 0, int)
        self.d_emb_size = scalar(config["d_emb_size"] or 10, int)
        self.norm = bool(config["norm"])
        self.N = self.n_users + self.n_items

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        users = users.astype(np.int32)
        items = (items + self.n_users).astype(np.int32)
        from genmmrec_tpu.ops.mp import sort_edges_by_dst

        src, dst, self._pspan = sort_edges_by_dst(
            np.concatenate([users, items]), np.concatenate([items, users]), self.N
        )
        self.src = jnp.asarray(src)
        self.dst = jnp.asarray(dst)

        self.sched = make_schedule(
            "linear-var",
            scalar(config["noise_scale"]),
            scalar(config["noise_min"]),
            scalar(config["noise_max"]),
            self.steps,
            beta_fixed_value=0.0001,
        )
        dims = config["dims"] if isinstance(config["dims"], list) else [config["dims"] or 1000]
        self.out_dims = list(dims) + [self.latdim]
        self.in_dims = self.out_dims[::-1]

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        return {
            "user_emb": xavier_uniform(ks[0], (self.n_users, self.latdim)),
            "item_emb": xavier_uniform(ks[1], (self.n_items, self.latdim)),
            "usr_denoiser": init_dnn(ks[2], self.in_dims, self.out_dims, self.d_emb_size),
            "item_denoiser": init_dnn(ks[3], self.in_dims, self.out_dims, self.d_emb_size),
        }

    def _dgl_pass(self, x):
        deg_out = jnp.maximum(degree(self.src, self.N), 1.0)
        deg_in = jnp.maximum(degree(self.dst, self.N), 1.0)
        x = x * (deg_out ** -0.5)[:, None]
        out = propagate(x, self.src, self.dst, self.N, "add", pallas_span=self._pspan)
        out = out * (deg_in ** -0.5)[:, None]
        return jax.nn.leaky_relu(out, 0.5)

    def _stack(self, params):
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = x
        cur = x
        for _ in range(self.gcn_layer):
            cur = self._dgl_pass(cur)
            acc = acc + _l2n(cur)
        return acc

    def forward(self, params):
        ui = self._stack(params)
        heter = self._stack(params)  # single behavior graph == same stack
        return (
            ui[: self.n_users],
            ui[self.n_users :],
            heter[: self.n_users],
            heter[self.n_users :],
        )

    def _diff_losses(self, dn, target, x_start, batch_idx, key, weights):
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        N = x_start.shape[0]
        ts = jax.random.randint(k_t, (N,), 0, self.steps)
        noise = jax.random.normal(k_noise, x_start.shape)
        x_t = q_sample(self.sched, x_start, ts, noise)
        out = apply_dnn(dn, x_t, ts, dropout=0.5, key=k_drop, norm=self.norm)
        mse = ((target - out) ** 2).mean(1)
        w = jnp.where(ts == 0, 1.0, snr(self.sched, ts - 1) - snr(self.sched, ts))
        diff = (w * mse)[batch_idx]
        diff = (diff * weights).sum() / jnp.maximum(weights.sum(), 1.0)
        return diff, out

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        k_u, k_i = jax.random.split(key)
        usr, itm, h_usr, h_itm = self.forward(params)
        u_diff, diff_usr = self._diff_losses(
            params["usr_denoiser"], usr, h_usr, users, k_u, w
        )
        i_diff, diff_itm = self._diff_losses(
            params["item_denoiser"], itm, h_itm, pos, k_i, w
        )
        usr = usr + diff_usr
        itm = itm + diff_itm
        anc, p_e, n_e = usr[users], itm[pos], itm[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        bpr = -(jnp.log(jax.nn.sigmoid((anc * p_e).sum(1) - (anc * n_e).sum(1)) + 1e-12) * w).sum() / denom
        reg = ((anc**2).sum() + (p_e**2).sum() + (n_e**2).sum()) * self.reg_weight / users.shape[0]
        total = bpr + reg + u_diff + i_diff
        return total, (total,)

    def full_embeddings(self, params, state):
        usr, itm, h_usr, h_itm = self.forward(params)
        dn_u = lambda x, t: apply_dnn(params["usr_denoiser"], x, t, norm=self.norm)
        dn_i = lambda x, t: apply_dnn(params["item_denoiser"], x, t, norm=self.norm)
        denoised_u = p_sample_loop(self.sched, dn_u, h_usr, self.sampling_steps)
        denoised_i = p_sample_loop(self.sched, dn_i, h_itm, self.sampling_steps)
        return usr + denoised_u, itm + denoised_i

    def scores(self, params, state, users):
        usr, itm = self.full_embeddings(params, state)
        return usr[users] @ itm.T
