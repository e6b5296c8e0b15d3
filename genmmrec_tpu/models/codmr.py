"""CoDMR: Collaborative Diffusion Models for Recommendation (SIGIR 2025).

Parity with reference `src/models/codmr.py:78-662` +
`src/models/codmr_modules/` (gaussian_diffusioncondit, cdenosier,
Nodenoiser):
- target-domain GCN over the symmetric (+I) normalized UI graph, auxiliary
  towers over textual projections and the two item-item KNN graphs
  (text / visual), layer-mean with per-layer l2 normalization;
- two-stage diffusion per domain: unconditional ``Nodenoiser`` (x0) whose
  averaged reconstruction feeds the conditional ``cdenosier`` (eps),
  conditions encoded from the detached target embeddings;
- losses: BPR + reg, ELBO terms from both stages over user/item/text
  domains, structure MSE between condition-aggregated and GCN embeddings,
  two reconstruction BPR heads, SSL InfoNCE between reconstructions;
- inference: full two-stage p_sample producing reconstructed user/item
  embeddings, averaged with interest embeddings and cached per evaluation
  (``eval_artifacts``).

TPU-native deltas: the diffusion losses run over the FULL user/item
matrices instead of the reference's dynamically-shaped ``torch.unique``
batch compaction (static shapes; the per-row objective is identical, only
the sampling weighting over rows differs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal, xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion.dnn import timestep_embedding
from genmmrec_tpu.models.diffusion.schedule import make_schedule, q_posterior_mean, q_sample
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


def _lin(key, d_in, d_out, bias=True):
    p = {"w": xavier_normal(key, (d_out, d_in))}
    if bias:
        p["b"] = jnp.zeros((d_out,))
    return p


def _ap(p, x):
    y = x @ p["w"].T
    return y + p["b"] if "b" in p else y


def _ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _denoiser_lin(key, d_in, d_out):
    kw, kb = jax.random.split(key)
    std = np.sqrt(2.0 / (d_in + d_out))
    return {
        "w": jax.random.normal(kw, (d_out, d_in)) * std,
        "b": jax.random.normal(kb, (d_out,)) * 0.001,
    }


class CoDMR(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.hide_dim = scalar(config["embedding_size"], int)
        self.uiLayers = scalar(config["uiLayers"], int)
        self.au_uiLayers = scalar(config["au_uiLayers"], int)
        self.reg = scalar(config["reg_weight"])
        self.ssl_temp = scalar(config["ssl_temp"])
        self.steps = scalar(config["steps"], int)
        self.sampling_steps = scalar(config["sampling_steps"], int)
        self.emb_size = scalar(config["emb_size"] or 10, int)
        self.knn_k = scalar(config["knn_k"] or 10, int)
        self.elbo_w = scalar(config["elbo_w"])
        self.di_pre_w = scalar(config["di_pre_w"])
        self.con_fe_w = scalar(config["con_fe_w"])
        self.ssl_reg = scalar(config["ssl_reg"])
        self.mean_type = str(config["mean_type"] or "eps")

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        N = self.n_users + self.n_items
        # symmetric (+I) sym-normalized UI graph (codmr.py:_build_ui_mat)
        rows = np.concatenate([users, items + self.n_users, np.arange(N)]).astype(np.int64)
        cols = np.concatenate([items + self.n_users, users, np.arange(N)]).astype(np.int64)
        vals = np.ones(len(rows), np.float64)
        deg = np.zeros(N)
        np.add.at(deg, rows, vals)
        with np.errstate(divide="ignore"):
            dis = np.power(deg, -0.5)
        dis[np.isinf(dis)] = 0.0
        nvals = (dis[rows] * vals * dis[cols]).astype(np.float32)
        order = np.argsort(rows, kind="stable")
        self.uiMat = SparseGraph(
            rows=jnp.asarray(rows[order].astype(np.int32)),
            cols=jnp.asarray(cols[order].astype(np.int32)),
            vals=jnp.asarray(nvals[order]),
            n_rows=N,
            n_cols=N,
            symmetric=True,  # mirrored edges, joint normalization
        ).with_span()
        self.uinorm = jnp.asarray(deg.astype(np.float32))
        self.iciMat = knn_graph_sparse(self.t_feat_np, self.knn_k, "sym")
        self.icaiMat = knn_graph_sparse(self.v_feat_np, self.knn_k, "sym")
        self.text_dim = self.t_feat.shape[1]

        # CoDMR's own beta schedule is the latent-diffusion form:
        # linspace(sqrt(start), sqrt(end), steps)^2
        # (codmr_modules/gaussian_diffusioncondit.py:41-52)
        import dataclasses as _dc

        import numpy as _np

        # the reference force-rewrites any configured schedule to this
        # sqrt-space branch; fail loudly on values it would silently ignore
        noise_schedule = config["noise_schedule"] or "linear"
        if noise_schedule not in ("linear", "linear-var"):
            raise ValueError(
                f"CoDMR supports only linear/linear-var noise_schedule "
                f"(got {noise_schedule!r}); the reference rewrites both to "
                f"the sqrt-space schedule"
            )
        start = scalar(config["noise_scale"]) * scalar(config["noise_min"])
        end = scalar(config["noise_scale"]) * scalar(config["noise_max"])
        betas = (
            _np.linspace(start**0.5, end**0.5, self.steps, dtype=_np.float64) ** 2
        )
        base = make_schedule("linear", 1.0, start, end, self.steps, beta_fixed=False)
        alphas = 1.0 - betas
        acp = _np.cumprod(alphas)
        acp_prev = _np.concatenate([[1.0], acp[:-1]])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        self.sched = _dc.replace(
            base,
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(_np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(_np.sqrt(1.0 - acp)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(
                _np.log(_np.concatenate([[post_var[1]], post_var[1:]]))
            ),
            posterior_mean_coef1=f32(betas * _np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * _np.sqrt(alphas) / (1.0 - acp)),
        )

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 16)
        d = self.hide_dim
        params = {
            "user_emb": xavier_uniform(ks[0], (self.n_users, d)),
            "item_emb": xavier_uniform(ks[1], (self.n_items, d)),
            "uinterest_emb": xavier_uniform(ks[2], (self.n_users, d)),
            "user_emb_text": xavier_uniform(ks[3], (self.n_users, self.text_dim)),
            "item_text_net": _lin(ks[4], self.text_dim, d, bias=False),
            "encodecon1": {"l1": _lin(ks[5], d, d), "l2": _lin(ks[6], d, d)},
            "encodecon2": {"l1": _lin(ks[7], d, d), "l2": _lin(ks[8], d, d)},
            # unconditional denoiser (Nodenoiser)
            "non": {
                "emb_layer": _denoiser_lin(ks[9], self.emb_size, self.emb_size),
                "in": _denoiser_lin(ks[10], d + self.emb_size, d),
                "ln": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "out": _denoiser_lin(ks[11], d, d),
            },
            # conditional denoiser (cdenosier)
            "cdn": {
                "emb_layer": _denoiser_lin(ks[12], self.emb_size, self.emb_size),
                "in": _denoiser_lin(ks[13], d + self.emb_size, d),
                "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "in1": _denoiser_lin(ks[14], d, d),
                "out": _denoiser_lin(jax.random.fold_in(ks[14], 1), d, 2 * d),
                "out1": _denoiser_lin(ks[15], d, d),
            },
        }
        return params

    # -- denoisers ------------------------------------------------------
    def _non_apply(self, p, x, cond, t, train, key=None):
        emb = _ap(p["emb_layer"], timestep_embedding(t, self.emb_size))
        if train and key is not None:
            keep = jax.random.bernoulli(key, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        h = jnp.concatenate([emb, x], axis=-1)
        h = jnp.tanh(_ln(_ap(p["in"], h), p["ln"]))
        return _ap(p["out"], h)

    def _cdn_apply(self, p, x, cond, t, train, key=None):
        d = self.hide_dim
        emb = _ap(p["emb_layer"], timestep_embedding(t, self.emb_size))
        h = jnp.concatenate([emb, cond], axis=-1)
        h = jnp.tanh(_ln(_ap(p["in"], h), p["ln2"]))
        h = _ap(p["out"], h)
        xt = x * h[:, :d] + h[:, d:] + x
        h2 = jnp.tanh(_ln(_ap(p["in1"], xt), p["ln1"]))
        return _ap(p["out1"], h2)

    def _pred_x0_from_eps(self, x_t, t, eps):
        acp = self.sched.alphas_cumprod[t][:, None]
        return jnp.sqrt(1.0 / acp) * x_t - jnp.sqrt(1.0 / acp - 1.0) * eps

    def _train_diff(self, apply_fn, p, x_start, cond, key, eps_mode):
        k_t, k_n, k_d = jax.random.split(key, 3)
        N = x_start.shape[0]
        ts = jax.random.randint(k_t, (N,), 0, self.steps)
        noise = jax.random.normal(k_n, x_start.shape)
        x_t = q_sample(self.sched, x_start, ts, noise)
        out = apply_fn(p, x_t, cond, ts, True, k_d)
        target = noise if eps_mode else x_start
        mse = ((target - out) ** 2).mean(1).mean()
        pred_x0 = self._pred_x0_from_eps(x_t, ts, out) if eps_mode else out
        return mse, pred_x0

    def _p_sample(self, apply_fn, p, x_start, cond, q_steps, eps_mode):
        N = x_start.shape[0]
        if q_steps == 0:
            x_t = x_start
        else:
            t0 = jnp.full((N,), q_steps - 1, jnp.int32)
            x_t = q_sample(self.sched, x_start, t0, jax.random.normal(jax.random.PRNGKey(0), x_start.shape))

        def body(x, i):
            t = jnp.full((N,), i, jnp.int32)
            out = apply_fn(p, x, cond, t, False)
            pred_x0 = self._pred_x0_from_eps(x, t, out) if eps_mode else out
            return q_posterior_mean(self.sched, pred_x0, x, t), None

        x_t, _ = jax.lax.scan(body, x_t, jnp.arange(self.steps - 1, -1, -1))
        return x_t

    # -- encoders -------------------------------------------------------
    def encode(self, params):
        """Target + auxiliary GCN stacks; returns the embedding dict."""
        d = self.hide_dim
        ui = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = [ui]
        x = ui
        for _ in range(self.uiLayers):
            x = spmm(self.uiMat, x)
            acc.append(_l2n(x))
        uiE = jnp.mean(jnp.stack(acc, 1), 1)

        cond_i = _ap(params["item_text_net"], self.t_feat)
        cond_u = _ap(params["item_text_net"], params["user_emb_text"])
        tx = jnp.concatenate([cond_u, cond_i], axis=0)
        acc_tx = [tx]
        it0 = params["item_emb"]
        it1 = params["item_emb"]
        acc0, acc1 = [it0], [it1]
        for _ in range(self.au_uiLayers):
            tx = spmm(self.uiMat, tx)
            it0 = spmm(self.iciMat, it0)
            it1 = spmm(self.icaiMat, it1)
            acc_tx.append(_l2n(tx))
            acc0.append(_l2n(it0))
            acc1.append(_l2n(it1))
        txE = jnp.mean(jnp.stack(acc_tx, 1), 1)
        item0 = jnp.mean(jnp.stack(acc0, 1), 1)
        item1 = jnp.mean(jnp.stack(acc1, 1), 1)
        return {
            "ui_user": uiE[: self.n_users],
            "ui_item": uiE[self.n_users :],
            "ui_full": uiE,
            "tx_user": txE[: self.n_users],
            "tx_item": txE[self.n_users :],
            "item0": item0,
            "item1": item1,
        }

    def _conditions(self, params, enc):
        sg = jax.lax.stop_gradient
        con = lambda p, x: _ap(p["l2"], jax.nn.relu(_ap(p["l1"], x)))
        cond_i = con(params["encodecon1"], sg(enc["ui_item"]))
        cond_u = con(params["encodecon2"], sg(enc["ui_user"]))
        return cond_u, cond_i

    # ------------------------------------------------------------------
    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ks = jax.random.split(key, 6)
        sg = jax.lax.stop_gradient
        enc = self.encode(params)
        cond_u, cond_i = self._conditions(params, enc)
        eps_mode = self.mean_type == "eps"

        # two-stage item-item diffusion
        start_ii = sg((enc["item0"] + enc["item1"]) / 2.0)
        elboNonii, rec_ii_non = self._train_diff(self._non_apply, params["non"], start_ii, cond_i, ks[0], False)
        mid_ii = (sg(rec_ii_non) + start_ii) / 2.0
        elboii, rec_ii = self._train_diff(self._cdn_apply, params["cdn"], mid_ii, sg(cond_i), ks[1], eps_mode)

        # textual item
        tx_i = sg(enc["tx_item"])
        elboNon_txi, rec_txi_non = self._train_diff(self._non_apply, params["non"], tx_i, cond_i, ks[2], False)
        mid_txi = (sg(rec_txi_non) + tx_i) / 2.0
        elbo_txi, rec_txi = self._train_diff(self._cdn_apply, params["cdn"], mid_txi, sg(cond_i), ks[3], eps_mode)

        # textual user
        tx_u = sg(enc["tx_user"])
        elboNon_txu, rec_txu_non = self._train_diff(self._non_apply, params["non"], tx_u, cond_u, ks[4], False)
        mid_txu = (sg(rec_txu_non) + tx_u) / 2.0
        elbo_txu, rec_txu = self._train_diff(self._cdn_apply, params["cdn"], mid_txu, sg(cond_u), ks[5], eps_mode)

        # structure MSE
        full_cond = jnp.concatenate([cond_u, cond_i], axis=0)
        recon = spmm(self.uiMat, full_cond) / (self.uinorm[:, None] + 1e-8)
        mse = 2.0 * ((recon - enc["ui_full"]) ** 2).sum(1).mean()

        denom = jnp.maximum(w.sum(), 1.0)
        u_e, p_e, n_e = enc["ui_user"][users], enc["ui_item"][pos], enc["ui_item"][neg]
        bpr = -(jax.nn.log_sigmoid((u_e * p_e).sum(1) - (u_e * n_e).sum(1)) * w).sum() / denom
        reg = ((u_e**2).sum() + (p_e**2).sum() + (n_e**2).sum()) / users.shape[0]

        # reconstruction BPR heads
        du, dp, dn = rec_txu[users], rec_txi[pos], rec_txi[neg]
        bpr1 = -(jax.nn.log_sigmoid((du * dp).sum(1) - (du * dn).sum(1)) * w).sum() / denom
        reg1 = ((du**2).sum() + (dp**2).sum() + (dn**2).sum()) / users.shape[0]
        pre_u = params["uinterest_emb"][users]
        d1p, d1n = rec_ii[pos], rec_ii[neg]
        bpr2 = -(jax.nn.log_sigmoid((pre_u * d1p).sum(1) - (pre_u * d1n).sum(1)) * w).sum() / denom
        reg2 = ((pre_u**2).sum() + (d1p**2).sum() + (d1n**2).sum()) / users.shape[0]
        loss_diff = (0.95 * (bpr1 + reg1 * self.reg) + 0.95 * (bpr2 + reg2 * self.reg)) / 2.0

        elbo = (elbo_txi + elboNon_txi + elbo_txu + elboNon_txu) + (elboii + elboNonii)

        def ssl(a, b, idx, weights):
            na, nb = _l2n(a[idx]), _l2n(b[idx])
            pos_s = jnp.exp((na * nb).sum(1) / self.ssl_temp)
            ttl = jnp.exp(na @ _l2n(b).T / self.ssl_temp).sum(1)
            return -(jnp.log(pos_s / ttl) * weights).sum() / jnp.maximum(weights.sum(), 1.0)

        ssloss = (
            ssl(rec_txi, rec_ii, pos, w) + ssl(rec_txu, params["uinterest_emb"], users, w)
        ) / 2.0

        total = (
            0.95 * (bpr + reg * self.reg)
            + elbo * self.elbo_w
            + loss_diff * self.di_pre_w
            + mse * self.con_fe_w
            + ssloss * self.ssl_reg
        )
        return total, (total,)

    # ------------------------------------------------------------------
    def eval_artifacts(self, params, state):
        enc = self.encode(params)
        cond_u, cond_i = self._conditions(params, enc)
        eps_mode = self.mean_type == "eps"
        start_ii = (enc["item0"] + enc["item1"]) / 2.0

        non = lambda x, c: self._p_sample(self._non_apply, params["non"], x, c, self.sampling_steps, False)
        cdn = lambda x, c: self._p_sample(self._cdn_apply, params["cdn"], x, c, self.sampling_steps, eps_mode)

        r_ii_non = non(start_ii, cond_i)
        r_ii = cdn((r_ii_non + start_ii) / 2.0, cond_i)
        r_txi_non = non(enc["tx_item"], cond_i)
        r_txi = cdn((r_txi_non + enc["tx_item"]) / 2.0, cond_i)
        r_txu_non = non(enc["tx_user"], cond_u)
        r_txu = cdn((r_txu_non + enc["tx_user"]) / 2.0, cond_u)

        reitemedtx = 0.5 * r_txi + 0.5 * ((r_txi_non + enc["tx_item"]) / 2.0)
        reuseredtx = 0.5 * r_txu + 0.5 * ((r_txu_non + enc["tx_user"]) / 2.0)
        reitemedii = 0.5 * r_ii + 0.5 * ((r_ii_non + start_ii) / 2.0)
        user_emb = (params["uinterest_emb"] + reuseredtx) / 2.0
        item_emb = (reitemedtx + reitemedii) / 2.0
        return user_emb, item_emb

    def scores_cached(self, params, state, users, artifacts):
        user_emb, item_emb = artifacts
        return user_emb[users] @ item_emb.T

    def scores(self, params, state, users):
        return self.scores_cached(params, state, users, self.eval_artifacts(params, state))
