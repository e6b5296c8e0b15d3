"""MVDiff: multi-view diffusion recommendation (self-developed reference
model, `src/models/mvdiff.py:20-1165`, paired with ``MVDiffTrainer``).

Components (parity):
- deep residual modal projections (dim→dim/4→dim/8→latdim BN-ReLU stacks)
  and BN-gates; attention common/special fusion (GenRec-V1 style);
- **feature diffusion**: per-modality ``MultimodalDenoiseModel`` — encoders
  over [x ; t_emb], cross-modal fusion layer, target-modality attention —
  trained to reconstruct raw modal features; denoised features (+ original)
  rebuild the item-item KNN graphs each epoch;
- **sparsity diffusion**: per-modality ``ModalDenoise`` U-Net-style MLPs
  over the dense user interaction vector with the sparsity-adaptive noise
  schedule (noise_coe = α(1+penalty)·e^{−βt}, positive-position gain) —
  eps-prediction with SNR weighting + gc alignment + InfoNCE;
- UI rebuild: image modality expands the top-``rebuild_k`` interest items by
  high-order multimodal similarity (image_II ∘ text_II), taking
  ``rebuild_k + high_order_topk`` final edges per user;
- forward: content GCN over (norm_adj + regenerated UI graphs) and gated
  item-item modal towers over (modal_II + fusion_II), common/special fusion,
  BPR + reg + two InfoNCE heads.

TPU-native deltas: every per-epoch rebuild has **static shapes** (edge
counts are U·k and U·(k+h)); the high-order expansion is a batched gather +
top-k (the reference loops per user on host, `trainer.py:1046-1070`); BN
uses current-set statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion.dnn import timestep_embedding
from genmmrec_tpu.models.diffusion.schedule import make_schedule, q_posterior_mean
from genmmrec_tpu.ops.graph import SparseGraph, spmm, spmm_multi

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


def _bn(x, p):
    mu = x.mean(0, keepdims=True)
    var = x.var(0, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _bn_p(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _lin(key, d_in, d_out, std=None):
    if std is None:
        return {"w": xavier_uniform(key, (d_out, d_in)), "b": jnp.zeros((d_out,))}
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (d_out, d_in)) * std,
        "b": jax.random.normal(kb, (d_out,)) * 0.001,
    }


def _denoise_lin(key, d_in, d_out):
    return _lin(key, d_in, d_out, std=float(np.sqrt(2.0 / (d_in + d_out))))


def _ap(p, x):
    return x @ p["w"].T + p["b"]


def _mlp_stack(key, dims, bn=True):
    ks = jax.random.split(key, len(dims) - 1)
    return [
        {"lin": _lin(ks[i], dims[i], dims[i + 1]), "bn": _bn_p(dims[i + 1])}
        for i in range(len(dims) - 1)
    ]


def _apply_stack(stack, x, act, key=None, drop=0.1):
    for i, layer in enumerate(stack):
        x = act(_bn(_ap(layer["lin"], x), layer["bn"]))
        if key is not None and drop > 0:
            keep = jax.random.bernoulli(jax.random.fold_in(key, i), 1.0 - drop, x.shape)
            x = jnp.where(keep, x / (1.0 - drop), 0.0)
    return x


class MVDiff(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        g = lambda k, d: config[k] if config[k] is not None else d
        self.latdim = scalar(config["embedding_size"], int)
        self.gcn_layer_num = int(g("gcn_layer_num", 1))
        self.keep_rate = float(g("keep_rate", 0.5))
        self.reg_weight = float(g("reg_weight", 1e-5))
        self.modal_fusion = bool(g("modal_fusion", True))
        self.ssl_reg = float(g("ssl_reg", 1e-2))
        self.temp = float(g("temperature", 0.7))
        self.sparse_temp = float(g("sparse_temp", 0.2))
        self.steps = int(g("steps", 5))
        self.d_emb_size = int(g("d_emb_size", 10))
        self.norm = bool(g("norm", False))
        self.sampling_steps = int(g("sampling_steps", 0))
        self.sampling_noise = bool(g("sampling_noise", False))
        self.rebuild_k = int(g("rebuild_k", 10))
        self.high_order_topk = int(g("high_order_topk", 2))
        self.e_loss = float(g("e_loss", 0.1))
        self.alpha_sparity = float(g("alpha_sparity", 0.01))
        self.beta_sparity = float(g("beta_sparity", 0.01))
        self.postive_gain_degree = float(g("postive_gain_degree", 0.9))
        self.knn_k = int(g("knn_k", 5))

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        from genmmrec_tpu.ops.graph import bipartite_norm_adj

        self.norm_adj = bipartite_norm_adj(users, items, self.n_users, self.n_items)
        order = np.argsort(users, kind="stable")
        self.R = SparseGraph(
            rows=jnp.asarray(users[order].astype(np.int32)),
            cols=jnp.asarray(items[order].astype(np.int32)),
            vals=jnp.ones(len(users), jnp.float32),
            n_rows=self.n_users,
            n_cols=self.n_items,
        ).with_span()
        self.sched = make_schedule(
            "linear-var", float(g("noise_scale", 0.1)), float(g("noise_min", 1e-4)),
            float(g("noise_max", 0.02)), self.steps, beta_fixed_value=1e-4,
        )
        self.v_dim = self.v_feat.shape[1]
        self.t_dim = self.t_feat.shape[1]

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 20)
        d = self.latdim
        v4, v8 = max(1, self.v_dim // 4), max(1, self.v_dim // 8)
        t4, t8 = max(1, self.t_dim // 4), max(1, self.t_dim // 8)
        i2, i4, i8 = (
            max(1, self.n_items // 2),
            max(1, self.n_items // 4),
            max(1, self.n_items // 8),
        )

        def modal_denoise(k):
            dk = jax.random.split(k, 6)
            return {
                "emb": _denoise_lin(dk[0], self.d_emb_size, self.d_emb_size),
                "down": [
                    {"lin": _denoise_lin(dk[1], self.n_items + self.d_emb_size, i2), "bn": _bn_p(i2)},
                    {"lin": _denoise_lin(dk[2], i2, i4), "bn": _bn_p(i4)},
                    {"lin": _denoise_lin(dk[3], i4, i8), "bn": _bn_p(i8)},
                ],
                "up": [
                    {"lin": _denoise_lin(dk[4], i8, i4), "bn": _bn_p(i4)},
                    {"lin": _denoise_lin(dk[5], i4, i2), "bn": _bn_p(i2)},
                    {"lin": _denoise_lin(jax.random.fold_in(dk[5], 1), i2, self.n_items), "bn": _bn_p(self.n_items)},
                ],
            }

        def feat_denoiser(k, out_dim):
            fk = jax.random.split(k, 6)
            h = out_dim
            return {
                "img_enc1": _lin(fk[0], self.v_dim + self.d_emb_size, h),
                "img_bn1": _bn_p(h),
                "img_enc2": _lin(fk[1], h, h),
                "img_bn2": _bn_p(h),
                "txt_enc1": _lin(fk[2], self.t_dim + self.d_emb_size, h),
                "txt_bn1": _bn_p(h),
                "txt_enc2": _lin(fk[3], h, h),
                "txt_bn2": _bn_p(h),
                "fusion": _lin(fk[4], 2 * h, h),
                "att_v": _lin(fk[5], h, h),
                "att_o": _lin(jax.random.fold_in(fk[5], 1), h, h),
            }

        return {
            "rec": {
                "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
                "item_id_embedding": xavier_uniform(ks[1], (self.n_items, d)),
                "image_residual": _mlp_stack(ks[2], [self.v_dim, v4, v8, d]),
                "image_modal": _mlp_stack(ks[3], [d, d, d]),
                "text_residual": _mlp_stack(ks[4], [self.t_dim, t4, t8, d]),
                "text_modal": _mlp_stack(ks[5], [d, d, d]),
                "gate_image": {"lin": _lin(ks[6], d, d), "bn": _bn_p(d)},
                "gate_text": {"lin": _lin(ks[7], d, d), "bn": _bn_p(d)},
                "common1": {"lin": _lin(ks[8], d, d), "bn": _bn_p(d)},
                "common2": {"w": xavier_uniform(ks[9], (1, d))},
            },
            "denoise_image": modal_denoise(ks[10]),
            "denoise_text": modal_denoise(ks[11]),
            "feat_denoise_image": feat_denoiser(ks[12], self.v_dim),
            "feat_denoise_text": feat_denoiser(ks[13], self.t_dim),
        }

    def param_labels(self, params):
        out = {}
        for k, v in params.items():
            label = "main" if k == "rec" else "aux"
            out[k] = jax.tree_util.tree_map(lambda _: label, v)
        return out

    # -- modal projections ---------------------------------------------
    def get_image_feats(self, params, key=None):
        rec = params["rec"]
        x = _apply_stack(rec["image_residual"], self.v_feat, jax.nn.relu, key)
        return _apply_stack(rec["image_modal"], x, jax.nn.relu, key) + x

    def get_text_feats(self, params, key=None):
        rec = params["rec"]
        x = _apply_stack(rec["text_residual"], self.t_feat, jax.nn.relu, key)
        return _apply_stack(rec["text_modal"], x, jax.nn.relu, key) + x

    def _gate(self, gp, x):
        return jax.nn.sigmoid(_bn(_ap(gp["lin"], x), gp["bn"]))

    # -- interaction vectors -------------------------------------------
    def interaction_vectors(self, users):
        B = users.shape[0]
        h = self.data.hist[users]
        x = jnp.zeros((B, self.n_items), jnp.float32)
        return x.at[jnp.arange(B)[:, None], h].set(1.0, mode="drop")

    # -- sparsity (UI) denoisers ---------------------------------------
    def modal_denoise_apply(self, p, x, t, key=None):
        emb = _ap(p["emb"], timestep_embedding(t, self.d_emb_size))
        if self.norm:
            x = _l2n(x)
        if key is not None:
            keep = jax.random.bernoulli(key, 0.9, x.shape)
            x = jnp.where(keep, x / 0.9, 0.0)
        h = jnp.concatenate([x, emb], axis=-1)
        h = _apply_stack(p["down"], h, lambda z: jax.nn.leaky_relu(z, 0.01), key)
        h = _apply_stack(p["up"], h, lambda z: jax.nn.leaky_relu(z, 0.01), key)
        return h

    def _sparsity_noise_coe(self, x_start, t):
        penalty = 1.0 - x_start.mean()
        coe = self.alpha_sparity * (1.0 + penalty) * jnp.exp(-self.beta_sparity * t.astype(jnp.float32))
        mask = jnp.where(x_start == 0, 1.0, self.postive_gain_degree * x_start)
        return coe[:, None] * mask

    def sparsity_q_sample(self, key, x_start, t):
        noise = jax.random.normal(key, x_start.shape) * self._sparsity_noise_coe(x_start, t)
        ab = self.sched.alphas_cumprod[t][:, None]
        return jnp.sqrt(ab) * x_start + jnp.sqrt(1 - ab) * noise, noise

    def sparsity_losses(self, dn, x_start, item_embeds, modal_feats, key):
        k_t, k_q, k_d = jax.random.split(key, 3)
        B = x_start.shape[0]
        ts = jax.random.randint(k_t, (B,), 0, self.steps)
        x_t, noise = self.sparsity_q_sample(k_q, x_start, ts)
        out = self.modal_denoise_apply(dn, x_t, ts, k_d)
        mse = ((noise - out) ** 2).mean(1)
        acp = self.sched.alphas_cumprod
        snr = lambda t: acp[t] / (1 - acp[t])
        w = jnp.where(ts == 0, 1.0, snr(ts - 1) - snr(ts))
        diff = w * mse
        usr_model = out @ modal_feats
        usr_id = x_start @ item_embeds
        gc = ((usr_model - usr_id) ** 2).mean(1)
        mfe = item_embeds * modal_feats
        v1 = _l2n(x_start @ mfe)
        v2 = _l2n(out @ mfe)
        pos = jnp.exp((v1 * v2).sum(1) / self.sparse_temp)
        ttl = jnp.exp(v1 @ v2.T / self.sparse_temp).sum(1)
        contra = -jnp.log(pos / ttl)
        return diff, gc, contra

    def sparsity_p_sample(self, dn, x_start):
        B = x_start.shape[0]
        x_t = x_start  # sampling_steps default 0

        def body(x, i):
            t = jnp.full((B,), i, jnp.int32)
            out = self.modal_denoise_apply(dn, x, t)
            return q_posterior_mean(self.sched, out, x, t), None

        x_t, _ = jax.lax.scan(body, x_t, jnp.arange(self.steps - 1, -1, -1))
        return x_t

    # -- feature denoisers ---------------------------------------------
    def feat_denoise_apply(self, p, x_img, x_txt, t):
        emb = timestep_embedding(t, self.d_emb_size)
        lrelu = lambda z: jax.nn.leaky_relu(z, 0.01)
        hi = lrelu(_bn(_ap(p["img_enc1"], jnp.concatenate([x_img, emb], -1)), p["img_bn1"]))
        hi = lrelu(_bn(_ap(p["img_enc2"], hi), p["img_bn2"])) + hi
        ht = lrelu(_bn(_ap(p["txt_enc1"], jnp.concatenate([x_txt, emb], -1)), p["txt_bn1"]))
        ht = lrelu(_bn(_ap(p["txt_enc2"], ht), p["txt_bn2"])) + ht
        fusion = _ap(p["fusion"], jnp.concatenate([hi, ht], -1))
        # seq-1 cross attention closed form: out_proj(value_proj(modal))
        att = _ap(p["att_o"], _ap(p["att_v"], fusion))
        return fusion + att

    def feat_diffusion_loss(self, p, x_img, x_txt, target, key):
        k_t, k_n = jax.random.split(key)
        B = target.shape[0]
        ts = jax.random.randint(k_t, (B,), 0, self.steps)
        ab = self.sched.alphas_cumprod[ts][:, None]
        noise = jax.random.normal(k_n, target.shape)
        tgt_noisy = jnp.sqrt(ab) * target + jnp.sqrt(1 - ab) * noise
        is_img = target.shape[1] == self.v_dim
        out = self.feat_denoise_apply(
            p, tgt_noisy if is_img else x_img, tgt_noisy if not is_img else x_txt, ts
        )
        return ((target - out) ** 2).mean(1)

    def feat_p_sample(self, p, x_img, x_txt, modal):
        B = x_img.shape[0]
        x_t = x_img if modal == "image" else x_txt

        def body(x, i):
            t = jnp.full((B,), i, jnp.int32)
            out = self.feat_denoise_apply(
                p, x if modal == "image" else x_img, x if modal == "text" else x_txt, t
            )
            return q_posterior_mean(self.sched, out, x, t), None

        x_t, _ = jax.lax.scan(body, x_t, jnp.arange(self.steps - 1, -1, -1))
        return x_t

    # -- graphs ---------------------------------------------------------
    def _state_graph(self, g, n) -> SparseGraph:
        return SparseGraph(
            rows=g["rows"], cols=g["cols"], vals=g["vals"], n_rows=n, n_cols=n, sorted=False
        )

    def _ui_state_graph(self, g) -> SparseGraph:
        """Regenerated UI graphs are row-sorted with paired dropout (see
        DiffMM._modal_graph) so they ride the Pallas kernel both ways."""
        from genmmrec_tpu.ops.segment_pallas import dense_rows_span

        N = self.n_users + self.n_items
        return SparseGraph(
            rows=g["rows"], cols=g["cols"], vals=g["vals"], n_rows=N, n_cols=N,
            sorted=True, pallas_span=dense_rows_span(N), symmetric=True,
        )

    def rebuild_ui_graph(self, topk_items, key):
        U, k = topk_items.shape
        N = self.n_users + self.n_items
        u_nodes = jnp.repeat(jnp.arange(U, dtype=jnp.int32), k)
        i_nodes = topk_items.reshape(-1).astype(jnp.int32) + self.n_users
        loops = jnp.arange(N, dtype=jnp.int32)
        rows = jnp.concatenate([u_nodes, i_nodes, loops])
        cols = jnp.concatenate([i_nodes, u_nodes, loops])
        deg = jax.ops.segment_sum(jnp.ones(rows.shape[0]), rows, num_segments=N)
        dis = jnp.where(deg > 0, deg**-0.5, 0.0)
        vals = dis[rows] * dis[cols]
        if self.keep_rate < 1.0:
            # paired dropout keeps Aᵀ == A (see DiffMM.rebuild_ui_graph)
            k_ui, k_loop = jax.random.split(key)
            m_ui = jax.random.bernoulli(k_ui, self.keep_rate, (U * k,))
            m_loop = jax.random.bernoulli(k_loop, self.keep_rate, (N,))
            mask = jnp.concatenate([m_ui, m_ui, m_loop])
            vals = jnp.where(mask, vals / self.keep_rate, 0.0)
        order = jnp.argsort(rows, stable=True)
        return {"rows": rows[order], "cols": cols[order], "vals": vals[order]}

    def build_ii_graph(self, feats):
        """(dense_knn, sparse_edges) from features, knn_k, sym-normalized."""
        sim = _l2n(feats) @ _l2n(feats).T
        vals, idx = jax.lax.top_k(sim, min(self.knn_k, self.n_items))
        n = self.n_items
        dense = jnp.zeros((n, n)).at[jnp.arange(n)[:, None], idx].set(vals)
        rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), idx.shape[1])
        cols = idx.reshape(-1).astype(jnp.int32)
        v = vals.reshape(-1)
        deg = jax.ops.segment_sum(v, rows, num_segments=n) + 1e-7
        nv = deg[rows] ** -0.5 * v * deg[cols] ** -0.5
        return dense, {"rows": rows, "cols": cols, "vals": nv}

    def init_state(self, key):
        U, N = self.n_users, self.n_users + self.n_items
        k_img = self.rebuild_k + self.high_order_topk
        g_img = self.rebuild_ui_graph(jnp.zeros((U, k_img), jnp.int32), key)
        g_txt = self.rebuild_ui_graph(jnp.zeros((U, self.rebuild_k), jnp.int32), key)
        # zero placeholder UI edges, keep self loops (rows == cols)
        z = lambda g, nk: {**g, "vals": jnp.where(g["rows"] == g["cols"], g["vals"], 0.0)}
        nk = min(self.knn_k, self.n_items)
        empty_ii = {
            "rows": jnp.zeros((self.n_items * nk,), jnp.int32),
            "cols": jnp.zeros((self.n_items * nk,), jnp.int32),
            "vals": jnp.zeros((self.n_items * nk,)),
        }
        ii_dense, ii_sparse = self.build_ii_graph(self.v_feat)
        ti_dense, ti_sparse = self.build_ii_graph(self.t_feat)
        return {
            "image_ui": z(g_img, k_img),
            "text_ui": z(g_txt, self.rebuild_k),
            "image_ii": {k: jnp.concatenate([ii_sparse[k], empty_ii[k]]) for k in ii_sparse},
            "text_ii": {k: jnp.concatenate([ti_sparse[k], empty_ii[k]]) for k in ti_sparse},
            "fusion_ii": {k: jnp.concatenate([empty_ii[k], empty_ii[k]]) for k in empty_ii},
            "image_ii_dense": ii_dense,
            "text_ii_dense": ti_dense,
        }

    # -- forward / loss -------------------------------------------------
    def forward(self, params, state, key=None):
        rec = params["rec"]
        N = self.n_users + self.n_items
        image_feats = self.get_image_feats(params, key)
        text_feats = self.get_text_feats(params, key)

        ego = jnp.concatenate([rec["user_embedding"], rec["item_id_embedding"]], axis=0)
        acc, x = ego, ego
        g_img_ui = self._ui_state_graph(state["image_ui"])
        g_txt_ui = self._ui_state_graph(state["text_ui"])
        for _ in range(self.gcn_layer_num):
            x = spmm(self.norm_adj, x) + spmm(g_img_ui, x) + spmm(g_txt_ui, x)
            acc = acc + x
        content = acc / (self.gcn_layer_num + 1)

        img_item = rec["item_id_embedding"] * self._gate(rec["gate_image"], image_feats)
        txt_item = rec["item_id_embedding"] * self._gate(rec["gate_text"], text_feats)
        g_img_ii = self._state_graph(state["image_ii"], self.n_items)
        g_txt_ii = self._state_graph(state["text_ii"], self.n_items)
        g_fus_ii = self._state_graph(state["fusion_ii"], self.n_items)
        for _ in range(self.gcn_layer_num):
            img_item = spmm(g_img_ii, img_item) + (
                spmm(g_fus_ii, img_item) if self.modal_fusion else 0.0
            )
            txt_item = spmm(g_txt_ii, txt_item) + (
                spmm(g_fus_ii, txt_item) if self.modal_fusion else 0.0
            )
        # the two R-lifts share R: one column-batched pass
        img_u, txt_u = spmm_multi(self.R, [img_item, txt_item])
        img_ui = jnp.concatenate([img_u, img_item], axis=0)
        txt_ui = jnp.concatenate([txt_u, txt_item], axis=0)

        com = lambda x: (jnp.tanh(_bn(_ap(rec["common1"]["lin"], x), rec["common1"]["bn"]))) @ rec["common2"]["w"].T
        att = jnp.concatenate([com(img_ui), com(txt_ui)], axis=-1)
        wc = jax.nn.softmax(att, axis=-1)
        common = wc[:, 0:1] * img_ui + wc[:, 1:2] * txt_ui
        sp_img = (img_ui - common) * self._gate(rec["gate_image"], content)
        sp_txt = (txt_ui - common) * self._gate(rec["gate_text"], content)
        side = (sp_img + sp_txt + common) / 4.0
        all_e = content + side
        return all_e[: self.n_users], all_e[self.n_users :], side, content

    def _infonce(self, v1, v2, temp, weights):
        n1, n2 = _l2n(v1), _l2n(v2)
        pos = jnp.exp((n1 * n2).sum(-1) / temp)
        ttl = jnp.exp(n1 @ n2.T / temp).sum(1)
        per = -jnp.log(pos / ttl)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        rec = params["rec"]
        usr, itm, side, content = self.forward(params, state, key)
        anc, p_e, n_e = usr[users], itm[pos], itm[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        bpr = -(jax.nn.log_sigmoid((anc * p_e).sum(1) - (anc * n_e).sum(1)) * w).sum() / denom
        reg = (
            jnp.sum(rec["user_embedding"] ** 2) + jnp.sum(rec["item_id_embedding"] ** 2)
        ) * self.reg_weight
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl1 = self._infonce(side_i[pos], cont_i[pos], self.temp, w) + self._infonce(
            side_u[users], cont_u[users], self.temp, w
        )
        cl2 = self._infonce(anc, cont_i[pos], self.temp, w) + self._infonce(
            anc, side_i[pos], self.temp, w
        )
        total = bpr + reg + (cl1 + cl2) * self.ssl_reg
        return total, (total,)

    def full_embeddings(self, params, state):
        usr, itm, _, _ = self.forward(params, state)
        return usr, itm

    def scores(self, params, state, users):
        usr, itm, _, _ = self.forward(params, state)
        return usr[users] @ itm.T
