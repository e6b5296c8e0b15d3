"""GenRec-V1: binary flip diffusion for unbiased interest generation
(ACM MM 2025).

Parity with reference `src/models/genrecv1.py:15-457`:
- dual user-item GCN over the original and the generated (flip-diffusion)
  graphs mixed by learned softmax weights (:330-353);
- gated item-item modal GCN over static KNN image/text graphs with the raw
  interaction matrix R lifting item embeddings to users (:266-306);
- attention common/special fusion (``caculate_common``) and
  modality-preference gating (:309-353);
- BPR + norm² regularization + two InfoNCE heads (:355-399);
- ``FlipInterestDiffusion`` + ``ModalDenoiseTransformer`` trained by
  ``GenRecV1Trainer`` (see `engine/diffusion_trainers.py`).

TPU-native deltas: BatchNorm layers always use current-set statistics (the
"batch" is always the full item/node set here, so train-mode batch stats
are deterministic and eval parity holds without running-stat state);
regenerated graph has static nnz; dropout/noise key-threaded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion import flip as flipd
from genmmrec_tpu.ops.topk import grouped_topk
from genmmrec_tpu.models.modal_denoise import apply_modal_denoise, init_modal_denoise
from genmmrec_tpu.ops.graph import (
    SparseGraph,
    bipartite_norm_adj,
    knn_graph_sparse,
    spmm,
    spmm_multi,
)


def _bn(x, p, eps=1e-5):
    mu = x.mean(axis=0, keepdims=True)
    var = x.var(axis=0, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _bn_params(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _linear(key, d_in, d_out, bias=True):
    p = {"w": xavier_uniform(key, (d_out, d_in))}
    if bias:
        p["b"] = jnp.zeros((d_out,))
    return p


def _apply(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def _drop(key, x, rate):
    if key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class GenRecV1(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.latdim = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config["n_layers"], int)
        self.keep_rate = scalar(config["keep_rate"])
        self.sparse_temp = scalar(config["sparse_temp"])
        self.temp = scalar(config["temperature"])
        self.ssl_reg1 = scalar(config["ssl_reg1"])
        self.ssl_reg2 = scalar(config["ssl_reg2"])
        self.ssl_gen1 = scalar(config["ssl_gen1"])
        self.gen_topk = scalar(config["gen_topk"], int)
        self.rebuild_k = scalar(config["rebuild_k"], int)
        self.d_emb_size = scalar(config["d_emb_size"], int)
        self.nhead = scalar(config["nhead"], int)
        self.num_layers = scalar(config["num_layers"], int)
        self.steps = scalar(config["steps"], int)
        self.flip_temp = scalar(config["flip_temp"])
        self.bayesian = bool(config["bayesian_samplinge_schedule"])
        self.sampling_steps = scalar(config["sampling_steps"] or 0, int)
        self.reg_weight = scalar(config["reg_weight"])
        self.knn_k = scalar(config["knn_k"], int)

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj = bipartite_norm_adj(users, items, self.n_users, self.n_items)
        # raw interaction matrix R (duplicates sum, reference `_get_user_item_matrix`)
        order = np.argsort(users, kind="stable")
        self.R = SparseGraph(
            rows=jnp.asarray(users[order].astype(np.int32)),
            cols=jnp.asarray(items[order].astype(np.int32)),
            vals=jnp.ones(len(users), jnp.float32),
            n_rows=self.n_users,
            n_cols=self.n_items,
        ).with_span()
        # static item-item KNN modal graphs (reference _build_knn_adj)
        self.image_II = knn_graph_sparse(self.v_feat_np, self.knn_k, "sym")
        self.text_II = knn_graph_sparse(self.t_feat_np, self.knn_k, "sym")

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 16)
        rec = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, self.latdim)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, self.latdim)),
            "origin_weight": jnp.ones((1,)),
            "generation_weight": jnp.ones((1,)),
            "img_weight": 1.0 + 0.1 * jax.random.normal(ks[2], (1,)),
            "txt_weight": 1.0 + 0.1 * jax.random.normal(ks[3], (1,)),
            "fusion_weight": jnp.ones((3,)),
            "res_scale": jnp.ones((1,)),
            "image_residual": {
                "lin": _linear(ks[4], self.v_feat.shape[1], self.latdim),
                "bn": _bn_params(self.latdim),
            },
            "image_modal": {
                "lin": _linear(ks[5], self.latdim, self.latdim),
                "bn": _bn_params(self.latdim),
            },
            "text_residual": {
                "lin": _linear(ks[6], self.t_feat.shape[1], self.latdim),
                "bn": _bn_params(self.latdim),
            },
            "text_modal": {
                "lin": _linear(ks[7], self.latdim, self.latdim),
                "bn": _bn_params(self.latdim),
            },
            "common1": _linear(ks[8], self.latdim, self.latdim),
            "common_bn": _bn_params(self.latdim),
            "common2": _linear(ks[9], self.latdim, 1, bias=False),
            "gate_image": {
                "lin": _linear(ks[10], self.latdim, self.latdim),
                "bn": _bn_params(self.latdim),
            },
            "gate_text": {
                "lin": _linear(ks[11], self.latdim, self.latdim),
                "bn": _bn_params(self.latdim),
            },
        }
        return {
            "rec": rec,
            "denoise_image": init_modal_denoise(
                ks[12],
                self.n_items,
                self.n_items,
                self.d_emb_size,
                self.nhead,
                self.num_layers,
            ),
        }

    def param_labels(self, params):
        return {
            "rec": jax.tree_util.tree_map(lambda _: "main", params["rec"]),
            "denoise_image": jax.tree_util.tree_map(
                lambda _: "aux", params["denoise_image"]
            ),
        }

    # ------------------------------------------------------------------
    def _project(self, rec, proj_res, proj_mod, feats, key):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        x = _apply(proj_res["lin"], feats)
        x = jax.nn.leaky_relu(_bn(x, proj_res["bn"]), 0.2)
        x = _drop(k1, x, 0.1)
        y = _apply(proj_mod["lin"], x)
        y = jax.nn.leaky_relu(_bn(y, proj_mod["bn"]), 0.2)
        y = _drop(k2, y, 0.1)
        return rec["res_scale"] * x + y

    def get_image_feats(self, params, key=None):
        rec = params["rec"]
        return self._project(rec, rec["image_residual"], rec["image_modal"], self.v_feat, key)

    def get_text_feats(self, params, key=None):
        rec = params["rec"]
        return self._project(rec, rec["text_residual"], rec["text_modal"], self.t_feat, key)

    def _gate(self, gate_params, x):
        return jax.nn.sigmoid(_bn(_apply(gate_params["lin"], x), gate_params["bn"]))

    def _common(self, rec, x):
        h = jnp.tanh(_bn(_apply(rec["common1"], x), rec["common_bn"]))
        return _apply(rec["common2"], h)  # (N, 1)

    def _ui_gcn(self, rec, adj):
        x = jnp.concatenate([rec["user_embedding"], rec["item_id_embedding"]], axis=0)
        acc = x
        for _ in range(self.n_layers):
            x = spmm(adj, x)
            acc = acc + x
        return acc / (self.n_layers + 1)

    def _gen_graph(self, state) -> SparseGraph:
        g = state["image_ui"]
        N = self.n_users + self.n_items
        # rebuild_ui_graph row-sorts + pairs dropout (see DiffMM._modal_graph)
        from genmmrec_tpu.ops.segment_pallas import dense_rows_span

        return SparseGraph(
            rows=g["rows"], cols=g["cols"], vals=g["vals"], n_rows=N, n_cols=N,
            sorted=True, pallas_span=dense_rows_span(N), symmetric=True,
        )

    def forward(self, params, state, key=None):
        rec = params["rec"]
        k_img, k_txt = jax.random.split(key) if key is not None else (None, None)
        c1 = self._ui_gcn(rec, self.norm_adj)
        c2 = self._ui_gcn(rec, self._gen_graph(state))
        w = jax.nn.softmax(
            jnp.concatenate([rec["origin_weight"], rec["generation_weight"]])
        )
        content = w[0] * c1 + w[1] * c2

        # item-item modal towers
        img_feat = self.get_image_feats(params, k_img)
        txt_feat = self.get_text_feats(params, k_txt)
        img_item = rec["item_id_embedding"] * self._gate(rec["gate_image"], img_feat)
        txt_item = rec["item_id_embedding"] * self._gate(rec["gate_text"], txt_feat)
        for _ in range(self.n_layers):
            img_item = spmm(self.image_II, img_item)
        for _ in range(self.n_layers):
            txt_item = spmm(self.text_II, txt_item)
        # the two R-lifts share R: one column-batched pass
        img_user, txt_user = spmm_multi(self.R, [img_item, txt_item])
        img_ui = jnp.concatenate([img_user, img_item], axis=0)
        txt_ui = jnp.concatenate([txt_user, txt_item], axis=0)

        # attention common/special fusion
        att = jnp.concatenate([self._common(rec, img_ui), self._common(rec, txt_ui)], axis=-1)
        wc = jax.nn.softmax(att, axis=-1)
        common = wc[:, 0:1] * img_ui + wc[:, 1:2] * txt_ui
        special_img = img_ui - common
        special_txt = txt_ui - common

        img_prefer = self._gate(rec["gate_image"], content)
        txt_prefer = self._gate(rec["gate_text"], content)
        special_img = img_prefer * special_img
        special_txt = txt_prefer * special_txt
        side = (special_img + special_txt + common) / 4.0
        return content, side

    # ------------------------------------------------------------------
    def _infonce(self, v1, v2, temp, weights):
        n1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=1, keepdims=True), 1e-12)
        n2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=1, keepdims=True), 1e-12)
        pos = jnp.exp((n1 * n2).sum(-1) / temp)
        neg = jnp.exp(n1 @ n2.T / temp).sum(1)
        per = -jnp.log(pos / neg)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def loss(self, params, state, batch, key):
        rec = params["rec"]
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        content, side = self.forward(params, state, key)
        usr, itm = content[: self.n_users], content[self.n_users :]
        anc, posE, negE = usr[users], itm[pos], itm[neg]
        bpr = -(
            jax.nn.log_sigmoid((anc * posE).sum(-1) - (anc * negE).sum(-1)) * w
        ).sum() / jnp.maximum(w.sum(), 1.0)
        reg = (
            jnp.sum(rec["user_embedding"] ** 2) + jnp.sum(rec["item_id_embedding"] ** 2)
        ) * self.reg_weight

        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cl1 = self._infonce(side_i[pos], itm[pos], self.temp, w) + self._infonce(
            side_u[users], usr[users], self.temp, w
        )
        cl2 = self._infonce(usr[users], itm[pos], self.temp, w) + self._infonce(
            usr[users], side_i[pos], self.temp, w
        )
        total = bpr + reg + cl1 * self.ssl_reg1 + cl2 * self.ssl_reg2
        return total, (total,)

    def full_embeddings(self, params, state):
        content, _ = self.forward(params, state, key=None)
        return content[: self.n_users], content[self.n_users :]

    def scores(self, params, state, users):
        content, _ = self.forward(params, state, key=None)
        usr, itm = content[: self.n_users], content[self.n_users :]
        return usr[users] @ itm.T

    # ------------------------------------------------------------------
    # diffusion-phase pure functions (GenRecV1Trainer)
    def interaction_vectors(self, users):
        B = users.shape[0]
        h = self.data.hist[users]
        x = jnp.zeros((B, self.n_items), jnp.float32)
        return x.at[jnp.arange(B)[:, None], h].set(1.0, mode="drop")

    def denoise_fn(self, dn_params):
        return lambda x, t: apply_modal_denoise(dn_params, x, t)

    def diffusion_losses(self, dn_params, x_start, item_embeds, img_feats, txt_feats, key):
        """bce + curriculum KL + 0.01·InfoNCE (genrecv1.py:550-606 default
        image+text branch)."""
        k_t, k_q, k_gen = jax.random.split(key, 3)
        B = x_start.shape[0]
        pos_weight = (1.0 - x_start).sum() / (x_start.sum() + 1e-8)
        t = jax.random.randint(k_t, (B,), 0, self.steps)
        x_t = flipd.q_sample(k_q, x_start, t, self.steps, self.flip_temp)
        logits = apply_modal_denoise(dn_params, x_t, t)
        probs = jax.nn.sigmoid(logits)

        # pos-weighted BCE with logits
        log_p = jax.nn.log_sigmoid(logits)
        log_1mp = jax.nn.log_sigmoid(-logits)
        bce = -(pos_weight * x_start * log_p + (1.0 - x_start) * log_1mp).mean()

        # the contrastive term's gradient is exactly zero in the reference:
        # gen_output comes out of torch.bernoulli (non-differentiable) and
        # itmEmbeds/model_feats are detached inputs (genrecv1.py:577-582).
        # stop_gradient makes that explicit so JAX skips the backward pass
        # through the 5-step p_sample chain of (B, n_items) activations —
        # same loss value, same (zero) gradient, ~half the phase-1 cost.
        def _cl_term(dn):
            gen_output, _ = flipd.p_sample(
                k_gen, self.denoise_fn(dn), x_start, self.steps, self.steps,
                self.flip_temp, self.bayesian,
            )
            modal_emb = item_embeds * img_feats
            return flipd.infonce_rows(
                x_start @ modal_emb, gen_output @ modal_emb, self.sparse_temp
            )

        cl = _cl_term(jax.lax.stop_gradient(dn_params))

        kl = flipd.kl_to_posterior(x_start, t, probs, self.steps)
        curriculum = jnp.clip(t.astype(jnp.float32) / self.steps, 0.0, 0.5)
        kl_loss = (curriculum * kl).mean()
        return bce + kl_loss + 0.01 * cl

    def generate(self, dn_params, x_start, key):
        """Phase-2 generation: p_sample → gen_topk blend with original.
        Returns (blended binary matrix, probs)."""
        denoised, probs = flipd.p_sample(
            key, self.denoise_fn(dn_params), x_start, self.steps, self.sampling_steps,
            self.flip_temp, self.bayesian,
        )
        _, idx = grouped_topk(probs, min(self.gen_topk, self.n_items))
        mask = jnp.zeros_like(probs, dtype=bool)
        mask = mask.at[jnp.arange(x_start.shape[0])[:, None], idx].set(True)
        blended = jnp.where(mask, denoised, x_start)
        return blended, probs

    def rebuild_ui_graph(self, topk_items, key):
        """Same static-nnz construction as DiffMM (buildUIMatrix +
        edgeDropper with keep_rate)."""
        U, k = topk_items.shape
        N = self.n_users + self.n_items
        u_nodes = jnp.repeat(jnp.arange(U, dtype=jnp.int32), k)
        i_nodes = topk_items.reshape(-1).astype(jnp.int32) + self.n_users
        loops = jnp.arange(N, dtype=jnp.int32)
        rows = jnp.concatenate([u_nodes, i_nodes, loops])
        cols = jnp.concatenate([i_nodes, u_nodes, loops])
        ones = jnp.ones(rows.shape[0], jnp.float32)
        deg = jax.ops.segment_sum(ones, rows, num_segments=N)
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

    def init_state(self, key):
        topk0 = jnp.zeros((self.n_users, self.rebuild_k), jnp.int32)
        g = self.rebuild_ui_graph(topk0, key)
        # zero placeholder UI edges, keep self loops (rows == cols)
        vals = jnp.where(g["rows"] == g["cols"], g["vals"], 0.0)
        return {"image_ui": {**g, "vals": vals}}
