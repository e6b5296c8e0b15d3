"""DiffMM: modality-aware graph diffusion recommendation.

Parity with reference `src/models/diffmm.py:13-485`:
- modal feature transforms (``trans_type`` 0/1/2: matrix+leakyrelu vs
  linear, `diffmm.py:115-127`);
- ``forward_MM`` (`:129-169`): per-modality propagation over the main
  normalized adjacency + regenerated modal UI graphs with
  ``ris_adj_lambda``/``ris_lambda`` residuals and softmax modal weights;
- ``forward_cl_MM`` (`:171-195`): two modal GCN towers for contrastive
  views; ``contrastLoss`` (`:251-258`) InfoNCE with full-matrix denominator;
- per-modality ``Denoise`` MLPs + embedded GaussianDiffusion with
  linear-variance betas and β₀=1e-4 (`:362-406`), SNR-weighted diffusion MSE
  + modal-alignment ``gc_loss`` (`:453-477`);
- epoch-regenerated user-item graphs from reverse-diffusion top-k
  (handled by ``DiffMMTrainer``), with ``SpAdjDropEdge`` (`:287-301`).

TPU-native deltas: regenerated graphs have **static nnz** (2·U·k symmetric
edges + N self-loops) built fully on device — the reference's nested Python
edge loops (`src/common/trainer.py:548-562`) and scipy block assembly are a
single top-k + segment-sum normalization; denoisers live in separate param
subtrees trained by their own optax states (`param_labels``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.common.losses import exp_denominator_streamed
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.diffusion import (
    apply_dnn,
    init_dnn,
    make_schedule,
    p_sample_loop,
    q_sample,
    snr,
)
from genmmrec_tpu.ops.graph import SparseGraph, bipartite_norm_adj, spmm, spmm_multi


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class DiffMM(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.latdim = scalar(config["embedding_size"], int)
        self.gnn_layer = scalar(config["n_layers"], int)
        self.keep_rate = scalar(config["keep_rate"])
        self.trans = scalar(config["trans_type"], int)
        self.ris_adj_lambda = scalar(config["ris_adj_lambda"])
        self.ris_lambda = scalar(config["ris_lambda"])
        self.cl_method = scalar(config["cl_method"], int)
        self.ssl_reg = scalar(config["ssl_reg"])
        self.temp = scalar(config["temperature"])
        self.reg_weight = scalar(config["reg_weight"])
        self.e_loss = scalar(config["e_loss"])
        self.steps = scalar(config["steps"], int)
        self.sampling_steps = scalar(config["sampling_steps"] or 0, int)
        self.sampling_noise = bool(config["sampling_noise"])
        self.rebuild_k = scalar(config["rebuild_k"], int)
        self.d_emb_size = scalar(config["d_emb_size"], int)
        self.norm = bool(config["norm"])

        self.norm_adj = bipartite_norm_adj(
            np.asarray(data.users), np.asarray(data.items), self.n_users, self.n_items
        )
        self.sched = make_schedule(
            "linear-var",
            scalar(config["noise_scale"]),
            scalar(config["noise_min"]),
            scalar(config["noise_max"]),
            self.steps,
            beta_fixed_value=0.0001,
        )
        dims = config["dims"] if isinstance(config["dims"], list) else [config["dims"]]
        self.out_dims = list(dims) + [self.n_items]
        self.in_dims = self.out_dims[::-1]

        self.image_feat_dim = self.v_feat.shape[1] if self.v_feat is not None else 0
        self.text_feat_dim = self.t_feat.shape[1] if self.t_feat is not None else 0

        # rematerialize the propagation chain in the loss-grad program: at
        # elec scale the stored per-layer (N, 64..192) residuals dominated
        # program temps (7.93 GB of 12.44 GB total, comparison_logs/
        # elec_scale.json r3). Auto-on past 100k nodes; override with the
        # remat_gcn config key. Trades one recompute of each layer's SpMMs
        # for dropping its residuals.
        remat_cfg = config["remat_gcn"]
        if remat_cfg is None:
            self.remat = (self.n_users + self.n_items) > 100_000
        else:
            self.remat = bool(remat_cfg)

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 7)
        rec = {
            "uEmbeds": xavier_uniform(ks[0], (self.n_users, self.latdim)),
            "iEmbeds": xavier_uniform(ks[1], (self.n_items, self.latdim)),
            "modal_weight": jnp.array([0.5, 0.5]),
        }
        if self.trans == 1:
            rec["image_trans"] = {
                "w": xavier_uniform(ks[2], (self.latdim, self.image_feat_dim)),
                "b": jnp.zeros((self.latdim,)),
            }
        else:
            rec["image_trans"] = xavier_uniform(ks[2], (self.image_feat_dim, self.latdim))
        if self.trans == 0:
            rec["text_trans"] = xavier_uniform(ks[3], (self.text_feat_dim, self.latdim))
        else:
            rec["text_trans"] = {
                "w": xavier_uniform(ks[3], (self.latdim, self.text_feat_dim)),
                "b": jnp.zeros((self.latdim,)),
            }
        return {
            "rec": rec,
            "denoise_image": init_dnn(ks[4], self.in_dims, self.out_dims, self.d_emb_size),
            "denoise_text": init_dnn(ks[5], self.in_dims, self.out_dims, self.d_emb_size),
        }

    def param_labels(self, params):
        """Main optimizer trains only 'rec'; denoisers have their own Adams
        (reference: separate ``denoise_opt_image/text``,
        `src/common/trainer.py:414-415`)."""
        return {
            "rec": jax.tree_util.tree_map(lambda _: "main", params["rec"]),
            "denoise_image": jax.tree_util.tree_map(lambda _: "aux", params["denoise_image"]),
            "denoise_text": jax.tree_util.tree_map(lambda _: "aux", params["denoise_text"]),
        }

    # ------------------------------------------------------------------
    def get_image_feats(self, params):
        if self.trans in (0, 2):
            return jax.nn.leaky_relu(self.v_feat @ params["rec"]["image_trans"], 0.2)
        p = params["rec"]["image_trans"]
        return self.v_feat @ p["w"].T + p["b"]

    def get_text_feats(self, params):
        if self.trans == 0:
            return jax.nn.leaky_relu(self.t_feat @ params["rec"]["text_trans"], 0.2)
        p = params["rec"]["text_trans"]
        return self.t_feat @ p["w"].T + p["b"]

    def _modal_graph(self, state, modality) -> SparseGraph:
        g = state[f"{modality}_ui"]
        N = self.n_users + self.n_items
        # rebuild_ui_graph row-sorts the edges and pairs the dropout, so the
        # regenerated graphs ride the Pallas kernel both ways. The span bound
        # is static: self-loops keep every row non-empty, so a CHUNK-edge
        # window never spans more than CHUNK (+16 alignment slack) rows.
        # dense_rows_span returns 0 (XLA fallback) past the VMEM-budget scale.
        from genmmrec_tpu.ops.segment_pallas import dense_rows_span

        return SparseGraph(
            rows=g["rows"], cols=g["cols"], vals=g["vals"], n_rows=N, n_cols=N,
            sorted=True, pallas_span=dense_rows_span(N), symmetric=True,
        )

    def forward_MM(self, params, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rec = params["rec"]
        image_feats = self.get_image_feats(params)
        text_feats = self.get_text_feats(params)
        weight = jax.nn.softmax(rec["modal_weight"])
        adj = self.norm_adj
        img_adj = self._modal_graph(state, "image")
        txt_adj = self._modal_graph(state, "text")

        ego = jnp.concatenate([rec["uEmbeds"], rec["iEmbeds"]])
        # per-modality regenerated graphs need their own passes (row-wise
        # batching over a block-diagonal pair measured SLOWER — scatter cost
        # is edge-proportional; only column-wise spmm_multi batching wins);
        # the two main-adjacency passes run batched in lockstep
        e_img_adj = spmm(img_adj, ego)
        e_txt_adj = spmm(txt_adj, ego)
        e_img, e_txt = spmm_multi(
            adj,
            [
                jnp.concatenate([rec["uEmbeds"], _l2norm(image_feats)]),
                jnp.concatenate([rec["uEmbeds"], _l2norm(text_feats)]),
            ],
        )
        e_img_, e_txt_ = spmm_multi(
            adj,
            [
                jnp.concatenate([e_img[: self.n_users], rec["iEmbeds"]]),
                jnp.concatenate([e_txt[: self.n_users], rec["iEmbeds"]]),
            ],
        )
        embedsImage = e_img + e_img_ + self.ris_adj_lambda * e_img_adj
        embedsText = e_txt + e_txt_ + self.ris_adj_lambda * e_txt_adj
        embedsModal = weight[0] * embedsImage + weight[1] * embedsText

        embeds = embedsModal
        acc = embeds
        for _ in range(self.gnn_layer):
            embeds = spmm(adj, embeds)
            acc = acc + embeds
        out = acc + self.ris_lambda * _l2norm(embedsModal)
        return out[: self.n_users], out[self.n_users :]

    def forward_cl_MM(self, params, state):
        rec = params["rec"]
        adj = self.norm_adj

        e1 = spmm(
            self._modal_graph(state, "image"),
            jnp.concatenate([rec["uEmbeds"], _l2norm(self.get_image_feats(params))]),
        )
        e2 = spmm(
            self._modal_graph(state, "text"),
            jnp.concatenate([rec["uEmbeds"], _l2norm(self.get_text_feats(params))]),
        )
        acc1, acc2 = e1, e2
        for _ in range(self.gnn_layer):  # both towers in one batched pass
            e1, e2 = spmm_multi(adj, [e1, e2])
            acc1 = acc1 + e1
            acc2 = acc2 + e2
        e1, e2 = acc1, acc2
        return (
            e1[: self.n_users],
            e1[self.n_users :],
            e2[: self.n_users],
            e2[self.n_users :],
        )

    def _forward_joint(self, params, state):
        """forward_MM + forward_cl_MM with maximally batched propagations.

        The gather that feeds each SpMM costs the same at d=128/d=192 as at
        d=64 (it is issue-rate-, not bandwidth-, bound), so the training path
        shares every graph pass across towers: each modal graph is touched
        ONCE (main-branch ego + CL tower in one spmm_multi), and the final
        main-adjacency layer propagates the rec tower and both CL towers in
        one d=192 pass. Semantically identical to calling forward_MM and
        forward_cl_MM separately (reference diffmm.py:129-195).
        """
        rec = params["rec"]
        adj = self.norm_adj
        img_adj = self._modal_graph(state, "image")
        txt_adj = self._modal_graph(state, "text")
        image_feats = self.get_image_feats(params)
        text_feats = self.get_text_feats(params)
        weight = jax.nn.softmax(rec["modal_weight"])

        ego = jnp.concatenate([rec["uEmbeds"], rec["iEmbeds"]])
        u_img = jnp.concatenate([rec["uEmbeds"], _l2norm(image_feats)])
        u_txt = jnp.concatenate([rec["uEmbeds"], _l2norm(text_feats)])

        ckpt = jax.checkpoint if self.remat else (lambda f: f)

        @ckpt
        def _modal_passes(ego, u_img, u_txt, i_embeds):
            # one pass per modal graph feeds both the main branch and its
            # CL tower
            e_img_adj, cl1 = spmm_multi(img_adj, [ego, u_img])
            e_txt_adj, cl2 = spmm_multi(txt_adj, [ego, u_txt])
            e_img, e_txt = spmm_multi(adj, [u_img, u_txt])
            e_img_, e_txt_ = spmm_multi(
                adj,
                [
                    jnp.concatenate([e_img[: self.n_users], i_embeds]),
                    jnp.concatenate([e_txt[: self.n_users], i_embeds]),
                ],
            )
            return e_img + e_img_, e_txt + e_txt_, e_img_adj, e_txt_adj, cl1, cl2

        ei, et, e_img_adj, e_txt_adj, cl1, cl2 = _modal_passes(
            ego, u_img, u_txt, rec["iEmbeds"]
        )
        embedsImage = ei + self.ris_adj_lambda * e_img_adj
        embedsText = et + self.ris_adj_lambda * e_txt_adj
        embedsModal = weight[0] * embedsImage + weight[1] * embedsText

        @ckpt
        def _layer(rec_e, cl1, cl2):
            # rec-tower layer and both CL-tower layers ride one d=192 pass
            return spmm_multi(adj, [rec_e, cl1, cl2])

        rec_e, acc = embedsModal, embedsModal
        acc1, acc2 = cl1, cl2
        for _ in range(self.gnn_layer):
            rec_e, cl1, cl2 = _layer(rec_e, cl1, cl2)
            acc = acc + rec_e
            acc1 = acc1 + cl1
            acc2 = acc2 + cl2
        out = acc + self.ris_lambda * _l2norm(embedsModal)
        nu = self.n_users
        return (
            out[:nu],
            out[nu:],
            acc1[:nu],
            acc1[nu:],
            acc2[:nu],
            acc2[nu:],
        )

    # ------------------------------------------------------------------
    def contrast_loss(self, e1, e2, nodes, weights):
        e1 = _l2norm(e1 + 1e-8)
        e2 = _l2norm(e2 + 1e-8)
        p1, p2 = e1[nodes], e2[nodes]
        nume = jnp.exp((p1 * p2).sum(-1) / self.temp)
        # the full-table denominator is (B, N) in one shot — fine at baby
        # scale, but 6 calls x ~1.6GB per train step at elec scale; stream
        # it over node chunks past a static working-set budget
        if p1.shape[0] * e2.shape[0] * 4 > 256 * 1024 * 1024:
            deno = exp_denominator_streamed(p1, e2, self.temp)
        else:
            deno = jnp.exp(p1 @ e2.T / self.temp).sum(-1)
        per = -jnp.log(nume / deno)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def loss(self, params, state, batch, key):
        rec = params["rec"]
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        usrEmbeds, itmEmbeds, u1, i1, u2, i2 = self._forward_joint(params, state)
        anc, posE, negE = usrEmbeds[users], itmEmbeds[pos], itmEmbeds[neg]
        pos_s = (anc * posE).sum(1)
        neg_s = (anc * negE).sum(1)
        bpr = -(jnp.log(1e-10 + jax.nn.sigmoid(pos_s - neg_s)) * w).sum() / jnp.maximum(
            w.sum(), 1.0
        )
        reg = (jnp.sum(rec["uEmbeds"] ** 2) + jnp.sum(rec["iEmbeds"] ** 2)) * self.reg_weight

        if self.cl_method == 1:
            cl = (
                self.contrast_loss(usrEmbeds, u1, users, w)
                + self.contrast_loss(itmEmbeds, i1, pos, w)
                + self.contrast_loss(usrEmbeds, u2, users, w)
                + self.contrast_loss(itmEmbeds, i2, pos, w)
            ) * self.ssl_reg
        else:
            cl = (
                self.contrast_loss(u1, u2, users, w)
                + self.contrast_loss(i1, i2, pos, w)
            ) * self.ssl_reg
        total = bpr + reg + cl
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.forward_MM(params, state)

    def scores(self, params, state, users):
        usrEmbeds, itmEmbeds = self.forward_MM(params, state)
        return usrEmbeds[users] @ itmEmbeds.T

    # ------------------------------------------------------------------
    # diffusion-phase pure functions (used by DiffMMTrainer)
    def interaction_vectors(self, users: jnp.ndarray) -> jnp.ndarray:
        B = users.shape[0]
        h = self.data.hist[users]
        x = jnp.zeros((B, self.n_items), jnp.float32)
        return x.at[jnp.arange(B)[:, None], h].set(1.0, mode="drop")

    def denoise_apply(self, dn_params, x, t, key=None):
        return apply_dnn(
            dn_params, x, t, dropout=0.5 if key is not None else 0.0, key=key, norm=self.norm
        )

    def diffusion_losses(self, dn_params, x_start, item_embeds, modal_feats, key):
        """SNR-weighted MSE + modal alignment gc_loss (diffmm.py:453-477)."""
        k_t, k_noise, k_drop = jax.random.split(key, 3)
        B = x_start.shape[0]
        ts = jax.random.randint(k_t, (B,), 0, self.steps)
        noise = jax.random.normal(k_noise, x_start.shape)
        x_t = q_sample(self.sched, x_start, ts, noise)
        model_output = self.denoise_apply(dn_params, x_t, ts, key=k_drop)
        mse = jnp.mean((x_start - model_output) ** 2, axis=1)
        weight = jnp.where(ts == 0, 1.0, snr(self.sched, ts - 1) - snr(self.sched, ts))
        diff_loss = weight * mse
        usr_model_embeds = model_output @ modal_feats
        usr_id_embeds = x_start @ item_embeds
        gc_loss = jnp.mean((usr_model_embeds - usr_id_embeds) ** 2, axis=1)
        return diff_loss, gc_loss

    def p_sample_users(self, dn_params, x_start):
        """Reverse-diffuse interaction vectors (no mess dropout, eval mode)."""
        denoise = lambda x, t: self.denoise_apply(dn_params, x, t, key=None)
        return p_sample_loop(
            self.sched,
            denoise,
            x_start,
            self.sampling_steps,
            sampling_noise=self.sampling_noise,
        )

    def rebuild_ui_graph(self, topk_items: jnp.ndarray, key) -> dict:
        """Static-nnz regenerated graph: symmetrized top-k UI edges + self
        loops, sym-normalized, with keep_rate edge dropout.

        Replaces buildUIMatrix + normalizeAdj + SpAdjDropEdge
        (`src/common/trainer.py:464-485`, `diffmm.py:287-301`).
        """
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
            # PAIRED dropout: one mask per undirected UI edge, applied to
            # both directions (the reference drops each direction
            # independently, `diffmm.py:287-301`, which breaks value
            # symmetry; pairing keeps Aᵀ == A so the backward transpose
            # product rides the Pallas kernel — same marginal keep_rate)
            k_ui, k_loop = jax.random.split(key)
            m_ui = jax.random.bernoulli(k_ui, self.keep_rate, (U * k,))
            m_loop = jax.random.bernoulli(k_loop, self.keep_rate, (N,))
            mask = jnp.concatenate([m_ui, m_ui, m_loop])
            vals = jnp.where(mask, vals / self.keep_rate, 0.0)
        # row-sort once per regeneration so every batch's propagation uses
        # the sorted-scatter kernel
        order = jnp.argsort(rows, stable=True)
        return {"rows": rows[order], "cols": cols[order], "vals": vals[order]}

    def init_state(self, key):
        """Self-loop-only graphs until the first regeneration (the reference
        would return zero loss if training ran before phase 2)."""
        topk0 = jnp.zeros((self.n_users, self.rebuild_k), jnp.int32)
        g = self.rebuild_ui_graph(topk0, key)
        # zero out the placeholder UI edges, keep self loops (rows == cols)
        vals = jnp.where(g["rows"] == g["cols"], g["vals"], 0.0)
        g = {**g, "vals": vals}
        return {"image_ui": dict(g), "text_ui": dict(g)}
