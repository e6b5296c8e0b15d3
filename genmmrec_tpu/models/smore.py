"""SMORE: spectrum-based modality fusion recommendation (WSDM '25).

Parity with reference `src/models/smore.py:25-345`: MGCN-style skeleton plus
- spectrum convolution: rFFT over the embedding dim with learnable complex
  weights for uni-modal denoising and cross-modal fusion (:189-207);
- a fusion item-item graph = element-wise max over the union of the image
  and text KNN graphs (``max_pool_fusion``, :133-155);
- modality-aware preference: softmax queries from the fusion view scale the
  modal views, preference gates (with dropout) scale all three, mean-stack
  side embedding; BPR + batch-scaled reg + InfoNCE (0.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.models.mgcn import _l2n, _sym_ui_adj
from genmmrec_tpu.ops.graph import SparseGraph, knn_graph_sparse, spmm, spmm_multi


class SMORE(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.cl_loss = scalar(config["cl_loss"])
        self.n_ui_layers = scalar(config["n_ui_layers"], int)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.n_layers = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.image_knn_k = scalar(config["image_knn_k"] or 10, int)
        self.text_knn_k = scalar(config["text_knn_k"] or 10, int)
        self.dropout_rate = scalar(config["dropout_rate"] or 0.0)

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj, self.R = _sym_ui_adj(users, items, self.n_users, self.n_items)
        self.image_original_adj = knn_graph_sparse(self.v_feat_np, self.image_knn_k, "sym")
        self.text_original_adj = knn_graph_sparse(self.t_feat_np, self.text_knn_k, "sym")
        self.fusion_adj = self._max_pool_fusion()

    def _max_pool_fusion(self) -> SparseGraph:
        """Union of edges, values = max(image, text) (smore.py:133-155)."""
        ir = np.asarray(self.image_original_adj.rows, np.int64)
        ic = np.asarray(self.image_original_adj.cols, np.int64)
        iv = np.asarray(self.image_original_adj.vals)
        tr = np.asarray(self.text_original_adj.rows, np.int64)
        tc = np.asarray(self.text_original_adj.cols, np.int64)
        tv = np.asarray(self.text_original_adj.vals)
        keys = np.concatenate([ir * self.n_items + ic, tr * self.n_items + tc])
        vals = np.concatenate([iv, tv])
        uniq, inv = np.unique(keys, return_inverse=True)
        out = np.full(len(uniq), -np.inf, np.float32)
        np.maximum.at(out, inv, vals)
        rows = (uniq // self.n_items).astype(np.int32)
        cols = (uniq % self.n_items).astype(np.int32)
        return SparseGraph(
            rows=jnp.asarray(rows),
            cols=jnp.asarray(cols),
            vals=jnp.asarray(out),
            n_rows=self.n_items,
            n_cols=self.n_items,
        ).with_span()

    def init_params(self, key):
        ks = jax.random.split(key, 18)
        d = self.embedding_dim
        lin = lambda k, i, o, b=True: (
            {"w": xavier_uniform(k, (o, i)), "b": jnp.zeros((o,))}
            if b
            else {"w": xavier_uniform(k, (o, i))}
        )
        q = lambda k: {
            "l1": lin(jax.random.fold_in(k, 0), d, d),
            "l2": lin(jax.random.fold_in(k, 1), d, d, b=False),
        }
        return {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            "image_trs": lin(ks[2], self.v_feat.shape[1], d),
            "text_trs": lin(ks[3], self.t_feat.shape[1], d),
            "query_v": q(ks[4]),
            "query_t": q(ks[5]),
            "gate_v": lin(ks[6], d, d),
            "gate_t": lin(ks[7], d, d),
            "gate_f": lin(ks[8], d, d),
            "gate_image_prefer": lin(ks[9], d, d),
            "gate_text_prefer": lin(ks[10], d, d),
            "gate_fusion_prefer": lin(ks[11], d, d),
            "image_complex_weight": jax.random.normal(ks[12], (1, d // 2 + 1, 2)),
            "text_complex_weight": jax.random.normal(ks[13], (1, d // 2 + 1, 2)),
            "fusion_complex_weight": jax.random.normal(ks[14], (1, d // 2 + 1, 2)),
        }

    @staticmethod
    def _lin(p, x):
        y = x @ p["w"].T
        return y + p["b"] if "b" in p else y

    def _spectrum(self, params, image_feats, text_feats):
        to_c = lambda w: jax.lax.complex(w[..., 0], w[..., 1])
        img_fft = jnp.fft.rfft(image_feats, axis=1, norm="ortho")
        txt_fft = jnp.fft.rfft(text_feats, axis=1, norm="ortho")
        d = image_feats.shape[1]
        image_conv = jnp.fft.irfft(
            img_fft * to_c(params["image_complex_weight"]), n=d, axis=1, norm="ortho"
        )
        text_conv = jnp.fft.irfft(
            txt_fft * to_c(params["text_complex_weight"]), n=d, axis=1, norm="ortho"
        )
        fusion_conv = jnp.fft.irfft(
            txt_fft * img_fft * to_c(params["fusion_complex_weight"]), n=d, axis=1, norm="ortho"
        )
        return image_conv, text_conv, fusion_conv

    def forward(self, params, train=False, key=None):
        p = params
        gate = lambda q, x: jax.nn.sigmoid(self._lin(q, x))
        image_feats = self._lin(p["image_trs"], self.v_feat)
        text_feats = self._lin(p["text_trs"], self.t_feat)
        image_conv, text_conv, fusion_conv = self._spectrum(p, image_feats, text_feats)
        image_item = p["item_id_embedding"] * gate(p["gate_v"], image_conv)
        text_item = p["item_id_embedding"] * gate(p["gate_t"], text_conv)
        fusion_item = p["item_id_embedding"] * gate(p["gate_f"], fusion_conv)

        ego = jnp.concatenate([p["user_embedding"], p["item_id_embedding"]], axis=0)
        acc, x = ego, ego
        for _ in range(self.n_ui_layers):
            x = spmm(self.norm_adj, x)
            acc = acc + x
        content = acc / (self.n_ui_layers + 1)

        for _ in range(self.n_layers):
            image_item = spmm(self.image_original_adj, image_item)
        for _ in range(self.n_layers):
            text_item = spmm(self.text_original_adj, text_item)
        for _ in range(self.n_layers):
            fusion_item = spmm(self.fusion_adj, fusion_item)
        # the three R-lifts share R: one column-batched pass
        img_u, txt_u, fus_u = spmm_multi(self.R, [image_item, text_item, fusion_item])
        image_embeds = jnp.concatenate([img_u, image_item], axis=0)
        text_embeds = jnp.concatenate([txt_u, text_item], axis=0)
        fusion_embeds = jnp.concatenate([fus_u, fusion_item], axis=0)

        qv = self._lin(p["query_v"]["l2"], jnp.tanh(self._lin(p["query_v"]["l1"], fusion_embeds)))
        qt = self._lin(p["query_t"]["l2"], jnp.tanh(self._lin(p["query_t"]["l1"], fusion_embeds)))
        agg_image = jax.nn.softmax(qv, axis=-1) * image_embeds
        agg_text = jax.nn.softmax(qt, axis=-1) * text_embeds

        def drop(k, x):
            if key is None or self.dropout_rate <= 0:
                return x
            keep = jax.random.bernoulli(k, 1.0 - self.dropout_rate, x.shape)
            return jnp.where(keep, x / (1.0 - self.dropout_rate), 0.0)

        dk = jax.random.split(key, 3) if key is not None else [None] * 3
        image_prefer = drop(dk[0], gate(p["gate_image_prefer"], content))
        text_prefer = drop(dk[1], gate(p["gate_text_prefer"], content))
        fusion_prefer = drop(dk[2], gate(p["gate_fusion_prefer"], content))
        side = (
            image_prefer * agg_image + text_prefer * agg_text + fusion_prefer * fusion_embeds
        ) / 3.0
        all_e = content + side
        u, i = all_e[: self.n_users], all_e[self.n_users :]
        if train:
            return u, i, side, content
        return u, i

    def _infonce(self, v1, v2, temp, weights):
        n1, n2 = _l2n(v1), _l2n(v2)
        pos = jnp.exp((n1 * n2).sum(-1) / temp)
        ttl = jnp.exp(n1 @ n2.T / temp).sum(1)
        per = -jnp.log(pos / ttl)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia, side, content = self.forward(params, train=True, key=key)
        u, p_e, n_e = ua[users], ia[pos], ia[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        mf = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom
        reg = self.reg_weight * 0.5 * ((u**2).sum() + (p_e**2).sum() + (n_e**2).sum()) / self.batch_size
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl = self._infonce(side_i[pos], cont_i[pos], 0.2, w) + self._infonce(
            side_u[users], cont_u[users], 0.2, w
        )
        total = mf + reg + self.cl_loss * cl
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.forward(params)

    def scores(self, params, state, users):
        ua, ia = self.forward(params)
        return ua[users] @ ia.T
