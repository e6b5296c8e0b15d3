"""GUME: Graphs and User Modalities Enhancement (CIKM '24).

Parity with reference `src/models/gume.py:19-428`:
- cached KNN image/text item graphs; UI graph *augmented* with item-item
  edges where an item's image-KNN and text-KNN neighbor sets intersect
  (``find_inter``/``add_edge``, :122-168), then jointly rowsum-normalized;
  the normalized UI block is reused as R (:173-201);
- UI + II convolutions producing explicit/extended modal embeddings
  (:229-276); attribute-separation attention and behavior-gated
  fine-grained integration;
- losses (:360-418): BPR + two regularizers, variance/mean modality
  alignment (``align_vt``), behavior-modality InfoNCE, user-modality
  InfoNCE + noise-perturbation contrastive.

TPU-native: the chunked InfoNCE (:294-348) is a single MXU matmul over the
batch; noise perturbations are key-threaded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, spmm, spmm_multi

_EPS = 1e-12


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), _EPS)


class GUME(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.bm_loss = scalar(config["bm_loss"])
        self.um_loss = scalar(config["um_loss"])
        self.vt_loss = scalar(config["vt_loss"])
        self.reg_weight_1 = scalar(config["reg_weight_1"])
        self.reg_weight_2 = scalar(config["reg_weight_2"])
        self.bm_temp = scalar(config["bm_temp"])
        self.um_temp = scalar(config["um_temp"])
        self.n_ui_layers = scalar(config["n_ui_layers"], int)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.knn_k = scalar(config["knn_k"], int)
        self.n_layers = scalar(config["n_layers"], int)

        from genmmrec_tpu.ops.graph import knn_graph_sparse

        self.image_original_adj = knn_graph_sparse(self.v_feat_np, self.knn_k, "sym")
        self.text_original_adj = knn_graph_sparse(self.t_feat_np, self.knn_k, "sym")
        self._build_augmented_adj(data)

    def _build_augmented_adj(self, data):
        """UI graph + common-KNN item-item edges, jointly normalized."""
        n_i = self.n_items
        img_cols = np.asarray(self.image_original_adj.cols).reshape(n_i, self.knn_k)
        txt_cols = np.asarray(self.text_original_adj.cols).reshape(n_i, self.knn_k)
        rows_list, cols_list = [], []
        for i in range(n_i):
            inter = np.intersect1d(img_cols[i], txt_cols[i])
            inter = inter[inter != i]
            if len(inter):
                rows_list.append(np.full(len(inter), i, np.int64))
                cols_list.append(inter.astype(np.int64))
        self._ii_rows = np.concatenate(rows_list) if rows_list else np.zeros(0, np.int64)
        self._ii_cols = np.concatenate(cols_list) if cols_list else np.zeros(0, np.int64)
        self.norm_adj, self.R = self._augmented_adj_from(
            np.asarray(data.users, np.int64), np.asarray(data.items, np.int64)
        )

    def _augmented_adj_from(self, users, items):
        """Joint normalization over the given UI edge set + the cached
        common-KNN II edges. Returns (norm_adj, R)."""
        n_u, n_i = self.n_users, self.n_items
        ii_rows, ii_cols = self._ii_rows, self._ii_cols
        N = n_u + n_i
        rows = np.concatenate([users, items + n_u, ii_rows + n_u])
        cols = np.concatenate([items + n_u, users, ii_cols + n_u])
        vals = np.ones(len(rows), np.float64)
        deg = np.zeros(N)
        np.add.at(deg, rows, vals)
        with np.errstate(divide="ignore"):
            dis = np.power(deg, -0.5)
        dis[np.isinf(dis)] = 0.0
        nvals = (dis[rows] * vals * dis[cols]).astype(np.float32)
        order = np.argsort(rows, kind="stable")
        norm_adj = SparseGraph(
            rows=jnp.asarray(rows[order].astype(np.int32)),
            cols=jnp.asarray(cols[order].astype(np.int32)),
            vals=jnp.asarray(nvals[order]),
            n_rows=N,
            n_cols=N,
        ).with_span()
        # normalized UI block as R (gume.py:199)
        ui = slice(0, len(users))
        order_u = np.argsort(users, kind="stable")
        R = SparseGraph(
            rows=jnp.asarray(users[order_u].astype(np.int32)),
            cols=jnp.asarray(items[order_u].astype(np.int32)),
            vals=jnp.asarray(nvals[ui][order_u]),
            n_rows=n_u,
            n_cols=n_i,
        ).with_span()
        return norm_adj, R

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 14)
        lin = lambda k, i, o, b=True: (
            {"w": xavier_uniform(k, (o, i)), "b": jnp.zeros((o,))}
            if b
            else {"w": xavier_uniform(k, (o, i))}
        )
        d = self.embedding_dim
        return {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            "extended_image_user": xavier_uniform(ks[2], (self.n_users, d)),
            "extended_text_user": xavier_uniform(ks[3], (self.n_users, d)),
            "image_reduce": lin(ks[4], self.v_feat.shape[1], d),
            "image_trans": lin(ks[5], d, d),
            "text_reduce": lin(ks[6], self.t_feat.shape[1], d),
            "text_trans": lin(ks[7], d, d),
            "separate1": lin(ks[8], d, d),
            "separate2": lin(ks[9], d, 1, b=False),
            "image_behavior": lin(ks[10], d, d),
            "text_behavior": lin(ks[11], d, d),
        }

    @staticmethod
    def _lin(p, x):
        y = x @ p["w"].T
        return y + p["b"] if "b" in p else y

    def _conv_ui(self, adj, user_embeds, item_embeds):
        x = jnp.concatenate([user_embeds, item_embeds], axis=0)
        acc = x
        for _ in range(self.n_ui_layers):
            x = spmm(adj, x)
            acc = acc + x
        return acc / (self.n_ui_layers + 1)

    def _conv_ii(self, adj, x):
        for _ in range(self.n_layers):
            x = spmm(adj, x)
        return x

    def forward(self, params, train=False, extended_id_override=None):
        p = params
        img_space = jax.nn.sigmoid(
            self._lin(p["image_trans"], self._lin(p["image_reduce"], self.v_feat))
        )
        txt_space = jax.nn.sigmoid(
            self._lin(p["text_trans"], self._lin(p["text_reduce"], self.t_feat))
        )
        image_item = p["item_id_embedding"] * img_space
        text_item = p["item_id_embedding"] * txt_space

        exp_img_item = self._conv_ii(self.image_original_adj, image_item)
        exp_txt_item = self._conv_ii(self.text_original_adj, text_item)
        exp_img_user, exp_txt_user = spmm_multi(self.R, [exp_img_item, exp_txt_item])
        explicit_image = jnp.concatenate([exp_img_user, exp_img_item], axis=0)
        explicit_text = jnp.concatenate([exp_txt_user, exp_txt_item], axis=0)

        # the three UI towers share norm_adj — propagate in one batched pass
        x_id = jnp.concatenate([p["user_embedding"], p["item_id_embedding"]], axis=0)
        x_img = jnp.concatenate([p["extended_image_user"], exp_img_item], axis=0)
        x_txt = jnp.concatenate([p["extended_text_user"], exp_txt_item], axis=0)
        accs = [x_id, x_img, x_txt]
        xs = [x_id, x_img, x_txt]
        for _ in range(self.n_ui_layers):
            xs = spmm_multi(self.norm_adj, xs)
            accs = [a + x for a, x in zip(accs, xs)]
        extended_id, extended_image, extended_text = (
            a / (self.n_ui_layers + 1) for a in accs
        )
        if extended_id_override is not None:  # RF-mixed embeddings (RFGUME)
            extended_id = extended_id_override

        extended_it = (extended_image + extended_text) / 2.0

        sep = lambda x: self._lin(p["separate2"], jnp.tanh(self._lin(p["separate1"], x)))
        att = jnp.concatenate([sep(explicit_image), sep(explicit_text)], axis=-1)
        wgt = jax.nn.softmax(att, axis=-1)
        coarse = wgt[:, 0:1] * explicit_image + wgt[:, 1:2] * explicit_text

        img_gate = jax.nn.sigmoid(self._lin(p["image_behavior"], extended_id))
        txt_gate = jax.nn.sigmoid(self._lin(p["text_behavior"], extended_id))
        fine_img = img_gate * (explicit_image - coarse)
        fine_txt = txt_gate * (explicit_text - coarse)
        integration = (fine_img + fine_txt + coarse) / 3.0

        all_embeds = extended_id + integration
        if train:
            return (
                all_embeds,
                (integration, extended_id, extended_it),
                (explicit_image, explicit_text),
            )
        return all_embeds

    # ------------------------------------------------------------------
    def _infonce(self, v1, v2, temp, weights):
        n1, n2 = _l2n(v1), _l2n(v2)
        pos = jnp.exp((n1 * n2).sum(-1) / temp)
        ttl = jnp.exp(n1 @ n2.T / temp).sum(1)
        per = -jnp.log(pos / ttl + 1e-8)
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    def _noise_cl(self, key, ids, emb, temp, weights):
        def perturb(k, x):
            noise = jax.random.uniform(k, x.shape)
            return x + jnp.sign(x) * _l2n(noise.reshape(-1, x.shape[-1])).reshape(x.shape) * 0.1

        k1, k2 = jax.random.split(key)
        v1 = perturb(k1, emb)[ids]
        v2 = perturb(k2, emb)[ids]
        return self._infonce(v1, v2, temp, weights)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        k1, k2 = jax.random.split(key)
        all_e, (integration, extended_id, extended_it), (exp_img, exp_txt) = self.forward(
            params, train=True
        )
        usr, itm = all_e[: self.n_users], all_e[self.n_users :]
        u, p_e, n_e = usr[users], itm[pos], itm[neg]
        denom = jnp.maximum(w.sum(), 1.0)

        bpr = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom
        sq = lambda x: 0.5 * (x**2).sum()
        reg1 = self.reg_weight_1 * (sq(u) + sq(p_e) + sq(n_e)) / self.batch_size

        vt = self.vt_loss * (
            jnp.abs(exp_img.var() - exp_txt.var()) + jnp.abs(exp_img.mean() - exp_txt.mean())
        )
        int_u, int_i = integration[: self.n_users], integration[self.n_users :]
        ext_u, ext_i = extended_id[: self.n_users], extended_id[self.n_users :]
        bm = self.bm_loss * (
            self._infonce(int_u[users], ext_u[users], self.bm_temp, w)
            + self._infonce(int_i[pos], ext_i[pos], self.bm_temp, w)
        )
        it_u, it_i = extended_it[: self.n_users], extended_it[self.n_users :]
        c_loss = self._infonce(it_u[users], int_u[users], self.um_temp, w)
        n1 = self._noise_cl(k1, users, int_u, self.um_temp, w)
        n2 = self._noise_cl(k2, users, it_u, self.um_temp, w)
        um = self.um_loss * (c_loss + n1 + n2)
        reg2 = self.reg_weight_2 * sq(it_i[pos]) / self.batch_size

        total = bpr + vt + bm + um + reg1 + reg2
        return total, (total,)

    def full_embeddings(self, params, state):
        all_e = self.forward(params)
        return all_e[: self.n_users], all_e[self.n_users :]

    def scores(self, params, state, users):
        all_e = self.forward(params)
        usr, itm = all_e[: self.n_users], all_e[self.n_users :]
        return usr[users] @ itm.T
