"""DAMRS: denoising-alignment multimodal recommendation with session graphs.

Parity with reference `src/models/damrs.py:15-345`:
- mutually-masked modal KNN item graphs (similarities below the modal mean
  zeroed in *both* modalities before top-k, :60-108);
- a session item-item graph from ``item_graph_dict`` (+ self loops,
  weighted, sym-normalized, :121-141) — built on host from within-user item
  co-occurrence when the file is absent;
- pseudo-label neighbor discrimination across the three item views
  (:143-180) and a symmetric KL alignment between behavioral and modal
  user-item probabilities (:182-184, :273-281);
- modality-weighted BPR: positive weights from mean·exp(−var) of modal
  scores, negative weights for false positives (:283-343).

TPU-native deltas: the reference's ``torch.unique`` batch compaction is a
dynamic shape — here the raw batch rows are used directly (duplicates only
re-weight the mean slightly).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, bipartite_norm_adj, spmm

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


class DAMRS(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.knn_k = scalar(config["knn_k"], int)
        self.n_layers = scalar(config["n_mm_layers"], int)
        self.n_ui_layers = scalar(config["n_ui_layers"], int)
        self.reg_weight = scalar(config["reg_weight"], default=1e-4)
        self.kl_weight = scalar(config["kl_weight"])
        self.neighbor_weight = scalar(config["neighbor_weight"])

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj = bipartite_norm_adj(users, items, self.n_users, self.n_items)
        self.image_adj, self.text_adj = self._masked_knn_graphs()
        self.session_adj = self._session_graph(config, users, items)

    def _masked_knn_graphs(self):
        v = np.asarray(self.v_feat_np, np.float32)
        t = np.asarray(self.t_feat_np, np.float32)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        tn = t / np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
        v_sim = vn @ vn.T
        t_sim = tn @ tn.T
        mask = (v_sim < v_sim.mean()) | (t_sim < t_sim.mean())
        v_sim[mask] = 0
        t_sim[mask] = 0
        k = min(self.knn_k, self.n_items)

        def build(sim):
            idx = np.argpartition(-sim, k - 1, axis=1)[:, :k]
            rows = np.repeat(np.arange(self.n_items), k).astype(np.int64)
            cols = idx.reshape(-1).astype(np.int64)
            deg = np.bincount(rows, minlength=self.n_items) + 1e-7
            dis = np.power(deg, -0.5)
            vals = (dis[rows] * dis[cols]).astype(np.float32)
            return SparseGraph(
                rows=jnp.asarray(rows.astype(np.int32)),
                cols=jnp.asarray(cols.astype(np.int32)),
                vals=jnp.asarray(vals),
                n_rows=self.n_items,
                n_cols=self.n_items,
            ).with_span()

        return build(v_sim), build(t_sim)

    def _session_graph(self, config, users, items):
        path = os.path.join(
            os.path.abspath(
                os.path.join(config["data_path"] or "./data/", config["dataset"] or "")
            ),
            str(config["item_graph_dict_file"] or "item_graph_dict.npy"),
        )
        rows_l, cols_l, vals_l = [], [], []
        if os.path.isfile(path):
            d = np.load(path, allow_pickle=True).item()
            for i in range(self.n_items):
                rows_l.append([i]); cols_l.append([i]); vals_l.append([1.0])
                if i in d:
                    ns, ws = d[i][0], d[i][1]
                    rows_l.append([i] * len(ns)); cols_l.append(list(ns)); vals_l.append(list(ws))
            rows = np.concatenate([np.asarray(r, np.int64) for r in rows_l])
            cols = np.concatenate([np.asarray(c, np.int64) for c in cols_l])
            vals = np.concatenate([np.asarray(v, np.float64) for v in vals_l])
        else:  # within-user co-occurrence, top-k per item
            R = np.zeros((self.n_users, self.n_items), np.float32)
            np.add.at(R, (users, items), 1.0)
            co = R.T @ R
            np.fill_diagonal(co, 0)
            k = min(self.knn_k, self.n_items - 1)
            idx = np.argpartition(-co, k - 1, axis=1)[:, :k]
            w = np.take_along_axis(co, idx, axis=1)
            keep = w > 0
            rr = np.repeat(np.arange(self.n_items), k)[keep.reshape(-1)]
            cc = idx.reshape(-1)[keep.reshape(-1)]
            ww = w.reshape(-1)[keep.reshape(-1)]
            rows = np.concatenate([np.arange(self.n_items), rr]).astype(np.int64)
            cols = np.concatenate([np.arange(self.n_items), cc]).astype(np.int64)
            vals = np.concatenate([np.ones(self.n_items), ww]).astype(np.float64)
        deg = np.zeros(self.n_items)
        np.add.at(deg, rows, np.ones_like(vals))
        deg += 1e-7
        dis = np.power(deg, -0.5)
        nvals = (dis[rows] * dis[cols]).astype(np.float32)
        order = np.argsort(rows, kind="stable")
        return SparseGraph(
            rows=jnp.asarray(rows[order].astype(np.int32)),
            cols=jnp.asarray(cols[order].astype(np.int32)),
            vals=jnp.asarray(nvals[order]),
            n_rows=self.n_items,
            n_cols=self.n_items,
        ).with_span()

    # ------------------------------------------------------------------
    def init_params(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user_embedding": xavier_uniform(ku, (self.n_users, self.embedding_dim)),
            "item_id_embedding": xavier_uniform(ki, (self.n_items, self.embedding_dim)),
        }

    def forward(self, params):
        ego = jnp.concatenate([params["user_embedding"], params["item_id_embedding"]], axis=0)
        acc, x = ego, ego
        for _ in range(self.n_ui_layers):
            x = spmm(self.norm_adj, x)
            acc = acc + x
        out = acc / (self.n_ui_layers + 1)
        u, i = out[: self.n_users], out[self.n_users :]
        h = params["item_id_embedding"]
        h_t, h_v, h_s = h, h, h
        for _ in range(self.n_layers):
            h_t = spmm(self.text_adj, h_t)
        for _ in range(self.n_layers):
            h_v = spmm(self.image_adj, h_v)
        for _ in range(self.n_layers):
            h_s = spmm(self.session_adj, h_s)
        return u, i, h_t, h_v, h_s

    @staticmethod
    def _label_pred(emb, aug):
        return jax.nn.softmax(_l2n(emb) @ _l2n(aug).T, axis=1)

    @staticmethod
    def _pseudo_labels(p1, p2, p3):
        positive = p1 + p2 + p3 + p3
        _, mm_pos = jax.lax.top_k(positive, 10)
        B = p3.shape[0]
        prob = p3.at[jnp.arange(B)[:, None], mm_pos].set(0.0)
        _, s_pos = jax.lax.top_k(prob, 10)
        return mm_pos, s_pos

    def _neighbor_disc(self, mm_pos, s_pos, emb, aug, weights, temperature=0.2):
        n_aug = _l2n(aug)
        n_emb = _l2n(emb)
        mm_e = n_aug[mm_pos]  # (B, 10, d)
        s_e = n_aug[s_pos]
        mm_score = jnp.exp(jnp.einsum("bd,bkd->bk", n_emb, mm_e) / temperature).sum(1)
        s_score = jnp.exp(jnp.einsum("bd,bkd->bk", n_emb, s_e) / temperature).sum(1)
        ttl = jnp.exp(n_emb @ n_aug.T / temperature).sum(1)
        per = -jnp.log(mm_score / ttl + 1e-9) - jnp.log(
            s_score / jnp.maximum(ttl - mm_score, 1e-9) + 1e-9
        )
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    @staticmethod
    def _kl(p1, p2, eps=1e-8):
        p1 = jnp.clip(p1, eps, 1 - eps)
        p2 = jnp.clip(p2, eps, 1 - eps)
        return p1 * (jnp.log(p1) - jnp.log(p2)) + (1 - p1) * (
            jnp.log(1 - p1) - jnp.log(1 - p2)
        )

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        u_emb, i_emb, h_t, h_v, h_s = self.forward(params)
        w2 = jnp.concatenate([w, w])
        i_id = jnp.concatenate([pos, neg])

        p_t = self._label_pred(h_t[i_id], h_t)
        p_v = self._label_pred(h_v[i_id], h_v)
        p_s = self._label_pred(h_s[i_id], h_s)
        mm_s, s_s = self._pseudo_labels(p_t, p_v, p_s)
        l1 = self._neighbor_disc(mm_s, s_s, h_s[i_id], h_s, w2)
        mm_v, s_v = self._pseudo_labels(p_t, p_s, p_v)
        l2 = self._neighbor_disc(mm_v, s_v, h_v[i_id], h_v, w2)
        mm_t, s_t = self._pseudo_labels(p_v, p_s, p_t)
        l3 = self._neighbor_disc(mm_t, s_t, h_t[i_id], h_t, w2)
        nd_loss = (l1 + l2 + l3) / 3.0

        it = (h_t + h_s + h_v) / 3.0
        p_g = jax.nn.sigmoid(u_emb[users] @ _l2n(i_emb[i_id]).T)
        p_m = jax.nn.sigmoid(u_emb[users] @ _l2n(it[i_id]).T)
        kl_loss = (self._kl(p_g, p_m) + self._kl(p_m, p_g)).mean()

        # modality-weighted BPR
        ue = u_emb[users]
        sg = jax.lax.stop_gradient
        p_scores = jax.nn.sigmoid(
            jnp.stack(
                [
                    (ue * _l2n(h_t[pos])).sum(1),
                    (ue * _l2n(h_s[pos])).sum(1),
                    (ue * _l2n(h_v[pos])).sum(1),
                ]
            )
        )
        n_scores = jax.nn.sigmoid(
            jnp.stack(
                [
                    (ue * _l2n(h_t[neg])).sum(1),
                    (ue * _l2n(h_s[neg])).sum(1),
                    (ue * _l2n(h_v[neg])).sum(1),
                ]
            )
        )
        p_mean = sg(p_scores.mean(0))
        p_var = sg(p_scores.var(0))
        p_max = p_scores.max(0)
        n_mean = sg(n_scores.mean())
        pos_weight = jnp.clip(p_mean * jnp.exp(-p_var) ** 2.0, 0.0, 1.0)
        mask = (p_mean < n_mean).astype(jnp.float32)
        neg_weight = jnp.clip((p_max - n_mean) * mask, 0.0, 1.0)
        pos_weight, neg_weight = sg(pos_weight), sg(neg_weight)

        ia = i_emb + it
        pos_s = (ue * ia[pos]).sum(1)
        neg_s = (ue * ia[neg]).sum(1)
        denom = jnp.maximum(w.sum(), 1.0)
        per = -(
            jnp.log(jax.nn.sigmoid(pos_s - neg_s) + 1e-12) * pos_weight
            + jnp.log(jax.nn.sigmoid(neg_s - pos_s) + 1e-12) * neg_weight
        )
        mf = (per * w).sum() / denom

        total = mf + self.neighbor_weight * nd_loss + self.kl_weight * kl_loss
        return total, (total,)

    def full_embeddings(self, params, state):
        u_emb, i_emb, h_t, h_v, h_s = self.forward(params)
        return u_emb, i_emb + (h_v + h_t + h_s) / 3.0

    def scores(self, params, state, users):
        u_emb, i_emb, h_t, h_v, h_s = self.forward(params)
        all_i = i_emb + (h_v + h_t + h_s) / 3.0
        return u_emb[users] @ all_i.T
