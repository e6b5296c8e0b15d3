"""SLMRec: self-supervised learning for multimedia recommendation (TMM '22).

Parity with reference `src/models/slmrec.py:20-480`:
- id/visual/text LightGCN towers sharing the user table over the 'pre'
  (D^{-1/2}(A)D^{-1/2}) adjacency; concat fusion + post-GCN linear heads;
- main loss: in-batch InfoNCE (CrossEntropy over u·posᵀ logits);
- SSL tasks: FAC (fine-and-coarse projection heads g_i_iv … g_t_ivat,
  default), FD (dropout-perturbed twin propagation, :120-190), FM (random
  modality masking, :192-267), FD+FM (masking + per-layer dropout, :352),
  each as in-batch CE between the two views.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, spmm

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


def _in_batch_ce(v1, v2, temp, weights):
    """CrossEntropy(labels=diag) over v1 @ v2.T / temp."""
    logits = v1 @ v2.T / temp
    logp = jax.nn.log_softmax(logits, axis=1)
    per = -jnp.diagonal(logp)
    return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)


class SLMRec(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.latent_dim = scalar(config["recdim"] or config["embedding_size"], int)
        self.n_layers = scalar(config["layer_num"] or 3, int)
        self.mm_fusion_mode = str(config["mm_fusion_mode"] or "concat")
        self.temp = scalar(config["temp"] or 0.2)
        self.ssl_task = str(config["ssl_task"] or "FAC")
        self.ssl_temp = scalar(config["ssl_temp"] or 0.1)
        self.ssl_alpha = scalar(config["ssl_alpha"] or 0.01)
        self.dropout_rate = scalar(config["dropout_rate"] or 0.3)

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        # 'pre' adjacency over DEDUPED binary edges (the reference builds it
        # from interaction_csr.nonzero(), src/models/slmrec.py:434-440)
        users, items = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        N = self.n_users + self.n_items
        rows = np.concatenate([users, items + self.n_users]).astype(np.int64)
        cols = np.concatenate([items + self.n_users, users]).astype(np.int64)
        deg = np.bincount(rows, minlength=N).astype(np.float64) + 1e-8
        dis = np.power(deg, -0.5)
        vals = (dis[rows] * dis[cols]).astype(np.float32)
        order = np.argsort(rows, kind="stable")
        self.norm_adj = SparseGraph(
            rows=jnp.asarray(rows[order].astype(np.int32)),
            cols=jnp.asarray(cols[order].astype(np.int32)),
            vals=jnp.asarray(vals[order]),
            n_rows=N,
            n_cols=N,
            symmetric=True,  # mirrored edges, joint normalization
        ).with_span()
        self.v_feat = _l2n(self.v_feat)
        self.t_feat = _l2n(self.t_feat)

    def init_params(self, key):
        from genmmrec_tpu.common.init import linear_params

        ks = jax.random.split(key, 12)
        d = self.latent_dim
        # reference xavier_uniform's only the weights (slmrec.py:47-60,
        # 429-433); biases keep torch nn.Linear defaults
        lin = lambda k, i, o: linear_params(k, i, o, init=xavier_uniform)
        fused_dim = d * 3 if self.mm_fusion_mode == "concat" else d
        return {
            "embedding_user": xavier_uniform(ks[0], (self.n_users, d)),
            "embedding_item": xavier_uniform(ks[1], (self.n_items, d)),
            "v_dense": lin(ks[2], self.v_feat.shape[1], d),
            "t_dense": lin(ks[3], self.t_feat.shape[1], d),
            "user_after": lin(ks[4], fused_dim, d),
            "item_after": lin(ks[5], fused_dim, d),
            "g_i_iv": lin(ks[6], d, d),
            "g_v_iv": lin(ks[7], d, d),
            "g_iv_iva": lin(ks[8], d, d),
            "g_a_iva": lin(ks[9], d, d),
            "g_iva_ivat": lin(ks[10], d, d // 2),
            "g_t_ivat": lin(ks[11], d, d // 2),
        }

    @staticmethod
    def _lin(p, x):
        return x @ p["w"].T + p["b"]

    def _graph(self, u_emb, i_emb, dropout_keys=None):
        x = jnp.concatenate([u_emb, i_emb], axis=0)
        acc = x
        for li in range(self.n_layers):
            x = spmm(self.norm_adj, x)
            if dropout_keys is not None:
                keep = jax.random.bernoulli(
                    dropout_keys[li], 1.0 - self.dropout_rate, x.shape
                )
                x = jnp.where(keep, x / (1.0 - self.dropout_rate), 0.0)
            acc = acc + x
        return acc / (self.n_layers + 1)

    def _fusion(self, reps):
        if self.mm_fusion_mode == "concat":
            return jnp.concatenate(reps, axis=1)
        return jnp.mean(jnp.stack(reps), axis=0)

    def compute(self, params):
        u = params["embedding_user"]
        v_dense = self._lin(params["v_dense"], self.v_feat)
        t_dense = self._lin(params["t_dense"], self.t_feat)
        i_emb = self._graph(u, params["embedding_item"])
        v_emb = self._graph(u, v_dense)
        t_emb = self._graph(u, t_dense)
        nu = self.n_users
        self._tower_items = (i_emb[nu:], v_emb[nu:], t_emb[nu:])
        user = self._lin(params["user_after"], self._fusion([i_emb[:nu], v_emb[:nu], t_emb[:nu]]))
        item = self._lin(params["item_after"], self._fusion([i_emb[nu:], v_emb[nu:], t_emb[nu:]]))
        return user, item

    # -- SSL tasks ------------------------------------------------------
    def _fac(self, params, idx, weights):
        i_i, v_i, t_i = self._tower_items
        x_i_iv = self._lin(params["g_i_iv"], i_i[idx])
        x_v_iv = self._lin(params["g_v_iv"], v_i[idx])
        v_loss = _in_batch_ce(x_i_iv, x_v_iv, self.ssl_temp, weights)
        x_iv_iva = self._lin(params["g_iv_iva"], x_i_iv)
        x_iva_ivat = self._lin(params["g_iva_ivat"], x_iv_iva)
        x_t_ivat = self._lin(params["g_t_ivat"], t_i[idx])
        t_loss = _in_batch_ce(x_iva_ivat, x_t_ivat, self.ssl_temp, weights)
        return v_loss + t_loss

    def _fd(self, params, key, users, items, weights):
        u = params["embedding_user"]
        towers = [
            params["embedding_item"],
            self._lin(params["v_dense"], self.v_feat),
            self._lin(params["t_dense"], self.t_feat),
        ]
        k1, k2 = jax.random.split(key)
        view = lambda k, i_emb: self._graph(
            u, i_emb, jax.random.split(k, self.n_layers)
        )
        reps1 = [view(jax.random.fold_in(k1, j), t) for j, t in enumerate(towers)]
        reps2 = [view(jax.random.fold_in(k2, j), t) for j, t in enumerate(towers)]
        nu = self.n_users
        u1 = self._lin(params["user_after"], self._fusion([r[:nu] for r in reps1]))[users]
        u2 = self._lin(params["user_after"], self._fusion([r[:nu] for r in reps2]))[users]
        i1 = self._lin(params["item_after"], self._fusion([r[nu:] for r in reps1]))[items]
        i2 = self._lin(params["item_after"], self._fusion([r[nu:] for r in reps2]))[items]
        return _in_batch_ce(_l2n(u1), _l2n(u2), self.ssl_temp, weights) + _in_batch_ce(
            _l2n(i1), _l2n(i2), self.ssl_temp, weights
        )

    @staticmethod
    def _fm_draw(key, R):
        """Draw two DISTINCT modality indices in [0, R) — the FM task's
        masked-view selection (reference slmrec.py:200-204). Factored out
        so tests can pin the distinctness invariant directly."""
        k_sel1, k_sel2 = jax.random.split(key)
        idx1 = jax.random.randint(k_sel1, (), 0, R)
        idx2 = jax.random.randint(k_sel2, (), 0, R - 1)
        idx2 = idx2 + (idx2 >= idx1).astype(idx2.dtype)  # distinct draw
        return idx1, idx2

    def _fm(self, params, key, users, items, weights, use_dropout):
        """Feature Masking (reference `feature_masking`, slmrec.py:192-267):
        draw two DISTINCT modality indices; view k zeroes the item-side
        input of its drawn modality before propagation. Reproduces the
        reference's crossed accumulation (embs_sub_1 collects view-2's
        propagated layers and vice versa, :227-229). Masking candidates are
        the modalities actually present — [v, t, id] here; the reference
        hard-codes [v, a, t, id] and dereferences ``a_dense_emb``
        unconditionally (:157,:243), which raises on audio-less datasets.
        ``use_dropout=True`` is the FD+FM task (:352)."""
        u = params["embedding_user"]
        towers = [  # fusion order [id, v, t] as in compute(); mask ids below
            params["embedding_item"],
            self._lin(params["v_dense"], self.v_feat),
            self._lin(params["t_dense"], self.t_feat),
        ]
        mask_id = [2, 0, 1]  # id ↔ last mask index, like the reference's 3
        R = len(towers)
        k_sel, k_d = jax.random.split(key)
        idx1, idx2 = self._fm_draw(k_sel, R)

        reps1, reps2 = [], []
        for j, i_emb in enumerate(towers):
            m = mask_id[j]
            x1 = jnp.concatenate(
                [u, i_emb * (m != idx1).astype(i_emb.dtype)], axis=0
            )
            x2 = jnp.concatenate(
                [u, i_emb * (m != idx2).astype(i_emb.dtype)], axis=0
            )
            e1, e2, acc1, acc2 = x1, x2, x1, x2
            for li in range(self.n_layers):
                e1 = spmm(self.norm_adj, e1)
                e2 = spmm(self.norm_adj, e2)
                if use_dropout:
                    kd1 = jax.random.fold_in(k_d, j * 2 * self.n_layers + li)
                    kd2 = jax.random.fold_in(
                        k_d, (j * 2 + 1) * self.n_layers + li
                    )
                    keep1 = jax.random.bernoulli(kd1, 1.0 - self.dropout_rate, e1.shape)
                    keep2 = jax.random.bernoulli(kd2, 1.0 - self.dropout_rate, e2.shape)
                    e1 = jnp.where(keep1, e1 / (1.0 - self.dropout_rate), 0.0)
                    e2 = jnp.where(keep2, e2 / (1.0 - self.dropout_rate), 0.0)
                # crossed accumulation, exactly as the reference
                acc2 = acc2 + e1
                acc1 = acc1 + e2
            reps1.append(acc1 / (self.n_layers + 1))
            reps2.append(acc2 / (self.n_layers + 1))

        nu = self.n_users
        u1 = self._lin(params["user_after"], self._fusion([r[:nu] for r in reps1]))[users]
        u2 = self._lin(params["user_after"], self._fusion([r[:nu] for r in reps2]))[users]
        i1 = self._lin(params["item_after"], self._fusion([r[nu:] for r in reps1]))[items]
        i2 = self._lin(params["item_after"], self._fusion([r[nu:] for r in reps2]))[items]
        return _in_batch_ce(_l2n(u1), _l2n(u2), self.ssl_temp, weights) + _in_batch_ce(
            _l2n(i1), _l2n(i2), self.ssl_temp, weights
        )

    # ------------------------------------------------------------------
    def loss(self, params, state, batch, key):
        users, pos, w = batch["users"], batch["pos"], batch["weight"]
        all_u, all_i = self.compute(params)
        main = _in_batch_ce(_l2n(all_u[users]), _l2n(all_i[pos]), self.temp, w)
        if self.ssl_task == "FAC":
            ssl = self._fac(params, pos, w)
        elif self.ssl_task == "FM":
            ssl = self._fm(params, key, users, pos, w, use_dropout=False)
        elif self.ssl_task == "FD+FM":
            ssl = self._fm(params, key, users, pos, w, use_dropout=True)
        else:  # FD
            ssl = self._fd(params, key, users, pos, w)
        total = main + self.ssl_alpha * ssl
        return total, (total,)

    def eval_artifacts(self, params, state):
        return self.compute(params)

    def scores_cached(self, params, state, users, artifacts):
        all_u, all_i = artifacts
        return jax.nn.sigmoid(all_u[users] @ all_i.T)

    def scores(self, params, state, users):
        all_u, all_i = self.compute(params)
        return jax.nn.sigmoid(all_u[users] @ all_i.T)
