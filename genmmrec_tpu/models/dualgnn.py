"""DualGNN: dual-graph (user-user co-occurrence + modality) GNN (TMM '21).

Parity with reference `src/models/dualgnn.py:20-350`:
- per-modality GCN towers: user preference matrix + MLP-projected features,
  two degree-normalized propagation hops, ``x + h + h1``;
- the reference builds modality-dropped edge lists at init but its GCN
  forward never uses them (``edge_index_drop`` is ignored,
  dualgnn.py:305-310) — towers propagate over the full symmetric edges;
- per-epoch user-user top-k (k=40) neighborhood sampling from the
  co-occurrence dict with softmax weights, aggregated into the fused user
  representation (``weight_u``-mixed modal towers);
- loss: −mean(log₂ σ(pos−neg)) + preference/weight regularization.

TPU-native: ``user_graph_dict.npy`` is built on host at init from train
co-occurrence counts when the file is absent (the reference ships it via
`preprocessing/dualgnn-gen-u-u-matrix.py`); the per-epoch top-k sampling is
static (top-k is deterministic) so it folds into init.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.mp import degree, propagate

_EPS = 1e-12


def _l2n(x):
    return x / jnp.sqrt((x**2).sum(-1, keepdims=True) + _EPS)


class DualGNN(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.dim_x = scalar(config["embedding_size"], int)
        self.dim_latent = 64
        self.aggr_mode = str(config["aggr_mode"] or "add")
        self.reg_weight = scalar(config["reg_weight"])
        self.k = 40
        self.drop_rate = 0.1
        self.N = self.n_users + self.n_items

        from genmmrec_tpu.ops.graph import unique_ui_pairs

        users, items_u = unique_ui_pairs(np.asarray(data.users), np.asarray(data.items))
        users = users.astype(np.int32)
        items_n = (items_u + self.n_users).astype(np.int32)
        src = np.concatenate([users, items_n])
        dst = np.concatenate([items_n, users])
        self.src = jnp.asarray(src)
        self.dst = jnp.asarray(dst)

        # the reference constructs modality-dropped edge lists but its GCN
        # forward ignores them — both hops run on the FULL symmetric edges
        # (dualgnn.py:305-310, edge_index_drop is an unused argument); match
        # that: one shared sorted edge list for every tower
        from genmmrec_tpu.ops.mp import sort_edges_by_dst

        s_, d_, span_ = sort_edges_by_dst(src, dst, self.N)
        self.src_v = self.src_t = jnp.asarray(s_)
        self.dst_v = self.dst_t = jnp.asarray(d_)
        self._span_v = self._span_t = span_

        self._build_user_graph(config, users, items_u)

    def _build_user_graph(self, config, users, items):
        """Top-k user-user co-occurrence neighbors + softmax weights."""
        path = os.path.join(
            os.path.abspath(
                os.path.join(config["data_path"] or "./data/", config["dataset"] or "")
            ),
            config["user_graph_dict_file"] or "user_graph_dict.npy",
        )
        U, k = self.n_users, self.k
        nbrs = np.zeros((U, k), np.int64)
        wts = np.full((U, k), -np.inf, np.float64)
        if os.path.isfile(path):
            d = np.load(path, allow_pickle=True).item()
            for u in range(U):
                ns, ws = d.get(u, ([], []))
                ns, ws = list(ns)[:k], list(ws)[:k]
                if not ns:
                    continue
                while len(ns) < k:
                    ns.append(ns[len(ns) % max(1, len(ns)) - 1])
                    ws.append(ws[len(ws) % max(1, len(ws)) - 1])
                nbrs[u] = ns
                wts[u] = ws
        else:  # derive from co-occurrence counts (preprocessing equivalent)
            native_out = None
            try:
                from genmmrec_tpu import native

                native_out = native.cooccur_topk(users, items, U, self.n_items, k)
            except Exception:
                native_out = None
            if native_out is not None:
                nb, w0 = native_out
                nbrs = nb.astype(np.int64)
                wts = np.where(w0 > 0, w0.astype(np.float64), -np.inf)
            else:
                R = np.zeros((U, self.n_items), np.float32)
                np.add.at(R, (users, items), 1.0)
                block = 2048
                for s in range(0, U, block):
                    co = R[s : s + block] @ R.T  # (b, U)
                    for bi in range(co.shape[0]):
                        co[bi, s + bi] = 0.0
                    idx = np.argpartition(-co, min(k, U - 1) - 1, axis=1)[:, :k]
                    val = np.take_along_axis(co, idx, axis=1)
                    nbrs[s : s + block] = idx
                    wts[s : s + block] = np.where(val > 0, val, -np.inf)
        # softmax with empty rows -> zero weights
        m = wts.max(axis=1, keepdims=True)
        has = np.isfinite(m)[:, 0]
        e = np.where(np.isfinite(wts), np.exp(wts - np.where(np.isfinite(m), m, 0.0)), 0.0)
        s = e.sum(axis=1, keepdims=True)
        w = np.where(has[:, None] & (s > 0), e / np.maximum(s, 1e-12), 0.0)
        self.user_nbrs = jnp.asarray(nbrs.astype(np.int32))
        self.user_nbr_w = jnp.asarray(w.astype(np.float32))

    # ------------------------------------------------------------------
    def init_params(self, key):
        from genmmrec_tpu.common.init import linear_params

        ks = jax.random.split(key, 10)
        d = self.dim_latent
        # the reference xavier-inits only `preference` and `weight_u/i`; its
        # GCN.MLP / MLP_1 keep torch nn.Linear DEFAULTS (kaiming-uniform
        # weight + uniform bias, dualgnn.py:295-297) — load-bearing because
        # both frameworks peak at epoch 0 on this model, so the init-time
        # feature projection largely decides the converged metric
        from genmmrec_tpu.common.init import kaiming_uniform_default as kud

        return {
            "v_preference": xavier_normal(ks[0], (self.n_users, d)),
            "v_mlp": linear_params(ks[1], self.v_feat.shape[1], 4 * d, init=kud),
            "v_mlp1": linear_params(ks[2], 4 * d, d, init=kud),
            "t_preference": xavier_normal(ks[3], (self.n_users, d)),
            "t_mlp": linear_params(ks[4], self.t_feat.shape[1], 4 * d, init=kud),
            "t_mlp1": linear_params(ks[5], 4 * d, d, init=kud),
            "weight_u": jax.nn.softmax(
                xavier_normal(ks[6], (self.n_users, 2, 1)), axis=1
            ),
            "weight_i": jax.nn.softmax(
                xavier_normal(ks[7], (self.n_items, 2, 1)), axis=1
            ),
        }

    def _gcn_pass(self, x, src, dst, span=0):
        deg = degree(dst, self.N)  # reference norms by row=src degree of the
        deg_s = degree(src, self.N)
        norm = (deg_s[src] + 1e-12) ** -0.5 * (deg[dst] + 1e-12) ** -0.5
        return propagate(x, src, dst, self.N, "add", edge_weight=norm, pallas_span=span)

    def _tower(self, pref, mlp, mlp1, feats, src, dst, span=0):
        tf = jax.nn.leaky_relu(feats @ mlp["w"].T + mlp["b"], 0.01)
        tf = tf @ mlp1["w"].T + mlp1["b"]
        x = _l2n(jnp.concatenate([pref, tf], axis=0))
        h = self._gcn_pass(x, src, dst, span)
        h1 = self._gcn_pass(h, src, dst, span)
        return x + h + h1

    def forward(self, params):
        v_rep = self._tower(
            params["v_preference"], params["v_mlp"], params["v_mlp1"], self.v_feat,
            self.src_v, self.dst_v, self._span_v,
        )
        t_rep = self._tower(
            params["t_preference"], params["t_mlp"], params["t_mlp1"], self.t_feat,
            self.src_t, self.dst_t, self._span_t,
        )
        representation = v_rep + t_rep
        # the reference aliases representation = self.v_rep then does an
        # in-place += t_rep (dualgnn.py:146-155), so its fusion actually
        # mixes (v_rep + t_rep) with t_rep — match that behavior
        user_stack = jnp.stack(
            [representation[: self.n_users], t_rep[: self.n_users]], axis=2
        )
        user_rep = jnp.einsum("udm,uml->ud", user_stack, params["weight_u"])
        item_rep = representation[self.n_users :]
        # user-user aggregation
        h_u1 = jnp.einsum("uk,ukd->ud", self.user_nbr_w, user_rep[self.user_nbrs])
        user_rep = user_rep + h_u1
        return jnp.concatenate([user_rep, item_rep], axis=0)

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        out = self.forward(params)
        u = out[users]
        p_e = out[pos + self.n_users]
        n_e = out[neg + self.n_users]
        denom = jnp.maximum(w.sum(), 1.0)
        per = -jnp.log2(jax.nn.sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) + 1e-12)
        loss = (per * w).sum() / denom
        reg = (
            (params["v_preference"][users] ** 2).mean()
            + (params["t_preference"][users] ** 2).mean()
            + (params["weight_u"] ** 2).mean()
            + (params["weight_i"] ** 2).mean()
        )
        total = loss + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        out = self.forward(params)
        return out[: self.n_users], out[self.n_users :]

    def scores(self, params, state, users):
        out = self.forward(params)
        return out[users] @ out[self.n_users :].T
