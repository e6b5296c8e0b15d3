"""LATTICE: learned item-item latent graph (MM '21).

Parity with reference `src/models/lattice.py:20-238`: modal features are
projected and used to *learn* a dense KNN item graph each epoch, mixed with
the frozen original modal KNN graphs by ``lambda_coeff``; item embeddings
propagate over the learned graph; the UI propagation supports
lightgcn/ngcf/mf backbones (default lightgcn) over a **row-normalized (+I)**
adjacency; BPR with batch-size-scaled L2.

TPU-native delta: the reference builds the learned graph with gradients on
the first batch of every epoch and reuses a detached copy afterwards
(`lattice.py:137-159`); here the learned graph is rebuilt (with gradients)
every batch — same objective, denser gradient signal for the modal
projections, one extra MXU matmul per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import xavier_normal, xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import SparseGraph, build_sim, knn_graph_dense, norm_laplacian_dense, spmm


def _rw_plus_eye_adj(users, items, n_users, n_items):
    """D^{-1}(A+I) row-normalized adjacency (lattice.py:100-122)."""
    N = n_users + n_items
    rows = np.concatenate([users, items + n_users, np.arange(N)]).astype(np.int64)
    cols = np.concatenate([items + n_users, users, np.arange(N)]).astype(np.int64)
    vals = np.ones(len(rows), np.float64)
    deg = np.zeros(N)
    np.add.at(deg, rows, vals)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, 1.0 / deg, 0.0)
    nvals = (dinv[rows] * vals).astype(np.float32)
    order = np.argsort(rows, kind="stable")
    return SparseGraph(
        rows=jnp.asarray(rows[order].astype(np.int32)),
        cols=jnp.asarray(cols[order].astype(np.int32)),
        vals=jnp.asarray(nvals[order]),
        n_rows=N,
        n_cols=N,
    ).with_span()


class LATTICE(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.feat_embed_dim = scalar(config["feat_embed_dim"], int)
        self.knn_k = scalar(config["knn_k"], int)
        self.lambda_coeff = scalar(config["lambda_coeff"])
        self.cf_model = str(config["cf_model"] or "lightgcn")
        self.n_layers = scalar(config["n_layers"], int)
        self.reg_weight = scalar(config["reg_weight"])
        self.n_ui_layers = len(config["weight_size"] or [64, 64])

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        self.norm_adj = _rw_plus_eye_adj(users, items, self.n_users, self.n_items)

        # frozen original modal KNN graphs (dense, sym-normalized)
        self.image_original_adj = (
            knn_graph_dense(build_sim(self.v_feat), self.knn_k) if self.v_feat is not None else None
        )
        self.text_original_adj = (
            knn_graph_dense(build_sim(self.t_feat), self.knn_k) if self.t_feat is not None else None
        )
        # the dense (n_items, n_items) modal graphs must ride as jit
        # arguments: as closure constants they inline into the compiled
        # program and blow the remote-compile size limit (HTTP 413 for
        # RFLATTICE at baby scale)
        self.buffer_names = self.buffer_names + (
            "image_original_adj", "text_original_adj"
        )

    def init_params(self, key):
        ks = jax.random.split(key, 5)
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, self.embedding_dim)),
            "item_id_embedding": xavier_uniform(ks[1], (self.n_items, self.embedding_dim)),
            "modal_weight": jnp.array([0.5, 0.5]),
        }
        if self.v_feat is not None:
            params["image_trs"] = {
                "w": xavier_normal(ks[2], (self.feat_embed_dim, self.v_feat.shape[1])),
                "b": jnp.zeros((self.feat_embed_dim,)),
            }
        if self.t_feat is not None:
            params["text_trs"] = {
                "w": xavier_normal(ks[3], (self.feat_embed_dim, self.t_feat.shape[1])),
                "b": jnp.zeros((self.feat_embed_dim,)),
            }
        return params

    def _learned_item_adj(self, params):
        weight = jax.nn.softmax(params["modal_weight"])
        learned = original = None
        if self.v_feat is not None:
            f = self.v_feat @ params["image_trs"]["w"].T + params["image_trs"]["b"]
            sim = build_sim(f)
            vals, idx = jax.lax.top_k(sim, self.knn_k)
            image_adj = jnp.zeros_like(sim).at[
                jnp.arange(sim.shape[0])[:, None], idx
            ].set(vals)
            learned, original = image_adj, self.image_original_adj
        if self.t_feat is not None:
            f = self.t_feat @ params["text_trs"]["w"].T + params["text_trs"]["b"]
            sim = build_sim(f)
            vals, idx = jax.lax.top_k(sim, self.knn_k)
            text_adj = jnp.zeros_like(sim).at[
                jnp.arange(sim.shape[0])[:, None], idx
            ].set(vals)
            if learned is None:
                learned, original = text_adj, self.text_original_adj
            else:
                learned = weight[0] * learned + weight[1] * text_adj
                original = weight[0] * self.image_original_adj + weight[1] * self.text_original_adj
        learned = norm_laplacian_dense(learned, "sym")
        return (1.0 - self.lambda_coeff) * learned + self.lambda_coeff * original

    def propagate(self, params):
        item_adj = self._learned_item_adj(params)
        h = params["item_id_embedding"]
        for _ in range(self.n_layers):
            h = item_adj @ h
        ego = jnp.concatenate([params["user_embedding"], params["item_id_embedding"]], axis=0)
        if self.cf_model == "mf":
            u, i = params["user_embedding"], params["item_id_embedding"]
        else:  # lightgcn (ngcf variant falls back to lightgcn propagation)
            acc = ego
            x = ego
            for _ in range(self.n_ui_layers):
                x = spmm(self.norm_adj, x)
                acc = acc + x
            out = acc / (self.n_ui_layers + 1)
            u, i = out[: self.n_users], out[self.n_users :]
        h_norm = h / jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True), 1e-12)
        return u, i + h_norm

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        ua, ia = self.propagate(params)
        u, p_e, n_e = ua[users], ia[pos], ia[neg]
        denom = jnp.maximum(w.sum(), 1.0)
        mf = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom
        reg = 0.5 * ((u**2).sum() + (p_e**2).sum() + (n_e**2).sum()) / self.batch_size
        total = mf + self.reg_weight * reg
        return total, (total,)

    def full_embeddings(self, params, state):
        return self.propagate(params)

    def scores(self, params, state, users):
        ua, ia = self.propagate(params)
        return ua[users] @ ia.T
