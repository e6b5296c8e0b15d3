"""RFMRec: standalone Rectified-Flow multimodal recommender.

Parity with reference `src/models/rfmrec.py:25-657`:
- conditions: 2-layer graph-conv interaction signal (user⊕item), projected
  visual/text item features (:130-163);
- ``MultiScaleVelocityNet`` (:294-628): deep sinusoidal time embedding,
  per-modality DeepConditionEncoders, interleaved cross-/self-attention over
  the (≤3-token) condition stack, AdaGN-modulated residual blocks with
  learnable skip scales, mid-layer skip fusion;
- loss = λ_rf·straight-path RF + λ_rec·BPR + reg (:246-277);
- prediction uses the base embedding tables (:279-291) — RF shapes them
  through the shared loss.

TPU-native: the length-1/length-3 attention blocks are exact tiny einsums;
the ODE sampler is a scan (used by ``forward`` for generation parity).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.init import kaiming_uniform_default, xavier_uniform
from genmmrec_tpu.models.base import RecModel, scalar
from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm

_EPS = 1e-5


def _lin(key, d_in, d_out):
    """torch nn.Linear DEFAULT init (the reference never re-inits the
    velocity net or the modal projections — only the embedding tables get
    xavier): weight kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
    bias U(+-1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": kaiming_uniform_default(kw, (d_out, d_in)),
        "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound),
    }


def _fold(key, i):
    return None if key is None else jax.random.fold_in(key, i)


def _dropout(key, x, rate):
    """Inverted dropout; key=None means eval mode (identity)."""
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _ap(p, x):
    return x @ p["w"].T + p["b"]


def _gelu(x):
    """torch nn.GELU() default = exact erf form (jax defaults to tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


def _ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + _EPS) * p["g"] + p["b"]


def _ln_p(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _sin_emb(t, dim):
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
    emb = t * freqs[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def _mha(p, q, kv, num_heads, key=None, dropout=0.0):
    """Multi-head attention, (B, Lq, d) x (B, Lk, d). Dropout is applied to
    the attention probabilities (torch nn.MultiheadAttention semantics)."""
    B, Lq, d = q.shape
    Lk = kv.shape[1]
    dh = d // num_heads
    proj = lambda w, x: x @ w.T
    Q = (proj(p["wq"], q) + p["bq"]).reshape(B, Lq, num_heads, dh)
    K = (proj(p["wk"], kv) + p["bk"]).reshape(B, Lk, num_heads, dh)
    V = (proj(p["wv"], kv) + p["bv"]).reshape(B, Lk, num_heads, dh)
    att = jnp.einsum("bqhd,bkhd->bhqk", Q, K) / math.sqrt(dh)
    att = jax.nn.softmax(att, axis=-1)
    att = _dropout(key, att, dropout)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, V).reshape(B, Lq, d)
    return proj(p["wo"], out) + p["bo"]


def _mha_p(key, d):
    """torch nn.MultiheadAttention init: in_proj_weight is ONE (3d, d)
    xavier_uniform (bound sqrt(6/(3d+d))), in_proj_bias and out_proj.bias
    zero, out_proj.weight keeps the Linear default."""
    ks = jax.random.split(key, 4)
    bound = math.sqrt(6.0 / (4 * d))
    u = lambda k: jax.random.uniform(k, (d, d), minval=-bound, maxval=bound)
    return {
        "wq": u(ks[0]),
        "wk": u(ks[1]),
        "wv": u(ks[2]),
        "bq": jnp.zeros((d,)),
        "bk": jnp.zeros((d,)),
        "bv": jnp.zeros((d,)),
        "wo": kaiming_uniform_default(ks[3], (d, d)),
        "bo": jnp.zeros((d,)),
    }


class RFMRec(RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.embedding_dim = scalar(config["embedding_size"], int)
        self.hidden_dim = scalar(config["rf_hidden_dim"], int, default=256)
        self.n_layers = scalar(config["rf_n_layers"], int, default=2)
        self.dropout = scalar(config["rf_dropout"], default=0.1)
        self.reg_weight = scalar(config["reg_weight"])
        self.n_sampling_steps = scalar(config["rf_sampling_steps"], int, default=10)
        self.use_reflow = bool(config["rf_use_reflow"])
        self.lambda_rf = scalar(config["lambda_rf"], default=1.0)
        self.lambda_rec = scalar(config["lambda_rec"], default=1.0)
        self.num_heads = 8

        users = np.asarray(data.users)
        items = np.asarray(data.items)
        # weighted: the reference's lil-block assembly keeps duplicate
        # (u, i) multiplicity in edge values and degrees (rfmrec.py:89-107)
        self.norm_adj = bipartite_norm_adj(
            users, items, self.n_users, self.n_items, weighted=True
        )

    # ------------------------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 8)
        d, h = self.embedding_dim, self.hidden_dim
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, d)),
            "item_embedding": xavier_uniform(ks[1], (self.n_items, d)),
            "visual_proj": _lin(ks[2], self.v_feat.shape[1], d),
            "text_proj": _lin(ks[3], self.t_feat.shape[1], d),
            "velocity": self._init_velocity(ks[4]),
        }
        return params

    def _cond_encoder(self, key, d_in, h):
        ks = jax.random.split(key, 4)
        p = {
            "layers": [
                {"lin": _lin(ks[0], d_in, h), "ln": _ln_p(h)},
                {"lin": _lin(ks[1], h, h), "ln": _ln_p(h)},
            ]
        }
        if d_in != h:
            p["skip"] = _lin(ks[2], d_in, h)
        return p

    def _init_velocity(self, key):
        d2 = self.embedding_dim * 2
        h = self.hidden_dim
        ks = jax.random.split(key, 12 + 4 * self.n_layers)
        p = {
            "time1": _lin(ks[0], 256, h),
            "time2": _lin(ks[1], h, h),
            "time3": _lin(ks[2], h, h),
            "enc_interaction": self._cond_encoder(ks[3], d2, h),
            "enc_visual": self._cond_encoder(ks[4], self.embedding_dim, h),
            "enc_text": self._cond_encoder(ks[5], self.embedding_dim, h),
            "in_lin": _lin(ks[6], d2, h),
            "in_ln": _ln_p(h),
            "out_lin1": _lin(ks[7], h, h),
            "out_ln": _ln_p(h),
            "out_lin2": _lin(ks[8], h, d2),
            "skip_scale": jnp.ones((self.n_layers,)),
            "cross": [],
            "selfa": [],
            "res": [],
            "mid": [],
        }
        for i in range(self.n_layers):
            base = 9 + 4 * i
            p["cross"].append(
                {
                    "attn": _mha_p(ks[base], h),
                    "ln1": _ln_p(h),
                    "ln2": _ln_p(h),
                    "ffn1": _lin(jax.random.fold_in(ks[base], 1), h, h * 4),
                    "ffn2": _lin(jax.random.fold_in(ks[base], 2), h * 4, h),
                }
            )
            p["selfa"].append({"attn": _mha_p(ks[base + 1], h), "ln": _ln_p(h)})
            rk = jax.random.split(ks[base + 2], 6)
            p["res"].append(
                {
                    "net1": _lin(rk[0], h, h * 2),
                    "net2": _lin(rk[1], h * 2, h),
                    "gn": {"g": jnp.ones((h,)), "b": jnp.zeros((h,))},
                    "scale1": _lin(rk[2], h, h),
                    "scale2": _lin(rk[3], h, h),
                    "shift1": _lin(rk[4], h, h),
                    "shift2": _lin(rk[5], h, h),
                    "ln": _ln_p(h),
                }
            )
            if i < self.n_layers // 2:
                p["mid"].append({"lin": _lin(ks[base + 3], h, h), "ln": _ln_p(h)})
        return p

    def _apply_cond_encoder(self, p, x, key=None):
        skip = _ap(p["skip"], x) if "skip" in p else x
        hcur = x
        for j, layer in enumerate(p["layers"]):
            hcur = jax.nn.silu(_ln(_ap(layer["lin"], hcur), layer["ln"]))
            hcur = _dropout(_fold(key, j), hcur, self.dropout)
        return hcur + skip

    def _group_norm(self, x, p, groups=8):
        B, d = x.shape
        g = x.reshape(B, groups, d // groups)
        mu = g.mean(axis=2, keepdims=True)
        var = g.var(axis=2, keepdims=True)
        g = (g - mu) / jnp.sqrt(var + _EPS)
        return g.reshape(B, d) * p["g"] + p["b"]

    def velocity(self, vp, x, t, conditions, key=None):
        """key=None -> eval mode (no dropout), matching torch module.eval()."""
        dr = self.dropout
        t_emb = jax.nn.silu(_ap(vp["time1"], _sin_emb(t, 256)))
        t_emb = _dropout(_fold(key, 0), t_emb, dr)
        t_emb = jax.nn.silu(_ap(vp["time2"], t_emb))
        t_emb = _ap(vp["time3"], t_emb)

        cond_feats = [
            self._apply_cond_encoder(
                vp["enc_interaction"], conditions["interaction"], _fold(key, 1)
            ),
            self._apply_cond_encoder(vp["enc_visual"], conditions["visual"], _fold(key, 2)),
            self._apply_cond_encoder(vp["enc_text"], conditions["text"], _fold(key, 3)),
        ]
        cond_stack = jnp.stack(cond_feats, axis=1)  # (B, 3, h)
        cond_agg = cond_stack.mean(axis=1) + t_emb

        hcur = jax.nn.silu(_ln(_ap(vp["in_lin"], x), vp["in_ln"]))
        hcur = _dropout(_fold(key, 4), hcur, dr)
        skips = []
        for i in range(self.n_layers):
            lk = _fold(key, 16 + i)
            if i < len(vp["mid"]):
                skips.append(jax.nn.silu(_ln(_ap(vp["mid"][i]["lin"], hcur), vp["mid"][i]["ln"])))
            cp = vp["cross"][i]
            q = hcur[:, None, :]
            att = _mha(cp["attn"], q, cond_stack, self.num_heads, _fold(lk, 0), dr)
            q2 = _ln(q + att, cp["ln1"])
            ffn = _dropout(_fold(lk, 1), _gelu(_ap(cp["ffn1"], q2)), dr)
            ffn = _dropout(_fold(lk, 2), _ap(cp["ffn2"], ffn), dr)
            h_cross = _ln(q2 + ffn, cp["ln2"])[:, 0, :]
            hcur = hcur + h_cross
            sp = vp["selfa"][i]
            sa = _mha(
                sp["attn"], hcur[:, None, :], hcur[:, None, :], self.num_heads,
                _fold(lk, 3), dr,
            )
            hcur = hcur + _ln(hcur[:, None, :] + sa, sp["ln"])[:, 0, :]
            rp = vp["res"][i]
            hr = _dropout(_fold(lk, 4), _gelu(_ap(rp["net1"], hcur)), dr)
            hr = _ap(rp["net2"], hr)
            hr = self._group_norm(hr, rp["gn"])
            scale = _ap(rp["scale2"], jax.nn.silu(_ap(rp["scale1"], cond_agg)))
            shift = _ap(rp["shift2"], jax.nn.silu(_ap(rp["shift1"], cond_agg)))
            hr = _ln(scale * hr + shift, rp["ln"]) + hcur
            hcur = hcur + vp["skip_scale"][i] * hr
        if skips:
            hcur = hcur + jnp.stack(skips, 0).mean(0)
        out = jax.nn.silu(_ln(_ap(vp["out_lin1"], hcur), vp["out_ln"]))
        out = _dropout(_fold(key, 5), out, dr)
        return _ap(vp["out_lin2"], out)

    # ------------------------------------------------------------------
    def _conditions(self, params, users, items):
        x = jnp.concatenate([params["user_embedding"], params["item_embedding"]], axis=0)
        acc = x
        for _ in range(2):
            x = spmm(self.norm_adj, x)
            acc = acc + x
        g = acc / 3.0
        return {
            "interaction": jnp.concatenate(
                [g[: self.n_users][users], g[self.n_users :][items]], axis=-1
            ),
            "visual": _ap(params["visual_proj"], self.v_feat[items]),
            "text": _ap(params["text_proj"], self.t_feat[items]),
        }

    def loss(self, params, state, batch, key):
        users, pos, neg, w = batch["users"], batch["pos"], batch["neg"], batch["weight"]
        k_noise, k_t, k_drop = jax.random.split(key, 3)
        conds = self._conditions(params, users, pos)
        X1 = jnp.concatenate(
            [params["user_embedding"][users], params["item_embedding"][pos]], axis=-1
        )
        X0 = jax.random.normal(k_noise, X1.shape)
        t = jax.random.uniform(k_t, (X1.shape[0], 1))
        X_t = t * X1 + (1 - t) * X0
        v_pred = self.velocity(params["velocity"], X_t, t, conds, k_drop)
        rf = (((v_pred - (X1 - X0)) ** 2).mean(1) * w).sum() / jnp.maximum(w.sum(), 1.0)

        u = params["user_embedding"][users]
        p_e = params["item_embedding"][pos]
        n_e = params["item_embedding"][neg]
        denom = jnp.maximum(w.sum(), 1.0)
        bpr = -(jax.nn.log_sigmoid((u * p_e).sum(1) - (u * n_e).sum(1)) * w).sum() / denom
        reg = self.reg_weight * ((u**2).sum() + (p_e**2).sum() + (n_e**2).sum()) / users.shape[0]
        total = self.lambda_rf * rf + self.lambda_rec * bpr + reg
        return total, (total,)

    def generate(self, params, key, users, items, n_steps=None):
        """Euler-ODE embedding generation (reference forward/sample_ode)."""
        n_steps = n_steps or (1 if self.use_reflow else self.n_sampling_steps)
        conds = self._conditions(params, users, items)
        B = users.shape[0]
        z = jax.random.normal(key, (B, self.embedding_dim * 2))
        dt = 1.0 / n_steps

        def body(z, i):
            t = jnp.full((B, 1), i * dt)
            v = self.velocity(params["velocity"], z, t, conds)
            return z + v * dt, None

        z, _ = jax.lax.scan(body, z, jnp.arange(n_steps))
        return jnp.split(z, 2, axis=-1)

    def full_embeddings(self, params, state):
        return params["user_embedding"], params["item_embedding"]

    def scores(self, params, state, users):
        return params["user_embedding"][users] @ params["item_embedding"].T


# reference class name alias (rfmrec.py defines RFMREC)
RFMREC = RFMRec
