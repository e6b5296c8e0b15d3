"""Rectified-Flow pluggable module (+ causal denoiser).

Parity with reference `src/models/rf_modules.py:1-1077`:
- ``SimpleVelocityNet`` (:344-479): sinusoidal time embedding, condition
  encoder, residual blocks, train-only user-prior and cosine-gradient
  guidance with ``(1-t)^power`` decay;
- straight-path RF loss ``‖v(X_t,t,c) − (X1−X0)‖²`` plus an
  interaction-based sampled-negative InfoNCE on the one-step predicted
  endpoint ``X_t + (1−t)·v`` (:609-698, 718-778);
- Euler-ODE ``generate`` (:896-...); 2-RF reflow dataset preparation and
  warm transition schedule (:977-..., :826-846);
- ``mix_embeddings``: originals during training, ``orig + ratio·gen`` at
  inference (:1038-...);
- ``PropensityScoreEstimator`` / ``CausalDenoiser`` IPW denoising
  (:81-294).

TPU-native deltas: the RF module's embedded AdamW becomes an
``optax.multi_transform`` label (the host model labels the ``rf`` subtree;
see ``Trainer._make_optimizer``) — the update happens in the same jitted
train step, gradients isolated exactly as the reference's detach() calls
isolate them. Gradient checkpointing maps to ``jax.checkpoint`` over ODE
steps.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from genmmrec_tpu.common.init import xavier_uniform


@dataclasses.dataclass
class RFConfig:
    embedding_dim: int
    hidden_dim: int = 128
    n_layers: int = 2
    dropout: float = 0.1
    learning_rate: float = 0.0001
    sampling_steps: int = 10
    user_guidance_scale: float = 0.2
    guidance_decay_power: float = 2.0
    cosine_guidance_scale: float = 0.1
    cosine_decay_power: float = 2.0
    warmup_epochs: int = 5
    train_mix_ratio: float = 0.1
    inference_mix_ratio: float = 0.2
    contrast_temp: float = 0.2
    contrast_weight: float = 1.0
    n_users: int = 0
    n_items: int = 0
    infonce_negative_samples: int = 1024
    use_2rf: bool = False
    rf_2rf_transition_epoch: int = 10

    @classmethod
    def from_config(cls, config, n_users, n_items, embedding_dim):
        def g(k, d):
            v = config[k] if config[k] is not None else d
            # hyper-grid lists resolve to their first entry when the grid
            # loop is bypassed (tests / direct construction)
            return v[0] if isinstance(v, list) else v
        return cls(
            embedding_dim=embedding_dim,
            hidden_dim=int(g("rf_hidden_dim", 128)),
            n_layers=int(g("rf_n_layers", 2)),
            dropout=float(g("rf_dropout", 0.1)),
            learning_rate=float(g("rf_learning_rate", 0.0001)),
            sampling_steps=int(g("rf_sampling_steps", 10)),
            user_guidance_scale=float(g("user_guidance_scale", 0.2)),
            guidance_decay_power=float(g("guidance_decay_power", 2.0)),
            cosine_guidance_scale=float(g("cosine_guidance_scale", 0.1)),
            cosine_decay_power=float(g("cosine_decay_power", 2.0)),
            warmup_epochs=int(g("rf_warmup_epochs", 5)),
            train_mix_ratio=float(g("rf_mix_ratio", 0.1)),
            inference_mix_ratio=float(g("rf_inference_mix_ratio", 0.2)),
            contrast_temp=float(g("rf_contrast_temp", 0.2)),
            contrast_weight=float(g("rf_loss_weight", 1.0)),
            n_users=n_users,
            n_items=n_items,
            infonce_negative_samples=int(g("infonce_negative_samples", 1024)),
            use_2rf=bool(g("use_2rf", False)),
            rf_2rf_transition_epoch=int(
                g("rf_2rf_transition_epoch", int(g("rf_warmup_epochs", 5)) + 5)
            ),
        )


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int = 64) -> jnp.ndarray:
    """t: (B, 1) in [0, 1]."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
    emb = t * freqs[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def cosine_similarity_gradient(x_t: jnp.ndarray, x_1: jnp.ndarray) -> jnp.ndarray:
    """∇_{x_t} cos(x_t, x_1) closed form (rf_modules.py:49-79)."""
    eps = 1e-8
    xt_norm = jnp.maximum(jnp.linalg.norm(x_t, axis=-1, keepdims=True), eps)
    x1n = x_1 / jnp.maximum(jnp.linalg.norm(x_1, axis=-1, keepdims=True), eps)
    xtn = x_t / xt_norm
    cos = (xtn * x1n).sum(-1, keepdims=True)
    return x1n / xt_norm - xtn * cos / xt_norm


def _lin(key, d_in, d_out):
    kw, _ = jax.random.split(key)
    return {"w": xavier_uniform(kw, (d_out, d_in)), "b": jnp.zeros((d_out,))}


def _ap(p, x):
    return x @ p["w"].T + p["b"]


def _ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def _ln_p(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def init_velocity_net(key, cfg: RFConfig, condition_dim: int):
    ks = jax.random.split(key, 6 + cfg.n_layers)
    h = cfg.hidden_dim
    blocks = []
    for i in range(cfg.n_layers):
        bk = jax.random.split(ks[6 + i], 2)
        blocks.append(
            {
                "l1": _lin(bk[0], h, h),
                "ln1": _ln_p(h),
                "l2": _lin(bk[1], h, h),
                "ln2": _ln_p(h),
            }
        )
    return {
        "time_lin": _lin(ks[0], 64, h),
        "cond_lin": _lin(ks[1], condition_dim, h),
        "cond_ln": _ln_p(h),
        "in_lin": _lin(ks[2], cfg.embedding_dim, h),
        "in_ln": _ln_p(h),
        "res_blocks": blocks,
        "out_lin1": _lin(ks[3], h, h),
        "out_ln": _ln_p(h),
        "out_lin2": _lin(ks[4], h, cfg.embedding_dim),
    }


def apply_velocity(
    params,
    cfg: RFConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,  # (B, 1)
    conditions: jnp.ndarray,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    user_prior: Optional[jnp.ndarray] = None,
    x_1: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    def drop(k, z):
        if not train or dropout_key is None or cfg.dropout <= 0:
            return z
        keep = jax.random.bernoulli(k, 1.0 - cfg.dropout, z.shape)
        return jnp.where(keep, z / (1.0 - cfg.dropout), 0.0)

    dk = jax.random.split(dropout_key, 4 + cfg.n_layers) if dropout_key is not None else [None] * (4 + cfg.n_layers)
    t_emb = drop(dk[0], jax.nn.silu(_ap(params["time_lin"], sinusoidal_time_embedding(t))))
    cond = drop(dk[1], jax.nn.silu(_ln(_ap(params["cond_lin"], conditions), params["cond_ln"])))
    hcur = drop(dk[2], jax.nn.silu(_ln(_ap(params["in_lin"], x), params["in_ln"])))
    hcur = hcur + t_emb + cond
    for i, b in enumerate(params["res_blocks"]):
        inner = _ln(_ap(b["l1"], hcur), b["ln1"])
        inner = drop(dk[3 + i], jax.nn.silu(inner))
        inner = _ln(_ap(b["l2"], inner), b["ln2"])
        hcur = jax.nn.silu(inner + hcur)
    out = jax.nn.silu(_ln(_ap(params["out_lin1"], hcur), params["out_ln"]))
    out = drop(dk[3 + cfg.n_layers], out)
    v = _ap(params["out_lin2"], out)

    if train:
        if user_prior is not None:
            lam1 = (1.0 - t) ** cfg.guidance_decay_power
            v = v + lam1 * cfg.user_guidance_scale * user_prior
        if x_1 is not None:
            lam2 = (1.0 - t) ** cfg.cosine_decay_power
            v = v + lam2 * cfg.cosine_guidance_scale * cosine_similarity_gradient(x, x_1)
    return v


# ----------------------------------------------------------------------
def rf_losses(
    params,
    cfg: RFConfig,
    key: jax.Array,
    target_embeds: jnp.ndarray,  # (N, d), already stop_gradient'ed by caller
    conditions: jnp.ndarray,  # (N, cond_dim), stop_gradient'ed
    user_prior: Optional[jnp.ndarray],
    batch_users: jnp.ndarray,
    batch_pos_items: jnp.ndarray,
    batch_weight: jnp.ndarray,
    fixed_noise: Optional[jnp.ndarray] = None,
):
    """(total, rf_loss, cl_loss) — reference compute_loss_and_step math."""
    k_noise, k_t, k_drop, k_neg = jax.random.split(key, 4)
    X1 = target_embeds
    X0 = fixed_noise if fixed_noise is not None else jax.random.normal(k_noise, X1.shape)
    t = jax.random.uniform(k_t, (X1.shape[0], 1))
    X_t = t * X1 + (1.0 - t) * X0
    v_pred = apply_velocity(
        params, cfg, X_t, t, conditions, train=True, dropout_key=k_drop,
        user_prior=user_prior, x_1=X1,
    )
    rf_loss = ((v_pred - (X1 - X0)) ** 2).mean()

    pred_x1 = X_t + (1.0 - t) * v_pred
    n_u = cfg.n_users
    cl = _infonce_sampled(
        pred_x1[n_u:], X1[n_u:], batch_pos_items, cfg, k_neg, batch_weight
    ) + _infonce_sampled(
        pred_x1[:n_u], X1[:n_u], batch_users, cfg, jax.random.fold_in(k_neg, 1), batch_weight
    )
    total = rf_loss + cfg.contrast_weight * cl
    return total, rf_loss, cl


def _infonce_sampled(rf_embeds, target_embeds, pos_indices, cfg: RFConfig, key, weights):
    """Sampled-negative InfoNCE (rf_modules.py:718-778)."""
    N = target_embeds.shape[0]
    B = pos_indices.shape[0]
    n_neg = min(cfg.infonce_negative_samples, max(N - 1, 1))
    l2n = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    rf_pos = l2n(rf_embeds[pos_indices])
    tgt_pos = l2n(target_embeds[pos_indices])
    pos_score = jnp.exp((rf_pos * tgt_pos).sum(-1) / cfg.contrast_temp)
    neg_idx = jax.random.randint(key, (B, n_neg), 0, N)
    neg_idx = jnp.where(neg_idx == pos_indices[:, None], (neg_idx + 1) % N, neg_idx)
    tgt_neg = l2n(target_embeds[neg_idx])  # (B, n_neg, d)
    neg_scores = jnp.exp(
        jnp.einsum("bd,bnd->bn", rf_pos, tgt_neg) / cfg.contrast_temp
    )
    per = -jnp.log(pos_score / (pos_score + neg_scores.sum(1)))
    return (per * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def generate(
    params,
    cfg: RFConfig,
    key: jax.Array,
    conditions: jnp.ndarray,
    n_steps: Optional[int] = None,
    start_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Euler ODE from noise to embeddings (eval mode, no guidance)."""
    n_steps = n_steps or cfg.sampling_steps
    B = conditions.shape[0]
    z = (
        start_noise
        if start_noise is not None
        else jax.random.normal(key, (B, cfg.embedding_dim))
    )
    dt = 1.0 / n_steps

    def body(z, i):
        t = jnp.full((B, 1), i * dt)
        v = apply_velocity(params, cfg, z, t, conditions, train=False)
        return z + v * dt, None

    z, _ = jax.lax.scan(jax.checkpoint(body), z, jnp.arange(n_steps))
    return z


def prepare_reflow(params, cfg: RFConfig, key: jax.Array, conditions: jnp.ndarray):
    """(z0, z1) reflow pair from the current 1-RF model."""
    k0, k1 = jax.random.split(key)
    z0 = jax.random.normal(k0, (conditions.shape[0], cfg.embedding_dim))
    z1 = generate(params, cfg, k1, conditions, start_noise=z0)
    return z0, jax.lax.stop_gradient(z1)


def generate_staged(
    params, cfg: RFConfig, key: jax.Array, conditions, epoch, start_noise=None
):
    """Euler-ODE generation with the 2-RF stage switch: after the reflow
    transition the straightened field samples in ONE step (the reference's
    claimed 100x inference speedup, docs/RFMREC_README.md:303-306)."""
    if not cfg.use_2rf:
        return generate(params, cfg, key, conditions, start_noise=start_noise)
    return jax.lax.cond(
        jnp.asarray(epoch) >= cfg.rf_2rf_transition_epoch,
        lambda k: generate(params, cfg, k, conditions, n_steps=1, start_noise=start_noise),
        lambda k: generate(params, cfg, k, conditions, start_noise=start_noise),
        key,
    )


def rf_losses_staged(
    params,
    cfg: RFConfig,
    key: jax.Array,
    epoch,
    target_embeds: jnp.ndarray,
    conditions: jnp.ndarray,
    user_prior,
    batch_users,
    batch_pos_items,
    batch_weight,
    fixed_noise=None,
):
    """1-RF → 2-RF staged training (reference ``set_epoch`` transition,
    rf_modules.py:613-628): before ``rf_2rf_transition_epoch`` train the
    straight path noise→target; after it, train on (z0, generate(z0))
    reflow pairs from the frozen current model — straighter paths enabling
    1-step sampling. ``epoch`` is traced (rides in model state)."""
    if not cfg.use_2rf:
        return rf_losses(
            params, cfg, key, target_embeds, conditions, user_prior,
            batch_users, batch_pos_items, batch_weight, fixed_noise=fixed_noise,
        )

    def stage1(k):
        return rf_losses(
            params, cfg, k, target_embeds, conditions, user_prior,
            batch_users, batch_pos_items, batch_weight, fixed_noise=fixed_noise,
        )

    def stage2(k):
        k_pair, k_loss = jax.random.split(k)
        frozen = jax.lax.stop_gradient(params)
        z0, z1 = prepare_reflow(frozen, cfg, k_pair, conditions)
        return rf_losses(
            params, cfg, k_loss, z1, conditions, user_prior,
            batch_users, batch_pos_items, batch_weight, fixed_noise=z0,
        )

    return jax.lax.cond(
        jnp.asarray(epoch) >= cfg.rf_2rf_transition_epoch, stage2, stage1, key
    )


def mix_embeddings(
    cfg: RFConfig,
    original: jnp.ndarray,
    generated: Optional[jnp.ndarray],
    training: bool,
    epoch: int,
) -> jnp.ndarray:
    """Originals during warmup/training; orig + ratio·gen at inference."""
    if training or generated is None or epoch < cfg.warmup_epochs:
        return original
    return original + cfg.inference_mix_ratio * generated


# ----------------------------------------------------------------------
# Causal denoising (IPW), rf_modules.py:81-294
def init_causal_denoiser(key, embedding_dim: int, n_layers: int = 2):
    from genmmrec_tpu.common.init import xavier_normal

    ks = jax.random.split(key, n_layers)
    return {
        "alpha": jnp.asarray(1.0, dtype=jnp.float32),  # explicit: weak types retrace
        "beta": jnp.asarray(0.0, dtype=jnp.float32),
        "denoise_W": [
            {"w": xavier_normal(ks[i], (embedding_dim, embedding_dim)), "b": jnp.zeros((embedding_dim,))}
            for i in range(n_layers)
        ],
    }


def causal_denoise(
    params,
    ego_embeddings: jnp.ndarray,
    users: jnp.ndarray,  # (E,) interaction user ids
    items: jnp.ndarray,  # (E,)
    treatments: jnp.ndarray,  # (E,) 0/1 clean labels
    n_users: int,
    n_items: int,
):
    """IPW-weighted GCN denoising. Returns (denoised_emb, ps_loss)."""
    l2n = lambda x: x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    u_emb = l2n(ego_embeddings[:n_users])
    i_emb = l2n(ego_embeddings[n_users:])
    sim = (u_emb[users] * i_emb[items]).sum(1)
    e_scores = jax.nn.sigmoid(params["alpha"] * sim + params["beta"])
    e_c = jnp.clip(e_scores, 1e-7, 1 - 1e-7)
    ps_loss = -(
        treatments * jnp.log(e_c) + (1 - treatments) * jnp.log(1 - e_c)
    ).mean()

    ipw = treatments / (jax.lax.stop_gradient(e_scores) + 1e-8)
    N = n_users + n_items
    rows = jnp.concatenate([users, items + n_users])
    cols = jnp.concatenate([items + n_users, users])
    w2 = jnp.concatenate([ipw, ipw])
    deg = jax.ops.segment_sum(w2, rows, num_segments=N) + 1e-8
    d_inv_sqrt = deg**-0.5

    x = ego_embeddings
    acc = x
    for layer in params["denoise_W"]:
        msg = jax.ops.segment_sum(w2[:, None] * x[cols], rows, num_segments=N)
        msg = d_inv_sqrt[:, None] * msg
        x = jax.nn.relu(msg @ layer["w"].T + layer["b"])
        acc = acc + x
    denoised = acc / (len(params["denoise_W"]) + 1)
    return denoised, ps_loss
