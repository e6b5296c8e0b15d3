"""Shared loss functions.

Parity with reference ``src/common/loss.py:9-62`` (BPRLoss, EmbLoss, L2Loss),
expressed as pure functions with optional per-row weights so padded batch
rows contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _wmean(x: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weights is None:
        return x.mean()
    return (x * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def bpr_loss(
    pos_score: jnp.ndarray,
    neg_score: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    gamma: float = 1e-10,
) -> jnp.ndarray:
    """-log σ(pos − neg), averaged (reference BPRLoss, loss.py:9-35).

    ``gamma=0`` selects the numerically-stable log-sigmoid form (the
    reference's FREEDOM-style ``-logsigmoid(pos-neg)``).
    """
    diff = pos_score - neg_score
    if gamma == 0.0:
        return _wmean(-jax.nn.log_sigmoid(diff), weights)
    return _wmean(-jnp.log(gamma + jax.nn.sigmoid(diff)), weights)


def emb_loss(*embeddings: jnp.ndarray, norm: int = 2) -> jnp.ndarray:
    """Σ ‖E‖_p / batch, batch = rows of the last embedding (loss.py:38-51)."""
    batch = embeddings[-1].shape[0]
    total = sum(
        jnp.linalg.norm(e.reshape(-1), ord=norm) for e in embeddings
    )
    return total / batch


def l2_loss(*embeddings: jnp.ndarray) -> jnp.ndarray:
    return sum(0.5 * jnp.sum(e**2) for e in embeddings)


def infonce(
    view1: jnp.ndarray,
    view2: jnp.ndarray,
    temperature: float,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Row-aligned InfoNCE with in-batch negatives over normalized views.

    Equivalent to the chunked InfoNCE used across the reference models (e.g.
    `src/models/gume.py:294-348`) — on TPU the (B, B) logits matrix is a
    single MXU matmul, no host chunking needed.
    """
    v1 = view1 / jnp.maximum(jnp.linalg.norm(view1, axis=1, keepdims=True), 1e-12)
    v2 = view2 / jnp.maximum(jnp.linalg.norm(view2, axis=1, keepdims=True), 1e-12)
    logits = v1 @ v2.T / temperature
    pos = jnp.diagonal(logits)
    lse = jax.nn.logsumexp(logits, axis=1)
    return _wmean(lse - pos, weights)
