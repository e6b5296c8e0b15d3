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


def exp_denominator_streamed(
    p1: jnp.ndarray,
    e2: jnp.ndarray,
    temperature: float,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Full-table InfoNCE denominator ``Σ_j exp(p1 · e2[j] / T)`` streamed
    over row-chunks of ``e2``.

    The reference DiffMM contrastLoss (`src/models/diffmm.py:251-258`)
    materializes the (B, N) logits in one shot — fine at baby scale, but at
    elec scale (N = 192k users) that is ~1.6 GB per call with six calls per
    batch. Streaming bounds peak memory at O(B·chunk); ``jax.checkpoint``
    on the chunk body rematerializes each chunk's logits in the backward
    pass, so an epoch-scan step stores only the (B,) accumulator between
    chunks. Differs from the one-shot form only by summation order.
    """
    n, d = e2.shape
    k = -(-n // chunk)
    pad = k * chunk - n
    e2p = jnp.pad(e2, ((0, pad), (0, 0))) if pad else e2
    chunks = e2p.reshape(k, chunk, d)
    valid = (jnp.arange(k * chunk) < n).reshape(k, chunk)

    @jax.checkpoint
    def body(carry, xs):
        c, m = xs
        part = jnp.exp(p1 @ c.T / temperature) * m[None, :]
        return carry + part.sum(-1), None

    deno, _ = jax.lax.scan(
        body, jnp.zeros(p1.shape[0], p1.dtype), (chunks, valid)
    )
    return deno


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
