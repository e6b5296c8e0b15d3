"""Shared-loss unit tests — the streamed InfoNCE denominator must be a
drop-in for the one-shot (B, N) form (reference DiffMM contrastLoss,
`src/models/diffmm.py:251-258`), forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.common.losses import exp_denominator_streamed


def _direct(p1, e2, temp):
    return jnp.exp(p1 @ e2.T / temp).sum(-1)


def test_streamed_denominator_matches_direct():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    p1 = jax.random.normal(k1, (37, 16))
    e2 = jax.random.normal(k2, (1000, 16))  # not a multiple of chunk
    temp = 0.5
    d_direct = _direct(p1, e2, temp)
    d_stream = exp_denominator_streamed(p1, e2, temp, chunk=128)
    np.testing.assert_allclose(
        np.asarray(d_stream), np.asarray(d_direct), rtol=1e-5
    )


def test_streamed_denominator_grads_match():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    p1 = jax.random.normal(k1, (8, 12))
    e2 = jax.random.normal(k2, (300, 12))
    temp = 0.2

    f_direct = lambda a, b: jnp.log(_direct(a, b, temp)).sum()
    f_stream = lambda a, b: jnp.log(
        exp_denominator_streamed(a, b, temp, chunk=64)
    ).sum()
    g1a, g1b = jax.grad(f_direct, argnums=(0, 1))(p1, e2)
    g2a, g2b = jax.grad(f_stream, argnums=(0, 1))(p1, e2)
    # summation order differs → accumulation noise ~1e-4 rel
    np.testing.assert_allclose(np.asarray(g2a), np.asarray(g1a), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(g2b), np.asarray(g1b), rtol=1e-3, atol=1e-6
    )


def test_streamed_denominator_under_jit_and_scan():
    """Shape of the epoch hot path: the streamed form inside a jitted scan
    (one step per 'batch'), padded e2 rows must contribute nothing."""
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    p1 = jax.random.normal(k1, (4, 8))
    e2 = jax.random.normal(k2, (130, 8))  # forces a ragged last chunk

    @jax.jit
    def run(p1, e2):
        def step(carry, _):
            return carry + exp_denominator_streamed(p1, e2, 1.0, chunk=64), None

        out, _ = jax.lax.scan(step, jnp.zeros(p1.shape[0]), None, length=3)
        return out

    np.testing.assert_allclose(
        np.asarray(run(p1, e2)),
        3 * np.asarray(_direct(p1, e2, 1.0)),
        rtol=1e-5,
    )
