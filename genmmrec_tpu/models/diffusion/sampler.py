"""Reverse-diffusion sampling as ``lax.scan``.

Replaces the reference's Python loop over timesteps
(`src/models/diffrec.py:291-310`, `src/models/diffmm.py:408-426`): one scan
over precomputed schedule tables, denoiser fused by XLA.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from genmmrec_tpu.models.diffusion.schedule import (
    GaussianSchedule,
    q_posterior_mean,
    q_sample,
    _bcast,
)


def p_sample_loop(
    sched: GaussianSchedule,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_start: jnp.ndarray,
    q_steps: int,
    key: Optional[jax.Array] = None,
    sampling_noise: bool = False,
) -> jnp.ndarray:
    """DDPM reverse chain with x0-prediction denoiser.

    ``q_steps``: number of forward-noising steps applied to ``x_start``
    before reversing (0 = start directly from x_start, reference
    `diffrec.py:293-297`). The reverse loop always runs the full
    ``sched.steps`` chain, matching the reference.
    """
    B = x_start.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_loop = jax.random.split(key)

    if q_steps == 0:
        x_t = x_start
    else:
        t0 = jnp.full((B,), q_steps - 1, jnp.int32)
        x_t = q_sample(sched, x_start, t0, jax.random.normal(k_init, x_start.shape))

    def body(x, inp):
        i, k = inp
        t = jnp.full((B,), i, jnp.int32)
        pred_xstart = denoise_fn(x, t)
        mean = q_posterior_mean(sched, pred_xstart, x, t)
        if sampling_noise:
            noise = jax.random.normal(k, x.shape)
            nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
            logvar = _bcast(sched.posterior_log_variance_clipped, t, x.ndim)
            x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        else:
            x = mean
        return x, None

    steps_rev = jnp.arange(sched.steps - 1, -1, -1)
    keys = jax.random.split(k_loop, sched.steps)
    x_t, _ = jax.lax.scan(body, x_t, (steps_rev, keys))
    return x_t
