"""Gaussian diffusion schedules and closed-form q distributions.

Shared by DiffRec/DiffMM/DDRM/MCDRec/CoDMR/LD4MRec — numerical parity with
the reference ``GaussianDiffusion`` (`src/models/diffrec.py:113-228`,
duplicated per-model in `diffmm.py:362-484`, `ddrm.py`, ...):
- linear and linear-var beta schedules computed in float64
  (`diffrec.py:140-152,390-396`), ``beta_fixed`` pins β₀=1e-5;
- cumulative-product α̅ tables and the DDPM posterior coefficients
  (`diffrec.py:154-180`).

TPU-native: tables are precomputed once on host in float64 then cast, and
every sampler indexes them with gathers inside ``lax.scan`` — no Python
loops over timesteps at runtime.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def betas_from_linear_variance(steps: int, variance: np.ndarray, max_beta: float = 0.999) -> np.ndarray:
    alpha_bar = 1.0 - variance
    betas = [1.0 - alpha_bar[0]]
    for i in range(1, steps):
        betas.append(min(1.0 - alpha_bar[i] / alpha_bar[i - 1], max_beta))
    return np.array(betas, dtype=np.float64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianSchedule:
    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    steps: int = dataclasses.field(metadata=dict(static=True))


def make_schedule(
    noise_schedule: str,
    noise_scale: float,
    noise_min: float,
    noise_max: float,
    steps: int,
    beta_fixed: bool = True,
    beta_fixed_value: float = 0.00001,
) -> GaussianSchedule:
    """``beta_fixed_value``: DiffRec pins β₀=1e-5 (`diffrec.py:133`);
    DiffMM's embedded GaussianDiffusion pins 1e-4 (`diffmm.py:374`)."""
    start = noise_scale * noise_min
    end = noise_scale * noise_max
    lin = np.linspace(start, end, steps, dtype=np.float64)
    if noise_schedule == "linear-var":
        betas = betas_from_linear_variance(steps, lin)
    else:  # "linear" and fallback
        betas = lin.copy()
    if beta_fixed:
        betas[0] = beta_fixed_value
    assert (betas > 0).all() and (betas <= 1).all(), "betas out of range"

    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_logvar = np.log(np.concatenate([[post_var[1]], post_var[1:]]))
    coef1 = betas * np.sqrt(acp_prev) / (1.0 - acp)
    coef2 = (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return GaussianSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(post_logvar),
        posterior_mean_coef1=f32(coef1),
        posterior_mean_coef2=f32(coef2),
        steps=steps,
    )


def _bcast(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """arr[t] broadcast to an ndim tensor (t is (B,))."""
    res = arr[t]
    return res.reshape(res.shape + (1,) * (ndim - 1))


def q_sample(sched: GaussianSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    return (
        _bcast(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean(sched: GaussianSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return (
        _bcast(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _bcast(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )


def snr(sched: GaussianSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """α̅_t / (1-α̅_t); t=-1 wraps to the last index (matching the
    reference's torch negative-index behavior in SNR(ts-1))."""
    acp = sched.alphas_cumprod[t]
    return acp / (1.0 - acp)
