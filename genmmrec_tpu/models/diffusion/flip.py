"""Binary flip ("interest") diffusion for GenRec-V1.

Parity with reference ``FlipInterestDiffusion``
(`src/models/genrecv1.py:460-648`):
- sparsity-adaptive flip schedules (`_auto_schedule_params`/``get_cum``,
  :483-498): γ (0→1 flips) and ε (1→0 flips) linear schedules with
  cumulative products;
- Bernoulli forward corruption ``q_sample`` (:512-526) using uniform noise
  through a temperature-scaled sigmoid;
- Bayesian posterior reverse sampling ``p_sample`` (:528-548): model
  predicts interest probs; with the Bayesian schedule the next state mixes
  the model posterior with the previous-step flip probabilities;
- losses (:550-606): pos-weighted BCE (+ focal variant), curriculum-weighted
  KL to the true flip posterior, and modality-consistency InfoNCE between
  original and generated interaction embeddings.

TPU-native: reverse loop is a ``lax.scan``; all randomness key-threaded.
The cumulative schedules are recomputed from ``x_start`` wherever the
reference reads back ``self.alpha_bar*`` side state.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def flip_schedules(x_start: jnp.ndarray, steps: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gamma_cum, epsilon_cum) from batch sparsity (genrecv1.py:483-498)."""
    sparsity = (x_start == 0).mean()
    gamma_start = 0.1 * (1.0 - sparsity) + 0.001
    gamma_end = gamma_start * 0.1
    epsilon_start = 0.005 * sparsity + 0.0001
    epsilon_end = epsilon_start * 0.1
    lin = jnp.linspace(0.0, 1.0, steps)
    gamma = gamma_start + (gamma_end - gamma_start) * lin
    epsilon = jnp.clip(epsilon_start + (epsilon_end - epsilon_start) * lin, max=0.01)
    gamma_cum = 1.0 - jnp.cumprod(1.0 - gamma)
    epsilon_cum = 1.0 - jnp.cumprod(1.0 - epsilon)
    return gamma_cum, epsilon_cum


def q_sample(
    key: jax.Array,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    steps: int,
    base_temp: float = 1.0,
) -> jnp.ndarray:
    """Bernoulli flip corruption (genrecv1.py:512-526)."""
    k_noise, k_flip = jax.random.split(key)
    gamma_cum, epsilon_cum = flip_schedules(x_start, steps)
    a0 = gamma_cum[t][:, None]
    a1 = epsilon_cum[t][:, None]
    noise = jax.random.uniform(k_noise, x_start.shape)
    flip_prob = jnp.where(
        x_start == 0,
        jax.nn.sigmoid((a0 - noise) * base_temp),
        jax.nn.sigmoid((a1 - noise) * base_temp),
    )
    flip = jax.random.bernoulli(k_flip, flip_prob)
    return jnp.where(flip, 1.0 - x_start, x_start)


def p_sample(
    key: jax.Array,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_start: jnp.ndarray,
    steps: int,
    q_steps: int,
    base_temp: float = 1.0,
    bayesian: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse flip sampling; returns (x_0 sample, final probs)."""
    B = x_start.shape[0]
    k_init, k_loop = jax.random.split(key)
    gamma_cum, epsilon_cum = flip_schedules(x_start, steps)

    if q_steps == 0:
        x_t = x_start
    else:
        t0 = jnp.full((B,), q_steps - 1, jnp.int32)
        x_t = q_sample(k_init, x_start, t0, steps, base_temp)

    def body(carry, inp):
        x, _ = carry
        i, k = inp
        t = jnp.full((B,), i, jnp.int32)
        logits = denoise_fn(x, t)
        probs = jax.nn.sigmoid(logits)

        def bayes(_):
            prev_a0 = gamma_cum[jnp.maximum(i - 1, 0)]
            prev_a1 = epsilon_cum[jnp.maximum(i - 1, 0)]
            p0 = probs * (1.0 - prev_a0) + (1.0 - probs) * prev_a1
            p1 = probs * prev_a0 + (1.0 - probs) * (1.0 - prev_a1)
            return p1 / (p0 + p1)

        p = jax.lax.cond(
            jnp.logical_and(bayesian, i > 0), bayes, lambda _: probs, None
        )
        x_next = jax.random.bernoulli(k, p).astype(x.dtype)
        return (x_next, probs), None

    steps_rev = jnp.arange(steps - 1, -1, -1)
    keys = jax.random.split(k_loop, steps)
    (x_t, probs), _ = jax.lax.scan(body, (x_t, jnp.zeros_like(x_t)), (steps_rev, keys))
    return x_t, probs


def true_posterior(
    x0: jnp.ndarray, t: jnp.ndarray, gamma_cum: jnp.ndarray, epsilon_cum: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    a0 = gamma_cum[t][:, None]
    a1 = epsilon_cum[t][:, None]
    is0 = (x0 == 0).astype(jnp.float32)
    is1 = (x0 == 1).astype(jnp.float32)
    numerator = is0 * (1.0 - a0) + is1 * a1
    denominator = is0 * (1.0 - a0 + a1) + is1 * (a0 + 1.0 - a1)
    return numerator / (denominator + eps)


def kl_to_posterior(x0, t, probs, steps, eps=1e-8):
    """Curriculum-weighted KL term (genrecv1.py:595-616)."""
    gamma_cum, epsilon_cum = flip_schedules(x0, steps)
    post = jax.lax.stop_gradient(
        jnp.clip(true_posterior(x0, t, gamma_cum, epsilon_cum), eps, 1 - eps)
    )
    p = jnp.clip(jax.lax.stop_gradient(probs), eps, 1 - eps)
    kl = post * (jnp.log(post + 1e-10) - jnp.log(p + 1e-10))
    kl += (1 - post) * (jnp.log(1 - post + 1e-10) - jnp.log(1 - p + 1e-10))
    return kl.mean(axis=1)


def infonce_rows(view1, view2, temperature):
    v1 = view1 / jnp.maximum(jnp.linalg.norm(view1, axis=1, keepdims=True), 1e-12)
    v2 = view2 / jnp.maximum(jnp.linalg.norm(view2, axis=1, keepdims=True), 1e-12)
    pos = jnp.exp((v1 * v2).sum(-1) / temperature)
    neg = jnp.exp(v1 @ v2.T / temperature).sum(1)
    return -jnp.log(pos / neg).mean()
