"""Importance-sampled timestep selection with an Lt loss-history buffer.

Parity with the reference (`src/models/diffrec.py:234-288`): until every
timestep has ``history_num_per_term`` recorded losses, sample uniformly;
afterwards sample t ∝ sqrt(E[L_t²]) with an ``uniform_prob`` floor, and
divide the loss by the (normalized) proposal probability.

TPU-native: the reference mutates the history in a per-sample Python loop
(`diffrec.py:279-286`); here the buffer lives in the model ``state`` pytree
and is updated with one segment-scatter per batch inside the jitted epoch
scan (ring-buffer semantics approximated by slot = count % H once full; the
reference shifts left — both keep the most recent H values per timestep).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_lt_state(steps: int, history_num_per_term: int = 10):
    return {
        "Lt_history": jnp.zeros((steps, history_num_per_term), jnp.float32),
        "Lt_count": jnp.zeros((steps,), jnp.int32),
    }


def sample_timesteps(
    key: jax.Array,
    lt_state,
    batch_size: int,
    method: str = "uniform",
    uniform_prob: float = 0.001,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    steps, H = lt_state["Lt_history"].shape
    if method != "importance":
        t = jax.random.randint(key, (batch_size,), 0, steps)
        return t, jnp.ones((batch_size,), jnp.float32)

    ready = jnp.all(lt_state["Lt_count"] == H)
    Lt_sqrt = jnp.sqrt(jnp.mean(lt_state["Lt_history"] ** 2, axis=-1))
    pt_imp = Lt_sqrt / jnp.maximum(Lt_sqrt.sum(), 1e-12)
    pt_imp = pt_imp * (1.0 - uniform_prob) + uniform_prob / steps
    pt_uniform = jnp.full((steps,), 1.0 / steps)
    pt_all = jnp.where(ready, pt_imp, pt_uniform)
    t = jax.random.categorical(key, jnp.log(pt_all), shape=(batch_size,))
    # pt normalized so uniform gives weight 1 (reference multiplies by len)
    pt = jnp.where(ready, pt_all[t] * steps, 1.0)
    return t, pt


def update_lt_state(lt_state, t: jnp.ndarray, losses: jnp.ndarray, weights=None):
    """Record per-sample losses into each timestep's ring buffer.

    Batches may contain repeated timesteps; slots are assigned by the
    within-batch occurrence index so every sample lands in a distinct slot.
    Rows with weight 0 (padding) are dropped via an out-of-range scatter.
    """
    hist, count = lt_state["Lt_history"], lt_state["Lt_count"]
    steps, H = hist.shape
    B = t.shape[0]
    if weights is not None:
        t = jnp.where(weights > 0, t, steps)  # out-of-range -> dropped
    # occurrence index of each t within the batch (stable, O(B^2) compare —
    # B is the train batch, fine on VPU)
    eq = (t[:, None] == t[None, :]).astype(jnp.int32)
    occ = (jnp.tril(eq, -1)).sum(axis=1)  # how many earlier rows share t
    slot = (count[jnp.minimum(t, steps - 1)] + occ) % H
    new_hist = hist.at[t, slot].set(jax.lax.stop_gradient(losses), mode="drop")
    valid = (t < steps).astype(jnp.int32)
    per_t_added = jax.ops.segment_sum(valid, jnp.minimum(t, steps - 1), num_segments=steps)
    new_count = jnp.minimum(count + per_t_added, H)
    return {"Lt_history": new_hist, "Lt_count": new_count}
