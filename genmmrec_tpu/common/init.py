"""Parameter initializers matching the reference's torch initializations
(`src/common/init.py:8-43` and per-model manual inits)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ semantics: std = sqrt(2/(fan_in+fan_out))
    with fan_in/fan_out the trailing/leading dims of a 2-D weight."""
    fan_out, fan_in = shape[0], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * std


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def normal_init(key, shape, std=0.1, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def kaiming_uniform_default(key, shape, dtype=jnp.float32):
    """torch nn.Linear's DEFAULT weight init: kaiming_uniform_(a=sqrt(5)),
    which reduces to U(+-1/sqrt(fan_in)). Reference models that never re-init
    a layer (e.g. the whole MultiScaleVelocityNet in rfmrec.py) get this."""
    fan_in = shape[-1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_params(
    key, in_dim, out_dim, init=xavier_normal, bias=True, dtype=jnp.float32,
    zero_bias=False,
):
    """(W, b) for a dense layer; W stored (out, in) to match torch layout and
    the xavier fan computation, applied as x @ W.T + b.

    Bias follows torch's nn.Linear DEFAULT — uniform(±1/sqrt(fan_in)) — which
    the reference models inherit whenever they re-init only the weight
    (`nn.init.xavier_*(layer.weight)` leaves the bias at default). This is
    load-bearing: at init the head biases create a shared, degree-correlated
    item prior through the graph towers (a popularity-like signal), and the
    reference's early-epoch validation transients (SLMRec epoch-1 spike)
    come from exactly that term. Pass zero_bias=True for reference layers
    that explicitly zero their bias."""
    kw, kb = jax.random.split(key)
    W = init(kw, (out_dim, in_dim))
    if not bias:
        return {"w": W}
    if zero_bias or in_dim == 0:
        return {"w": W, "b": jnp.zeros((out_dim,), dtype)}
    bound = 1.0 / math.sqrt(in_dim)
    b = jax.random.uniform(kb, (out_dim,), dtype, minval=-bound, maxval=bound)
    return {"w": W, "b": b}


def apply_linear(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y
