"""Denoiser MLP with sinusoidal time embedding.

Parity with the reference ``DNN`` (`src/models/diffrec.py:16-105`): time
embedding → linear emb layer, input = concat(x, emb), tanh in/out towers,
manual normal(0, √(2/(fan_in+fan_out))) weight init with normal(0, 1e-3)
biases (`diffrec.py:45-73`).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _denoiser_linear(key, d_in, d_out):
    kw, kb = jax.random.split(key)
    std = math.sqrt(2.0 / (d_in + d_out))
    return {
        "w": jax.random.normal(kw, (d_out, d_in)) * std,
        "b": jax.random.normal(kb, (d_out,)) * 0.001,
    }


def init_dnn(key, in_dims: Sequence[int], out_dims: Sequence[int], emb_size: int):
    assert out_dims[0] == in_dims[-1], "In and out dimensions must equal to each other."
    n_in = len(in_dims) - 1
    n_out = len(out_dims) - 1
    keys = jax.random.split(key, n_in + n_out + 1)
    in_dims_temp = [in_dims[0] + emb_size] + list(in_dims[1:])
    return {
        "emb_layer": _denoiser_linear(keys[0], emb_size, emb_size),
        "in_layers": [
            _denoiser_linear(keys[1 + i], in_dims_temp[i], in_dims_temp[i + 1])
            for i in range(n_in)
        ],
        "out_layers": [
            _denoiser_linear(keys[1 + n_in + i], out_dims[i], out_dims[i + 1])
            for i in range(n_out)
        ],
    }


def apply_dnn(
    params,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    dropout: float = 0.0,
    key=None,
    norm: bool = False,
) -> jnp.ndarray:
    emb_size = params["emb_layer"]["w"].shape[1]
    emb = timestep_embedding(t, emb_size) @ params["emb_layer"]["w"].T + params["emb_layer"]["b"]
    if norm:
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    if dropout > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    h = jnp.concatenate([x, emb], axis=-1)
    for layer in params["in_layers"]:
        h = jnp.tanh(h @ layer["w"].T + layer["b"])
    n_out = len(params["out_layers"])
    for i, layer in enumerate(params["out_layers"]):
        h = h @ layer["w"].T + layer["b"]
        if i != n_out - 1:
            h = jnp.tanh(h)
    return h
