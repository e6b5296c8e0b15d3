"""ModalDenoiseTransformer — GenRec-V1's flip-diffusion denoiser.

Parity with reference `src/models/genrecv1.py:650-710`: sinusoidal time
embedding → linear emb layer, input projection of [x ; time_emb] to
``dim_feedforward``, adaLN time modulation (shift/scale), a stack of
TransformerDecoder layers over a length-1 sequence with a zero memory, and
a GELU output head. Xavier-uniform weights with 0.01 biases.

TPU-native reduction: for sequence length 1 with post-LN torch semantics,
self-attention collapses to ``W_o(W_v h + b_v) + b_o`` (softmax over a
single key is 1) and cross-attention against a zero memory contributes only
the constant ``W_o2 b_v2 + b_o2``. The decoder stack is therefore an exact
closed form of dense layers + layer norms — no attention kernels needed,
and XLA fuses the whole denoiser into a few MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genmmrec_tpu.common.init import xavier_uniform
from genmmrec_tpu.models.diffusion.dnn import timestep_embedding


def _linear(key, d_in, d_out, bias=True):
    p = {"w": xavier_uniform(key, (d_out, d_in))}
    if bias:
        # explicit dtype: a weak-typed init would flip the optimizer-state
        # avals strong after one update and force a jit retrace
        p["b"] = jnp.full((d_out,), 0.01, dtype=jnp.float32)
    return p


def _apply(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def _layer_norm(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _ln_params(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def init_modal_denoise(
    key,
    in_dims: int,
    out_dims: int,
    emb_size: int,
    nhead: int = 8,
    num_layers: int = 6,
    dim_feedforward: int = 512,
):
    ks = jax.random.split(key, 6 + num_layers)
    d = dim_feedforward
    layers = []
    for li in range(num_layers):
        lk = jax.random.split(ks[6 + li], 8)
        layers.append(
            {
                # self-attn collapsed: out_proj(W_v h + b_v) + b_o
                "sa_v": _linear(lk[0], d, d),
                "sa_o": _linear(lk[1], d, d),
                "ln1": _ln_params(d),
                # cross-attn vs zero memory: constant out_proj(b_v2) + b_o2
                "ca_bv": jnp.full((d,), 0.01, dtype=jnp.float32),
                "ca_o": _linear(lk[2], d, d),
                "ln2": _ln_params(d),
                "ff1": _linear(lk[3], d, d),
                "ff2": _linear(lk[4], d, d),
                "ln3": _ln_params(d),
            }
        )
    return {
        "time_emb1": _linear(ks[0], emb_size, 4 * emb_size),
        "time_emb2": _linear(ks[1], 4 * emb_size, emb_size),
        "emb_layer": _linear(ks[2], emb_size, emb_size),
        "input_proj": _linear(ks[3], in_dims + emb_size, d),
        "adaLN": _linear(ks[4], emb_size, 2 * d),
        "out1": _linear(ks[5], d, d // 2),
        "out_ln": _ln_params(d // 2),
        "out2": _linear(jax.random.fold_in(ks[5], 1), d // 2, out_dims),
        "layers": layers,
    }


def apply_modal_denoise(params, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    emb_size = params["emb_layer"]["w"].shape[1]
    time_emb = timestep_embedding(t, emb_size)
    time_emb = _apply(params["emb_layer"], time_emb)

    h = _apply(params["input_proj"], jnp.concatenate([x, time_emb], axis=-1))
    mod = _apply(params["adaLN"], jax.nn.silu(time_emb))
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = h * (1.0 + scale) + shift

    for lp in params["layers"]:
        sa = _apply(lp["sa_o"], _apply(lp["sa_v"], h))
        h = _layer_norm(h + sa, lp["ln1"])
        ca = _apply(lp["ca_o"], lp["ca_bv"][None, :].repeat(h.shape[0], 0))
        h = _layer_norm(h + ca, lp["ln2"])
        ff = _apply(lp["ff2"], jax.nn.relu(_apply(lp["ff1"], h)))
        h = _layer_norm(h + ff, lp["ln3"])

    out = jax.nn.gelu(_layer_norm(_apply(params["out1"], h), params["out_ln"]))
    return _apply(params["out2"], out)
