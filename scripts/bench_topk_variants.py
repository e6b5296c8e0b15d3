#!/usr/bin/env python
"""Where does elec-scale full-sort eval time actually go, and does a
hierarchical (grouped) exact top-k beat XLA's monolithic lax.top_k?

Stages measured separately at the elec chunk shape (B=4096 users x
I=63,001 items, d=64): GEMM, mask, top_k monolithic, top_k hierarchical
(per-group exact top-k then merge — exact because every global top-k
element is in its group's local top-k), and the fused end-to-end pipelines.
"""
import time

import jax
import jax.numpy as jnp

B, I, D, K = 4096, 63001, 64, 50


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def hier_topk(scores, k, groups):
    Bx, Ix = scores.shape
    pad = -(-Ix // groups) * groups - Ix
    s = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    g = s.reshape(Bx, groups, -1)
    vals, idx = jax.lax.top_k(g, k)                    # (B, G, k) local
    base = (jnp.arange(groups) * g.shape[-1])[None, :, None]
    idx = idx + base
    vals = vals.reshape(Bx, groups * k)
    idx = idx.reshape(Bx, groups * k)
    v2, i2 = jax.lax.top_k(vals, k)                    # (B, k) over candidates
    return v2, jnp.take_along_axis(idx, i2, axis=1)


def main():
    ku, ki = jax.random.split(jax.random.PRNGKey(0))
    for dtype in (jnp.float32, jnp.bfloat16):
        U = jax.random.normal(ku, (B, D), dtype)
        V = jax.random.normal(ki, (I, D), dtype)
        scores = (U @ V.T).astype(dtype)
        name = dtype.__name__

        t_gemm = timeit(jax.jit(lambda u, v: u @ v.T), U, V)
        t_topk = timeit(jax.jit(lambda s: jax.lax.top_k(s, K)), scores)
        print(f"[{name}] gemm {t_gemm*1e3:8.2f} ms   top_k(mono) {t_topk*1e3:8.2f} ms", flush=True)
        for G in (8, 16, 32, 64):
            t_h = timeit(jax.jit(lambda s: hier_topk(s, K, G)), scores)
            print(f"[{name}]   top_k(hier G={G:<3d}) {t_h*1e3:8.2f} ms", flush=True)
        # correctness: hierarchical == monolithic values
        v_m, _ = jax.lax.top_k(scores.astype(jnp.float32), K)
        v_h, _ = hier_topk(scores.astype(jnp.float32), K, 32)
        assert jnp.allclose(v_m, v_h), "hierarchical top-k mismatch"

        t_pipe_m = timeit(jax.jit(lambda u, v: jax.lax.top_k(u @ v.T, K)), U, V)
        t_pipe_h = timeit(jax.jit(lambda u, v: hier_topk(u @ v.T, K, 32)), U, V)
        print(f"[{name}] pipeline mono {t_pipe_m*1e3:8.2f} ms   hier(32) {t_pipe_h*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
