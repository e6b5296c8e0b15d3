#!/usr/bin/env python
"""Round 2 of the top-k investigation at the elec eval chunk shape.

Findings from round 1 looked contradictory (standalone f32 top_k 0.04 ms —
physically impossible for a 1 GB read — but jit(top_k(gemm)) 50 ms). Here
every timing uses BATCHED distinct inputs and also tests:
  - optimization_barrier between GEMM and top_k (forces materialization,
    may switch XLA to its fast TopK custom-call path)
  - bf16 GEMM with f32 upcast before top_k (XLA TopK has no bf16 fast path)
  - approx_max_k (TPU PartialReduce) exact-recall configuration
"""
import time

import jax
import jax.numpy as jnp

B, I, D, K = 4096, 63001, 64, 50
N_IN = 4  # distinct inputs cycled to defeat any caching


def timeit(f, args_list, iters=8):
    for a in args_list:
        jax.block_until_ready(f(*a))
    t0 = time.time()
    for i in range(iters):
        out = f(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    Us, Vs, Ss = [], [], []
    for i in range(N_IN):
        k1, k2, key = jax.random.split(key, 3)
        U = jax.random.normal(k1, (B, D), jnp.float32)
        V = jax.random.normal(k2, (I, D), jnp.float32)
        Us.append(U); Vs.append(V); Ss.append((U @ V.T).block_until_ready())

    t = timeit(jax.jit(lambda u, v: u @ v.T), list(zip(Us, Vs)))
    print(f"gemm f32                          {t*1e3:8.2f} ms")

    t = timeit(jax.jit(lambda s: jax.lax.top_k(s, K)), [(s,) for s in Ss])
    print(f"top_k f32 (materialized, fresh)   {t*1e3:8.2f} ms")

    t = timeit(jax.jit(lambda u, v: jax.lax.top_k(u @ v.T, K)), list(zip(Us, Vs)))
    print(f"fused gemm+top_k                  {t*1e3:8.2f} ms")

    def barrier_pipe(u, v):
        s = u @ v.T
        s = jax.lax.optimization_barrier(s)
        return jax.lax.top_k(s, K)

    t = timeit(jax.jit(barrier_pipe), list(zip(Us, Vs)))
    print(f"gemm -> barrier -> top_k          {t*1e3:8.2f} ms")

    def mask_pipe(u, v):
        s = u @ v.T
        s = jnp.where(jnp.arange(I) % 97 == 3, -1e10, s)  # mask-like op
        s = jax.lax.optimization_barrier(s)
        return jax.lax.top_k(s, K)

    t = timeit(jax.jit(mask_pipe), list(zip(Us, Vs)))
    print(f"gemm -> mask -> barrier -> top_k  {t*1e3:8.2f} ms")

    # bf16 scoring with f32 top_k
    Ub = [u.astype(jnp.bfloat16) for u in Us]
    Vb = [v.astype(jnp.bfloat16) for v in Vs]

    def bf16_pipe(u, v):
        s = (u @ v.T).astype(jnp.float32)
        s = jax.lax.optimization_barrier(s)
        return jax.lax.top_k(s, K)

    t = timeit(jax.jit(bf16_pipe), list(zip(Ub, Vb)))
    print(f"bf16 gemm -> f32 barrier -> top_k {t*1e3:8.2f} ms")

    try:
        t = timeit(
            jax.jit(lambda s: jax.lax.approx_max_k(s, K, recall_target=0.99)),
            [(s,) for s in Ss],
        )
        print(f"approx_max_k f32 (rt=0.99)        {t*1e3:8.2f} ms")
    except Exception as e:
        print("approx_max_k failed:", e)

    # correctness of the barrier pipeline
    v1, i1 = jax.jit(lambda u, v: jax.lax.top_k(u @ v.T, K))(Us[0], Vs[0])
    v2, i2 = jax.jit(barrier_pipe)(Us[0], Vs[0])
    assert jnp.allclose(v1, v2) and (i1 == i2).all()
    print("barrier pipeline exact: OK")


if __name__ == "__main__":
    main()
