#!/usr/bin/env python
"""Microbenchmark: where does elec full-sort eval time go?

Decomposes the per-chunk eval program — score GEMM, mask application, and
top-k — and compares top-k strategies at the real elec shape
(eval_batch=4096 users x 63001 items, d=64):

  1. lax.top_k on the full row (the current path)
  2. jax.lax.approx_max_k (TPU PartialReduce op) at several recall targets
  3. tiled exact two-stage: per-tile lax.top_k then merge
  4. approx_max_k oversampled + exact merge (exactness probe)

Each timed under one jit with block_until_ready, warm runs only. The bench
informs VERDICT r3 #3 (fullsort at 2.1% of HBM peak; bf16 only 1.07x f32 →
overhead-bound, suspicion: lax.top_k's sort network dominates).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, K = 4096, 63001, 64, 50


def timed(fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn_j(*args))
    return (time.time() - t0) / n, out


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)).astype(dtype)
    it = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)).astype(dtype)
    packed = jnp.asarray(
        rng.integers(0, 256, size=(B, (N + 7) // 8), dtype=np.uint8)
    )
    bpe = jnp.dtype(dtype).itemsize
    print(f"dtype={jnp.dtype(dtype).name}  scores bytes/chunk={B*N*bpe/2**30:.2f} GiB")

    t, scores = timed(lambda a, b: a @ b.T, u, it)
    print(f"gemm only:                 {t*1e3:8.1f} ms")

    def gemm_mask(a, b, m):
        s = a @ b.T
        bits = (m[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
        mask = bits.reshape(m.shape[0], -1)[:, :N] != 0
        return jnp.where(mask, jnp.asarray(-1e10, s.dtype), s)

    t, _ = timed(gemm_mask, u, it, packed)
    print(f"gemm + mask:               {t*1e3:8.1f} ms")

    t, ref = timed(lambda a, b, m: jax.lax.top_k(gemm_mask(a, b, m), K), u, it, packed)
    print(f"gemm + mask + lax.top_k:   {t*1e3:8.1f} ms")
    ref_i = np.asarray(ref[1])

    for rt in (0.9, 0.95, 0.99):
        t, out = timed(
            lambda a, b, m: jax.lax.approx_max_k(gemm_mask(a, b, m), K, recall_target=rt),
            u, it, packed,
        )
        hit = np.mean([
            len(np.intersect1d(ref_i[i], np.asarray(out[1])[i])) / K
            for i in range(0, B, 512)
        ])
        print(f"gemm + mask + approx(rt={rt}): {t*1e3:6.1f} ms  exact-overlap={hit:.4f}")

    # tiled exact: pad N to tiles of T, per-tile top_k, merge
    for T in (3938, 7876):  # 63001 padded to 16 / 8 tiles
        n_tiles = -(-N // T)
        n_pad = n_tiles * T

        def tiled(a, b, m, T=T, n_tiles=n_tiles, n_pad=n_pad):
            s = gemm_mask(a, b, m)
            s = jnp.pad(s, ((0, 0), (0, n_pad - N)), constant_values=-jnp.inf)
            st = s.reshape(B, n_tiles, T)
            v, i = jax.lax.top_k(st, K)  # per-tile
            base = (jnp.arange(n_tiles) * T)[None, :, None]
            v = v.reshape(B, n_tiles * K)
            i = (i + base).reshape(B, n_tiles * K)
            vm, pos = jax.lax.top_k(v, K)
            return vm, jnp.take_along_axis(i, pos, axis=1)

        t, out = timed(tiled, u, it, packed)
        same = np.mean(np.asarray(out[1]) == ref_i)
        print(f"tiled exact T={T}:          {t*1e3:8.1f} ms  match={same:.4f}")

    # grouped exact two-stage (ops/topk.py — the production candidate)
    from genmmrec_tpu.ops.topk import grouped_topk

    t, out = timed(lambda a, b, m: grouped_topk(gemm_mask(a, b, m), K), u, it, packed)
    same = np.mean(np.asarray(out[1]) == ref_i)
    print(f"gemm + mask + grouped_topk:{t*1e3:8.1f} ms  match={same:.4f}")

    # approx with oversampling + exact merge of survivors
    for mult in (4, 8):
        def over(a, b, m, mult=mult):
            s = gemm_mask(a, b, m)
            v, i = jax.lax.approx_max_k(s, K * mult, recall_target=0.95)
            vm, pos = jax.lax.top_k(v, K)
            return vm, jnp.take_along_axis(i, pos, axis=1)

        t, out = timed(over, u, it, packed)
        hit = np.mean([
            len(np.intersect1d(ref_i[i], np.asarray(out[1])[i])) / K
            for i in range(0, B, 512)
        ])
        print(f"approx x{mult} + merge:        {t*1e3:8.1f} ms  exact-overlap={hit:.4f}")


if __name__ == "__main__":
    main()
