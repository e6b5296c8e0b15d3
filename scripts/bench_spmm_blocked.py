#!/usr/bin/env python
"""Validate + roofline the row-blocked Pallas segment-sum on the real chip
at elec-scale graph geometry (255k nodes, 3.4M+ symmetrized edges).

Reports effective HBM bytes/s for: XLA sorted-scatter fallback, the blocked
Pallas kernel (forward), and the symmetric forward+backward pair. Bytes are
the kernel's unavoidable traffic: gathered rows nnz*d (read x + write-read
of the gathered product is fused), output n*d, indices nnz*8.

Usage: python scripts/bench_spmm_blocked.py [--n-users 192403 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-users", type=int, default=192403)
    ap.add_argument("--n-items", type=int, default=63001)
    ap.add_argument("--n-edges", type=int, default=1_690_000)
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm

    rng = np.random.default_rng(0)
    # power-law-ish degree mix like real elec
    users = rng.integers(0, args.n_users, args.n_edges)
    items = rng.integers(0, args.n_items, args.n_edges)
    g = bipartite_norm_adj(users, items, args.n_users, args.n_items)
    print(f"graph: N={g.n_rows} nnz={g.nnz} span={g.pallas_span} "
          f"plan={'None' if g.pallas_plan is None else g.pallas_plan[:4]}")

    N, d = g.n_rows, args.d
    x = jax.random.normal(jax.random.PRNGKey(0), (N, d))
    import dataclasses

    g_xla = dataclasses.replace(g, pallas_span=0, pallas_plan=None)

    def timeit(f, *a, n=10):
        f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.time() - t0) / n

    f_xla = jax.jit(lambda x: spmm(g_xla, x))
    f_pal = jax.jit(lambda x: spmm(g, x))

    # correctness on-chip
    ref = f_xla(x)
    out = f_pal(x)
    err = float(jnp.abs(out - ref).max())
    rel = err / max(1e-9, float(jnp.abs(ref).max()))
    print(f"max abs err vs XLA: {err:.3e} (rel {rel:.3e})")
    assert rel < 1e-3, "blocked kernel mismatch on chip"

    # backward correctness (symmetric path)
    w = jax.random.normal(jax.random.PRNGKey(1), (N, d))
    gref = jax.jit(jax.grad(lambda x: (spmm(g_xla, x) * w).sum()))(x)
    gpal = jax.jit(jax.grad(lambda x: (spmm(g, x) * w).sum()))(x)
    gerr = float(jnp.abs(gpal - gref).max()) / max(1e-9, float(jnp.abs(gref).max()))
    print(f"grad max rel err vs XLA: {gerr:.3e}")
    assert gerr < 1e-3

    bytes_fwd = g.nnz * d * 4 + N * d * 4 + g.nnz * 8
    t_xla = timeit(f_xla, x)
    t_pal = timeit(f_pal, x)
    fb_xla = jax.jit(jax.value_and_grad(lambda x: (spmm(g_xla, x) * w).sum()))
    fb_pal = jax.jit(jax.value_and_grad(lambda x: (spmm(g, x) * w).sum()))
    t_fb_xla = timeit(lambda x: fb_xla(x)[1], x)
    t_fb_pal = timeit(lambda x: fb_pal(x)[1], x)

    hbm = 819e9
    res = {
        "nnz": int(g.nnz), "n_rows": int(N), "d": d,
        "xla_fwd_ms": round(t_xla * 1e3, 3),
        "pallas_fwd_ms": round(t_pal * 1e3, 3),
        "fwd_speedup": round(t_xla / t_pal, 2),
        "xla_fwdbwd_ms": round(t_fb_xla * 1e3, 3),
        "pallas_fwdbwd_ms": round(t_fb_pal * 1e3, 3),
        "fwdbwd_speedup": round(t_fb_xla / t_fb_pal, 2),
        "pallas_fwd_frac_hbm_peak": round(bytes_fwd / t_pal / hbm, 4),
        "xla_fwd_frac_hbm_peak": round(bytes_fwd / t_xla / hbm, 4),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
    os._exit(0)
