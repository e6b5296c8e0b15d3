"""Stage/path breakdown of the elec-scale SpMM (VERDICT r4 ask #7).

bench.spmm_roofline_elec reports 2.6% of HBM peak; this probe splits the
production path into its stages and times alternatives so the optimization
targets the real bottleneck:

  gather   : vals[:, None] * x[cols]            (XLA dynamic gather)
  segsum   : blocked Pallas kernel on pre-gathered values
  xla      : XLA sorted-scatter segment_sum (pre-r3 path)
  prod     : ops.graph.spmm as the planner ships it
  ell      : ELL-pack dense formulation (cap + overflow CSR tail)

Chained-carry timing (y = f(y)) like bench.py so the axon tunnel cannot
cache identical dispatches.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from genmmrec_tpu.ops.graph import bipartite_norm_adj, spmm

N_USERS, N_ITEMS, N_INTER, D = 192403, 63001, 1689188, 64
HBM = 819e9


def timeit(f, x, n=10):
    y = f(x)
    y.block_until_ready()
    t0 = time.time()
    y = x
    for _ in range(n):
        y = f(y)
    y.block_until_ready()
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    users = rng.integers(0, N_USERS, N_INTER).astype(np.int64)
    items = rng.integers(0, N_ITEMS, N_INTER).astype(np.int64)
    adj = bipartite_norm_adj(users, items, N_USERS, N_ITEMS).with_span()
    n = N_USERS + N_ITEMS
    x = jnp.asarray(rng.standard_normal((n, D), np.float32))
    nnz = adj.nnz
    print(f"nnz={nnz} span={adj.pallas_span} plan="
          f"{None if adj.pallas_plan is None else adj.pallas_plan[:4]}",
          flush=True)
    bytes_full = nnz * D * 4 + 2 * n * D * 4 + nnz * 8

    # production path
    dt = timeit(jax.jit(lambda x: spmm(adj, x)), x)
    print(f"prod    : {dt*1e3:8.2f} ms  {bytes_full/dt/1e9:7.1f} GB/s "
          f"({bytes_full/dt/HBM:.3f} of peak)", flush=True)

    # gather alone (the XLA dynamic gather + multiply). acc-chained so the
    # tunnel cannot replay an identical dispatch.
    gbytes = nnz * D * 8 + nnz * 4 + n * D * 4  # read x rows + write + idx
    f_g = jax.jit(lambda x: adj.vals[:, None] * x[adj.cols])
    g0 = f_g(x)

    def chain_time(step, n=6):
        def run(m):
            acc = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(m):
                acc = step(acc)
            np.asarray(acc)
            return time.time() - t0

        run(1)
        t1 = min(run(1) for _ in range(2))
        tn = min(run(n) for _ in range(2))
        return max(tn - t1, 1e-9) / (n - 1)

    @jax.jit
    def g_step(acc):
        g = f_g(x + acc * jnp.float32(1e-38))
        return acc + g.sum() * 1e-30

    dt = chain_time(g_step)
    print(f"gather  : {dt*1e3:8.2f} ms  {gbytes/dt/1e9:7.1f} GB/s", flush=True)

    # segsum alone on pre-gathered values (blocked kernel if planned)
    if adj.pallas_plan is not None or adj.pallas_span > 0:
        from genmmrec_tpu.ops.segment_pallas import (
            sorted_segment_sum, sorted_segment_sum_blocked,
        )
        if adj.pallas_span > 0:
            f_s = jax.jit(lambda g: sorted_segment_sum(
                g, adj.rows, n, adj.pallas_span))
        else:
            f_s = jax.jit(lambda g: sorted_segment_sum_blocked(
                g, adj.rows, n, adj.pallas_plan))
        sbytes = nnz * D * 8 + n * D * 4 + nnz * 4

        @jax.jit
        def s_step(acc):
            o = f_s(g0 + acc * jnp.float32(1e-38))
            return acc + o.sum() * 1e-30

        dt = chain_time(s_step)
        print(f"segsum  : {dt*1e3:8.2f} ms  {sbytes/dt/1e9:7.1f} GB/s",
              flush=True)

    # XLA sorted-scatter
    f_x = jax.jit(lambda x: jax.ops.segment_sum(
        adj.vals[:, None] * x[adj.cols], adj.rows, n,
        indices_are_sorted=True))
    dt = timeit(f_x, x)
    print(f"xla     : {dt*1e3:8.2f} ms  {bytes_full/dt/1e9:7.1f} GB/s "
          f"({bytes_full/dt/HBM:.3f} of peak)", flush=True)

    # ELL-pack: cap P neighbors/row, CSR overflow tail via XLA segsum
    rows_np = np.asarray(adj.rows)
    cols_np = np.asarray(adj.cols)
    vals_np = np.asarray(adj.vals)
    for P in (8, 16):
        pos = np.zeros(nnz, np.int64)
        # position of each edge within its row (rows sorted)
        starts = np.searchsorted(rows_np, np.arange(n))
        pos = np.arange(nnz) - starts[rows_np]
        in_ell = pos < P
        ell_cols = np.zeros((n, P), np.int32)
        ell_vals = np.zeros((n, P), np.float32)
        ell_cols[rows_np[in_ell], pos[in_ell]] = cols_np[in_ell]
        ell_vals[rows_np[in_ell], pos[in_ell]] = vals_np[in_ell]
        ov = ~in_ell
        ov_rows = jnp.asarray(rows_np[ov])
        ov_cols = jnp.asarray(cols_np[ov])
        ov_vals = jnp.asarray(vals_np[ov])
        ec = jnp.asarray(ell_cols)
        ev = jnp.asarray(ell_vals)
        n_ov = int(ov.sum())

        @jax.jit
        def f_e(x):
            out = jnp.einsum("np,npd->nd", ev, x[ec])
            if n_ov:
                out = out + jax.ops.segment_sum(
                    ov_vals[:, None] * x[ov_cols], ov_rows, n,
                    indices_are_sorted=True)
            return out

        dt = timeit(f_e, x)
        err = float(jnp.abs(f_e(x) - f_x(x)).max())
        print(f"ell P={P:2d}: {dt*1e3:8.2f} ms  "
              f"{bytes_full/dt/1e9:7.1f} GB/s "
              f"({bytes_full/dt/HBM:.3f} of peak) ov={n_ov} err={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
