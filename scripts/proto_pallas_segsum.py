"""Prototype: Pallas sorted-segment-sum via per-chunk one-hot MXU matmuls.

Replaces the XLA sorted scatter in spmm (measured 2ms of the 3.1ms baby-scale
pass). Rows are sorted and every row in range is non-empty, so a chunk of E
edges spans at most SPAN consecutive output rows; build a (SPAN, E) one-hot
from local row offsets and contract it against the gathered values on the
MXU, accumulating into a VMEM-resident output with dynamic slices (the TPU
grid is sequential, so read-modify-write is safe).

Layout: edges grouped into super-chunks of 8×E so the rows block is a legal
(8, E) tile; the kernel unrolls the 8 sub-chunks, each a (SPAN, E) @ (E, d)
MXU contraction (contraction dim on lanes of the one-hot).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # sub-chunks per grid step (rows tile sublane requirement)


def _segsum_kernel(starts_ref, rows_ref, g_ref, out_ref, *, span, chunk):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for i in range(SUB):
        # align the output window down to a sublane multiple so the dynamic
        # read-modify-write stays on tile boundaries
        row_start = starts_ref[c * SUB + i] & ~7
        rowvec = rows_ref[i, :]  # (E,)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (span, chunk), 0)
        # the one-hot is exact in bf16, so two default-precision bf16 passes
        # over a hi/lo split of g reproduce the f32 product exactly
        onehot = (rowvec[None, :] - row_start == iota_sub).astype(jnp.bfloat16)
        gsub = g_ref[pl.ds(i * chunk, chunk), :]
        g_hi = gsub.astype(jnp.bfloat16)
        g_lo = (gsub - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda b: jnp.dot(onehot, b, preferred_element_type=jnp.float32)
        contrib = dot(g_hi) + dot(g_lo)
        start = pl.multiple_of(row_start, 8)
        out_ref[pl.ds(start, span)] += contrib


def sorted_segment_sum_pallas(gathered, rows, n_rows, span, chunk=1024):
    """gathered: (nnz, d) f32, rows: (nnz,) int32 sorted; requires every row
    in [min(rows), max(rows)] to be non-empty so a chunk spans <= span rows."""
    nnz, d = gathered.shape
    step = SUB * chunk
    n_super = -(-nnz // step)
    pad = n_super * step - nnz
    if pad:
        gathered = jnp.pad(gathered, ((0, pad), (0, 0)))  # zero contributions
        rows = jnp.pad(rows, (0, pad), constant_values=n_rows - 1)
    starts = rows[::chunk]  # (n_super*SUB,)
    rows2d = rows.reshape(n_super * SUB, chunk)

    out_pad = n_rows + span  # dynamic windows never run off the end
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((SUB, chunk), lambda c, s: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((step, d), lambda c, s: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (out_pad, d), lambda c, s: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, span=span, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((out_pad, d), jnp.float32),
        grid_spec=grid_spec,
    )(starts, rows2d, gathered)
    return out[:n_rows]


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    rng = np.random.default_rng(0)
    N_U, N_I, D = 19445, 7050, 64
    N = N_U + N_I
    # synthetic 5-core-like bipartite edges: every node has >= 5 edges
    deg = np.maximum(5, rng.zipf(1.7, N) % 60)
    rows = np.repeat(np.arange(N, dtype=np.int32), deg)
    nnz = len(rows)
    cols = rng.integers(0, N, nnz).astype(np.int32)
    vals = rng.random(nnz).astype(np.float32)
    x = rng.random((N, D)).astype(np.float32)
    print(f"nnz={nnz}")

    # exact max chunk span on host
    chunk = 1024
    pad = -(-nnz // chunk) * chunk - nnz
    rows_p = np.concatenate([rows, np.full(pad, N - 1, np.int32)])
    r2 = rows_p.reshape(-1, chunk)
    span = int((r2.max(1) - r2.min(1)).max()) + 1 + 8  # +8: aligned-down start
    span = -(-span // 8) * 8
    print(f"chunk={chunk} span={span}")

    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    vals_j = jnp.asarray(vals)
    x_j = jnp.asarray(x)

    gathered = vals_j[:, None] * x_j[cols_j]
    ref = jax.ops.segment_sum(gathered, rows_j, num_segments=N, indices_are_sorted=True)

    fn = jax.jit(lambda g, r: sorted_segment_sum_pallas(g, r, N, span, chunk))
    out = fn(gathered, rows_j)
    err = float(jnp.abs(out - ref).max())
    print(f"max abs err: {err:.2e}")
    assert err < 1e-3, "MISMATCH"

    if on_tpu:
        seg = jax.jit(
            lambda g, r: jax.ops.segment_sum(g, r, num_segments=N, indices_are_sorted=True)
        )
        full_seg = jax.jit(
            lambda v, c, r, xx: jax.ops.segment_sum(
                v[:, None] * xx[c], r, num_segments=N, indices_are_sorted=True
            )
        )
        full_pal = jax.jit(
            lambda v, c, r, xx: sorted_segment_sum_pallas(v[:, None] * xx[c], r, N, span, chunk)
        )

        def bench(f, *a, n=50):
            jax.block_until_ready(f(*a))
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(*a)
            jax.block_until_ready(o)
            return (time.perf_counter() - t0) / n * 1e3

        print(
            f"segsum only      xla: {bench(seg, gathered, rows_j):.3f} ms  "
            f"pallas: {bench(fn, gathered, rows_j):.3f} ms"
        )
        print(
            f"full spmm        xla: {bench(full_seg, vals_j, cols_j, rows_j, x_j):.3f} ms  "
            f"pallas: {bench(full_pal, vals_j, cols_j, rows_j, x_j):.3f} ms"
        )


if __name__ == "__main__":
    main()
