"""Pallas TPU kernel: sorted segment-sum as per-chunk one-hot MXU matmuls.

The hottest op in the framework is the SpMM ``segment_sum(vals*x[cols],
rows)`` (ops/graph.py). XLA lowers the sorted scatter to a serialized
store loop measured at ~2.3ms for baby scale (nnz≈206k, d=64) on v5e;
this kernel does it in ~0.95ms (full SpMM 2.65ms → 1.38ms):

- rows are sorted, and the span of any fixed-size edge chunk (max row −
  min row + 1) is bounded by a STATIC per-graph constant computed on host
  at graph-build time (``chunk_span``);
- each chunk builds a (span, E) one-hot from local row offsets and
  contracts it against the gathered values on the MXU. The one-hot is
  exact in bf16, so two default-precision bf16 passes over a hi/lo split
  of g reproduce the f32 product exactly (~3e-5 abs err at baby scale);
- the output lives in VMEM across the sequential grid; each chunk
  accumulates into a dynamic, sublane-aligned window (TPU grid steps are
  sequential, so read-modify-write is race-free);
- wide operands (spmm_multi concatenations) are d-tiled by a second grid
  dimension ordered (d-tile, chunk) so the output tile stays resident
  while gathered blocks stream.

Backward: d(segsum)/d(gathered) is a plain sorted gather ``out_bar[rows]``
— no scatter — wired via custom_vjp; vals/x gradients flow through XLA's
autodiff of the gather-multiply outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # sub-chunks per grid step (rows tile needs 8 sublanes)
# edges per sub-chunk: 256 measured best on v5e — the one-hot VPU work per
# edge scales with the chunk's row span, and real power-law graphs have
# span ~80 at 256 vs ~240 at 1024 (scripts/time_spmm_variants.py)
CHUNK = 256
D_TILE = 64  # column-split granularity for wide operands
# scoped-VMEM cap requested from the compiler (v5e has 128MB physical)
_VMEM_LIMIT = 56 * 1024 * 1024
# working-set budget a single kernel call must fit in (leaves headroom
# under _VMEM_LIMIT for compiler slack)
_VMEM_BUDGET = 44 * 1024 * 1024


def _vmem_estimate(n_rows: int, span: int, d: int, chunk: int = CHUNK) -> int:
    """Double-buffered output + gathered blocks + one-hot working set."""
    return (
        2 * (n_rows + span) * d * 4
        + 2 * SUB * chunk * d * 4
        + span * chunk * 6
    )


def chunk_span(rows: np.ndarray, n_rows: int, chunk: int = CHUNK) -> int:
    """Static per-graph span bound for the kernel, computed on host at
    graph-build time. Returns 0 (= kernel disabled) when the graph is too
    small or the span window would blow the VMEM budget."""
    nnz = len(rows)
    if nnz < SUB * chunk:  # tiny graphs: XLA is fine
        return 0
    pad = -(-nnz // chunk) * chunk - nnz
    rows_p = np.concatenate([rows, np.full(pad, max(n_rows - 1, 0), rows.dtype)])
    r2 = rows_p.reshape(-1, chunk)
    span = int((r2.max(1) - r2.min(1)).max()) + 1 + 8  # +8: aligned-down start
    span = -(-span // 8) * 8
    if _vmem_estimate(n_rows, span, D_TILE, chunk) > _VMEM_BUDGET:
        return 0  # even a 64-wide call would not fit
    return span


def dense_rows_span(n_rows: int, chunk: int = CHUNK) -> int:
    """Static span bound for graphs whose EVERY row is non-empty (self-loops
    on all nodes): a chunk-edge window of row-sorted edges then covers at
    most ``chunk`` distinct rows (+16 for aligned-down window starts).
    Returns 0 — kernel disabled, callers fall back to XLA segment_sum — when
    the resident (n_rows, d) output would blow the VMEM budget at this scale
    (observed: DiffMM regenerated graphs at elec scale, 255k rows × 64 →
    127MB scoped VMEM vs the 56MB cap)."""
    span = chunk + 16
    if _vmem_estimate(n_rows, span, D_TILE, chunk) > _VMEM_BUDGET:
        return 0
    return span


def _segsum_kernel(starts_ref, rows_ref, g_ref, out_ref, *, span, chunk, nnz):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, carry):
        # align the window down to a sublane multiple so the dynamic
        # read-modify-write stays on tile boundaries
        row_start = starts_ref[c * SUB + i] & ~7
        rowvec = rows_ref[i, :]  # (chunk,)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (span, chunk), 0)
        # exact-in-bf16 one-hot; hi/lo split of g keeps f32 accuracy at
        # default (single-pass) MXU precision
        onehot = (rowvec[None, :] - row_start == iota_sub).astype(jnp.bfloat16)
        gsub = g_ref[pl.ds(i * chunk, chunk), :]
        # g rides in UNPADDED (the caller never copies it): Pallas pads the
        # ragged tail block with garbage, which must be zeroed — 0-entries
        # of the one-hot would still poison the matmul via 0 * NaN
        base = (c * SUB + i) * chunk
        gsub = jax.lax.cond(
            base + chunk > nnz,
            lambda g: jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + base < nnz,
                g,
                0.0,
            ),
            lambda g: g,
            gsub,
        )
        g_hi = gsub.astype(jnp.bfloat16)
        g_lo = (gsub - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda b: jnp.dot(onehot, b, preferred_element_type=jnp.float32)
        contrib = dot(g_hi) + dot(g_lo)
        start = pl.multiple_of(row_start, 8)
        out_ref[pl.ds(start, span)] += contrib
        return carry

    # fori_loop (not an unrolled python loop): one iteration's intermediates
    # on the Mosaic stack instead of SUB× — keeps scoped VMEM in budget
    jax.lax.fori_loop(0, SUB, body, 0)


def _segsum_impl(gathered, rows, n_rows, span, chunk, interpret):
    nnz, d = gathered.shape
    # wide operands (spmm_multi concatenations): a block's last dim must
    # equal the array's, so the whole d rides in one call — fit as many
    # 64-col lanes as the VMEM budget allows, column-splitting the rest
    if d > D_TILE:
        d_max = D_TILE
        while (
            d_max + D_TILE <= d
            and _vmem_estimate(n_rows, span, d_max + D_TILE, chunk) <= _VMEM_BUDGET
        ):
            d_max += D_TILE
        if d > d_max:
            outs = [
                _segsum_impl(gathered[:, s : s + d_max], rows, n_rows, span, chunk, interpret)
                for s in range(0, d, d_max)
            ]
            return jnp.concatenate(outs, axis=1)

    step = SUB * chunk
    n_super = -(-nnz // step)
    pad = n_super * step - nnz
    if pad:
        # only the (nnz,) row ids are padded — cheap. The (nnz, d) gathered
        # operand is passed ragged; the kernel zero-masks the tail block.
        rows = jnp.pad(rows, (0, pad), constant_values=max(n_rows - 1, 0))

    starts = rows[::chunk]  # (n_super*SUB,) scalar prefetch
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
        functools.partial(_segsum_kernel, span=span, chunk=chunk, nnz=nnz),
        out_shape=jax.ShapeDtypeStruct((out_pad, d), jnp.float32),
        grid_spec=grid_spec,
        # the resident output block may be double-buffered by the compiler;
        # raise the scoped-VMEM cap above the 16MB default (v5e has 128MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, rows2d, gathered)
    return out[:n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sorted_segment_sum(gathered, rows, n_rows, span, chunk=CHUNK, interpret=False):
    """segment_sum(gathered, rows) for row-sorted edges with a static span
    bound (see ``chunk_span``). Differentiable in ``gathered``."""
    return _segsum_impl(gathered, rows, n_rows, span, chunk, interpret)


def _fwd(gathered, rows, n_rows, span, chunk, interpret):
    return _segsum_impl(gathered, rows, n_rows, span, chunk, interpret), rows


def _bwd(n_rows, span, chunk, interpret, rows, out_bar):
    # gradient of a segment-sum is a gather — no scatter in the backward
    return out_bar[rows], np.zeros(rows.shape, jax.dtypes.float0)


sorted_segment_sum.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def spmm_symmetric(rows, cols, vals, x, n_rows, span, chunk=CHUNK, interpret=False):
    """SpMM for a SYMMETRIC sorted graph, forward AND backward on the Pallas
    kernel: d(Ax)/dx = Aᵀ ȳ = A ȳ, so the transpose product reuses the same
    row-sorted edge list instead of XLA's serialized unsorted scatter over
    ``cols`` (the dominant cost of graph-model backward passes)."""
    gathered = vals[:, None] * x[cols]
    return _segsum_impl(gathered, rows, n_rows, span, chunk, interpret)


def _sym_fwd(rows, cols, vals, x, n_rows, span, chunk, interpret):
    out = _segsum_impl(vals[:, None] * x[cols], rows, n_rows, span, chunk, interpret)
    return out, (rows, cols, vals, x)


def _sym_bwd(n_rows, span, chunk, interpret, res, out_bar):
    rows, cols, vals, x = res
    x_bar = _segsum_impl(
        vals[:, None] * out_bar[cols], rows, n_rows, span, chunk, interpret
    )
    # dead-code-eliminated by XLA when vals is not a grad input
    vals_bar = (x[cols] * out_bar[rows]).sum(-1)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return f0(rows), f0(cols), vals_bar, x_bar


spmm_symmetric.defvjp(_sym_fwd, _sym_bwd)
