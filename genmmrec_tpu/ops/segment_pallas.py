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
    """Output working set + gathered blocks + one-hot. The compiler holds
    FOUR copies of the resident output block (measured on v5e: a 22.5MB
    block produced an 87.7MB scoped allocation — double-buffering on both
    sides of the += accumulation), so the output term is 4x."""
    return (
        4 * (n_rows + span) * d * 4
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


def block_plan(rows: np.ndarray, n_rows: int, chunk: int = CHUNK, d: int = D_TILE):
    """Host-side plan enabling the kernel on graphs whose FULL (n_rows, d)
    output exceeds the VMEM budget (chunk_span returns 0 there — e.g. the
    elec-scale 255k-node adjacency): step-aligned edge blocks, each covering
    a contiguous row window small enough to stay VMEM-resident. Boundary
    rows may be split across adjacent blocks; the combine step adds the
    overlapping windows back together.

    Returns ``(steps_per_block, nblocks, nr_max, span, r0s)`` — all static —
    or None when the graph is too small or no feasible block height exists.
    """
    nnz = len(rows)
    step = SUB * chunk
    if nnz < 4 * step:
        return None
    n_super = -(-nnz // step)
    pad = n_super * step - nnz
    pad_val = int(rows[-1])
    rows_p = np.concatenate([rows, np.full(pad, pad_val, rows.dtype)])
    r2 = rows_p.reshape(-1, chunk)
    span = int((r2.max(1) - r2.min(1)).max()) + 1 + 8
    span = -(-span // 8) * 8
    chunk_first = rows_p[::chunk].astype(np.int64)  # sorted rows: per-chunk min
    chunk_last = r2.max(1).astype(np.int64)

    def plan_for(spb: int):
        nb = -(-n_super // spb)
        cpb = spb * SUB
        r0s, ext = [], 0
        for b in range(nb):
            c0 = b * cpb
            c1 = min(len(chunk_first), c0 + cpb)
            r0 = int(chunk_first[c0]) & ~7
            r0s.append(r0)
            ext = max(ext, int(chunk_last[c1 - 1]) - r0 + 1)
        nr_max = -(-ext // 8) * 8
        return nb, nr_max, tuple(r0s)

    # largest feasible block (fewest combine adds): binary search on the
    # number of scan steps per block
    lo, hi, best = 1, n_super, None
    while lo <= hi:
        mid = (lo + hi) // 2
        nb, nr_max, r0s = plan_for(mid)
        if _vmem_estimate(nr_max, span, d, chunk) <= _VMEM_BUDGET:
            best = (mid, nb, nr_max, span, r0s)
            lo = mid + 1
        else:
            hi = mid - 1
    if best is None or best[1] <= 1:
        return None  # single block == the unblocked kernel's regime
    return best


def _segsum_kernel_blocked(
    starts_ref, r0s_ref, rows_ref, g_ref, out_ref, *, span, chunk, nnz, spb
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    g_super = b * spb + c  # global scan-step index

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, carry):
        r0 = r0s_ref[b]
        # window start relative to the block's first (8-aligned) row
        row_start = (starts_ref[g_super * SUB + i] & ~7) - r0
        rowvec = rows_ref[i, :]  # (chunk,) absolute row ids
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (span, chunk), 0)
        onehot = ((rowvec - r0)[None, :] - row_start == iota_sub).astype(
            jnp.bfloat16
        )
        gsub = g_ref[pl.ds(i * chunk, chunk), :]
        base = (g_super * SUB + i) * chunk
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
        dot = lambda x: jnp.dot(onehot, x, preferred_element_type=jnp.float32)
        contrib = dot(g_hi) + dot(g_lo)
        start = pl.multiple_of(row_start, 8)
        out_ref[pl.ds(start, span)] += contrib
        return carry

    jax.lax.fori_loop(0, SUB, body, 0)


def _segsum_blocked_impl(gathered, rows, n_rows, plan, chunk, interpret):
    spb, nblocks, nr_max, span, r0s = plan
    nnz, d = gathered.shape
    if d > D_TILE:
        d_max = D_TILE
        while (
            d_max + D_TILE <= d
            and _vmem_estimate(nr_max, span, d_max + D_TILE, chunk) <= _VMEM_BUDGET
        ):
            d_max += D_TILE
        if d > d_max:
            outs = [
                _segsum_blocked_impl(
                    gathered[:, s : s + d_max], rows, n_rows, plan, chunk, interpret
                )
                for s in range(0, d, d_max)
            ]
            return jnp.concatenate(outs, axis=1)

    step = SUB * chunk
    total_steps = nblocks * spb
    pad = total_steps * step - nnz
    if pad:
        # pad rows with the LAST block's final row so padded chunks stay
        # inside its window; padded gathered entries are zero-masked by the
        # kernel's nnz guard
        rows = jnp.pad(rows, (0, pad), constant_values=r0s[-1])

    starts = rows[::chunk]
    rows2d = rows.reshape(total_steps * SUB, chunk)
    r0s_arr = jnp.asarray(np.asarray(r0s, np.int32))

    # gathered is passed UNPADDED (nnz rows); the last block's grid may
    # extend past it entirely, so clamp its step index to the last real
    # step-block — the kernel's nnz guard zero-masks those re-reads
    last_real = max(0, -(-nnz // step) - 1)

    out_h = nr_max + span
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks, spb),
        in_specs=[
            pl.BlockSpec(
                (SUB, chunk),
                lambda b, c, s1, s2: (b * spb + c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (step, d),
                lambda b, c, s1, s2: (jnp.minimum(b * spb + c, last_real), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_h, d), lambda b, c, s1, s2: (b, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _segsum_kernel_blocked, span=span, chunk=chunk, nnz=nnz, spb=spb
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * out_h, d), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, r0s_arr, rows2d, gathered)
    # combine: adjacent blocks overlap only on their boundary rows — add the
    # windows into the full output at their (static) row offsets
    res = jnp.zeros((max(r0s) + out_h, d), jnp.float32)
    for b in range(nblocks):
        res = res.at[r0s[b] : r0s[b] + out_h].add(out[b * out_h : (b + 1) * out_h])
    return res[:n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sorted_segment_sum_blocked(gathered, rows, n_rows, plan, chunk=CHUNK, interpret=False):
    """Row-blocked segment_sum for graphs too large for the single-window
    kernel (see ``block_plan``). Differentiable in ``gathered``."""
    return _segsum_blocked_impl(gathered, rows, n_rows, plan, chunk, interpret)


def _blk_fwd(gathered, rows, n_rows, plan, chunk, interpret):
    return _segsum_blocked_impl(gathered, rows, n_rows, plan, chunk, interpret), rows


def _blk_bwd(n_rows, plan, chunk, interpret, rows, out_bar):
    return out_bar[rows], np.zeros(rows.shape, jax.dtypes.float0)


sorted_segment_sum_blocked.defvjp(_blk_fwd, _blk_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def spmm_symmetric_blocked(rows, cols, vals, x, n_rows, plan, chunk=CHUNK, interpret=False):
    """Blocked SpMM for a SYMMETRIC sorted graph: forward and the transpose
    backward product both ride the blocked kernel."""
    return _segsum_blocked_impl(
        vals[:, None] * x[cols], rows, n_rows, plan, chunk, interpret
    )


def _sym_blk_fwd(rows, cols, vals, x, n_rows, plan, chunk, interpret):
    out = _segsum_blocked_impl(vals[:, None] * x[cols], rows, n_rows, plan, chunk, interpret)
    return out, (rows, cols, vals, x)


def _sym_blk_bwd(n_rows, plan, chunk, interpret, res, out_bar):
    rows, cols, vals, x = res
    x_bar = _segsum_blocked_impl(
        vals[:, None] * out_bar[cols], rows, n_rows, plan, chunk, interpret
    )
    vals_bar = (x[cols] * out_bar[rows]).sum(-1)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return f0(rows), f0(cols), vals_bar, x_bar


spmm_symmetric_blocked.defvjp(_sym_blk_fwd, _sym_blk_bwd)


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
