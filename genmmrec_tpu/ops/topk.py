"""Exact top-k over wide score rows, TPU-shaped.

``jax.lax.top_k`` lowers to a sort network over the full row — at catalog
widths (elec: 63,001 items) that sort dominates full-sort evaluation (the
reference's hot eval op, ``src/common/trainer.py:379-387`` /
``torch.topk``). This module replaces it with an exact two-stage selection
that matches the TPU's 128-lane layout:

1. one VPU pass folds the row into per-group maxima (group = 128 lanes),
2. a tiny ``lax.top_k`` over the ~N/128 group maxima picks the k candidate
   groups — PROVABLY a superset of the groups holding the true top-k
   (any group containing a top-k element has gmax >= the k-th value, and
   at most k distinct groups can; ties at the k-th value may reorder
   which equal-valued element wins, same caveat as torch vs XLA),
3. gather those k groups (k*128 survivors) and run one exact ``lax.top_k``
   over them.

Sort work drops from O(N log^2 N) to O(N) + O(k*128 log^2(k*128)) per row —
measured ~29x faster than ``lax.top_k`` at (4096, 63001) on v5e.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_GROUP = 128  # one VREG lane row; keeps the fold pass layout-native


def _extract_kernel(gidx_ref, s3_ref, v_ref, i_ref, *, k: int, kp: int, group: int):
    """Per row-block: gather the ``kp`` candidate groups by a one-hot MXU
    contraction (XLA's gather of (B, k, group) slices measured 2.3 GB/s on
    v5e — 23 ms of a 56 ms eval chunk), then extract the top-``k`` by
    iterative max+mask entirely in VMEM (lax.top_k's full sort over the
    k*group candidates was the other 19 ms)."""
    bt = s3_ref.shape[0]
    g = s3_ref.shape[1]
    gidx = gidx_ref[:]                      # (bt, kp) int32; pad slots == g
    s3 = s3_ref[:]                          # (bt, g, group) score dtype

    # one-hot gather: cand[b, k, l] = s3[b, gidx[b, k], l]  (MXU batched)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (bt, kp, g), 2)
    oh = (iota_g == gidx[:, :, None]).astype(s3.dtype)
    cand = jax.lax.dot_general(
        oh, s3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # the contraction is a pure gather (single 1.0 per row of oh), so it
        # must be value-exact: f32 operands need HIGHEST to stop the MXU's
        # default bf16-pass rounding; bf16 operands are exact by default
        # (bf16 x bf16 -> f32) and Mosaic rejects fp32 precision on them
        precision=(
            jax.lax.Precision.HIGHEST
            if s3.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )                                        # (bt, kp, group) f32 — the
    # extraction loop stays f32: Mosaic's argmax supports only f32

    # 2-D from here on (Mosaic layouts dislike (bt,1,1) shapes): flatten
    # the candidate plane to (bt, kp*group), flat position = slot*group+lane
    kc = kp * group
    cand = cand.reshape(bt, kc)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    flat = jax.lax.broadcasted_iota(jnp.int32, (bt, kc), 1)
    cand = jnp.where(flat >= k * group, neg, cand)  # pad slots never win
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (bt, kp), 1)

    def body(t, carry):
        cand, vals, idxs = carry
        # single-pass argmax (first occurrence — lax.top_k's tie rule),
        # one more for the value, one masked update: 3 passes per extract
        pos = jnp.argmax(cand, axis=1, keepdims=True).astype(jnp.int32)
        m = jnp.max(cand, axis=1, keepdims=True)                   # (bt,1)
        k_slot = pos // group
        lane_id = pos % group
        grp = jnp.sum(
            jnp.where(iota_k == k_slot, gidx, 0), axis=1, keepdims=True
        )                                                          # (bt,1)
        # dynamic-lane stores are not expressible on TPU (lane offsets must
        # be 128-aligned): select into loop-carried result planes instead
        vals = jnp.where(iota_k == t, m.astype(jnp.float32), vals)
        idxs = jnp.where(iota_k == t, grp * group + lane_id, idxs)
        return jnp.where(flat == pos, neg, cand), vals, idxs

    vals0 = jnp.full((bt, kp), -jnp.inf, jnp.float32)
    idxs0 = jnp.full((bt, kp), -1, jnp.int32)
    _, vals, idxs = jax.lax.fori_loop(0, k, body, (cand, vals0, idxs0))
    v_ref[:] = vals.astype(v_ref.dtype)
    i_ref[:] = idxs


def _gather_kernel(gidx_ref, s3_ref, c_ref, *, kp: int):
    """Gather ``kp`` candidate groups per row as a one-hot MXU contraction,
    entirely in VMEM. XLA's lowering of the same einsum materializes the
    one-hot plane in HBM and runs the batched matmul at ~10 ms/16k users at
    the elec shape; in-kernel both stay in VMEM."""
    bt = s3_ref.shape[0]
    g = s3_ref.shape[1]
    gidx = gidx_ref[:]                      # (bt, kp) int32; pad slots == g
    s3 = s3_ref[:]                          # (bt, g, group) score dtype
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (bt, kp, g), 2)
    oh = (iota_g == gidx[:, :, None]).astype(s3.dtype)
    cand = jax.lax.dot_general(
        oh, s3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if s3.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    c_ref[:] = cand.reshape(bt, kp * s3.shape[2]).astype(c_ref.dtype)


def _candidate_gather_pallas(
    sm3, gidx, k: int, group: int, bt: int | None = None, interpret: bool = False
):
    """(b, g, group) finite-sentinel scores + (b, k) group ids →
    (b, k*group) gathered candidate rows (flat, slot-major)."""
    b, g, _ = sm3.shape
    if bt is None:
        bt = 48 if jnp.dtype(sm3.dtype).itemsize <= 2 else 16
    kp = max(8, -(-k // 8) * 8)
    gidx_p = jnp.pad(gidx, ((0, 0), (0, kp - k)), constant_values=g)
    b_pad = -(-b // bt) * bt
    if b_pad != b:
        sm3 = jnp.pad(sm3, ((0, b_pad - b), (0, 0), (0, 0)))
        gidx_p = jnp.pad(gidx_p, ((0, b_pad - b), (0, 0)), constant_values=g)

    cand = pl.pallas_call(
        partial(_gather_kernel, kp=kp),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, kp), lambda i: (i, 0)),
            pl.BlockSpec((bt, g, group), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, kp * group), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, kp * group), sm3.dtype),
        interpret=interpret,
    )(gidx_p, sm3)
    return cand[:b, : k * group]


def _candidate_extract_pallas(
    sm3, gidx, k: int, group: int, bt: int | None = None, interpret: bool = False
):
    """(b, g, group) masked scores + (b, k) candidate groups → exact
    top-k ``(values, flat_indices)`` via the Pallas kernel above."""
    b, g, _ = sm3.shape
    if bt is None:
        # VMEM budget: the streamed s3 block dominates (bt*g*group*esize,
        # double-buffered); 48 rows of bf16 fits, f32 needs 16. Bigger
        # blocks amortize the 50 sequential reduce latencies per block.
        bt = 48 if jnp.dtype(sm3.dtype).itemsize <= 2 else 16
    kp = max(8, -(-k // 8) * 8)
    gidx_p = jnp.pad(gidx, ((0, 0), (0, kp - k)), constant_values=g)
    b_pad = -(-b // bt) * bt
    if b_pad != b:
        sm3 = jnp.pad(sm3, ((0, b_pad - b), (0, 0), (0, 0)))
        gidx_p = jnp.pad(gidx_p, ((0, b_pad - b), (0, 0)), constant_values=g)
    out_k = kp

    v, i = pl.pallas_call(
        partial(_extract_kernel, k=k, kp=kp, group=group),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, kp), lambda i: (i, 0)),
            pl.BlockSpec((bt, g, group), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, out_k), lambda i: (i, 0)),
            pl.BlockSpec((bt, out_k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, out_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, out_k), jnp.int32),
        ],
        interpret=interpret,
    )(gidx_p, sm3)
    return v[:b, :k], i[:b, :k]


def _unpack_bits(m3: jnp.ndarray, group: int) -> jnp.ndarray:
    """(b, g, group//8) uint8 → (b, g, group) bool, little-endian bit order
    (numpy ``packbits(bitorder='little')`` layout)."""
    b, g, _ = m3.shape
    bits = (m3[:, :, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(b, g, group) != 0


def grouped_topk(
    scores: jnp.ndarray,
    k: int,
    group: int = _GROUP,
    packed_mask: jnp.ndarray | None = None,
):
    """Exact masked ``lax.top_k`` replacement for wide rows (2-D only).

    Returns ``(values, indices)`` with the same shapes/dtypes contract as
    ``jax.lax.top_k``. Exact up to ties at the k-th value (index-order of
    equal scores may differ — float scores, so measure-zero in practice).
    Falls back to ``lax.top_k`` when the row is too narrow to benefit.

    Value contract on masked/padded entries: on the TPU path they surface
    as ``finfo(dtype).min`` (the in-kernel sentinel — 0 * -inf would be
    NaN in the one-hot MXU gather), not the -inf that ``lax.top_k`` over a
    ``where(mask, -inf, x)`` plane would return. Rows with fewer than k
    unmasked entries therefore pad the value tail with ``finfo.min``;
    indices are unaffected (all production callers consume indices only).

    ``packed_mask`` is an optional (b, ceil(n/8)) uint8 bit-matrix
    (little-endian, numpy ``packbits(axis=1, bitorder='little')``) marking
    positions to exclude (train positives in full-sort eval). Fusing the
    mask here beats masking the score matrix first: the bit-unpack + where
    fuse into the group-max fold's single pass over ``scores`` and into the
    gathered candidates, so the masked (b, n) matrix is never materialized
    in HBM — the measured cost of the pre-masking alternatives at the elec
    shape was +53 ms/16k users (scatter) / +11 ms (where on an unpacked
    bool plane) on v5e.
    """
    b, n = scores.shape
    n_groups = -(-n // group)
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    if n_groups <= 2 * k:  # narrow rows: the two-stage has nothing to skip
        if packed_mask is not None:
            n_bytes = packed_mask.shape[1]
            bits = _unpack_bits(packed_mask[:, None, :], n_bytes * 8)[:, 0, :n]
            scores = jnp.where(bits, neg, scores)
        return jax.lax.top_k(scores, k)

    n_pad = n_groups * group
    if n_pad != n:
        scores = jnp.pad(scores, ((0, 0), (0, n_pad - n)), constant_values=neg)

    import os

    # the Pallas/MXU-gather paths are Mosaic-TPU programs; any other
    # backend (cpu, gpu) takes the take_along_axis route
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas candidate-extract kernel is exact and validated, but its
    # 50 sequential in-VMEM extraction reduces are latency-bound (measured
    # 41-46 ms/16k users vs 30-35 for the XLA one-hot + lax.top_k stage it
    # replaces) — opt-in only, kept as the base for future in-kernel work
    use_pallas = group == _GROUP and on_tpu and bool(
        os.environ.get("GENMMREC_PALLAS_TOPK")
    )

    s3 = scores.reshape(b, n_groups, group)
    m3 = None
    if packed_mask is not None:
        gb = group // 8
        pm = packed_mask
        if pm.shape[1] != n_groups * gb:
            pm = jnp.pad(pm, ((0, 0), (0, n_groups * gb - pm.shape[1])))
        m3 = pm.reshape(b, n_groups, gb)

    if use_pallas:
        # masked plane materialized once (two consumers: fold + kernel).
        # finite sentinel, NOT -inf: the kernel's one-hot MXU gather
        # computes 0 * score for non-selected cells, and 0 * -inf = NaN
        neg_fin = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
        if m3 is not None:
            sm3 = jnp.where(_unpack_bits(m3, group), neg_fin, s3)
        else:
            sm3 = s3
        sm3 = jnp.maximum(sm3, neg_fin)  # pad columns arrive as -inf
        gmax = sm3.max(axis=-1)
        _, gidx = jax.lax.top_k(gmax, k)
        v, idx = _candidate_extract_pallas(sm3, gidx, k, group)
        return v.astype(scores.dtype), idx

    if m3 is not None:
        # fold pass: mask fused into the max (no materialized masked plane)
        gmax = jnp.where(_unpack_bits(m3, group), neg, s3).max(axis=-1)
    else:
        gmax = s3.max(axis=-1)  # (b, n_groups) — the single full pass
    _, gidx = jax.lax.top_k(gmax, k)  # (b, k) candidate groups

    # gather the k candidate groups' scores: (b, k, group)
    if on_tpu:
        # one-hot MXU contraction in a Pallas kernel: XLA's slice-gather
        # runs at 2.3 GB/s on v5e (23 ms of a 56 ms eval chunk) and even
        # its own one-hot einsum materializes the one-hot plane in HBM
        # (~10 ms); in-kernel both stay in VMEM.
        # 0 * (-inf) = NaN, so gather from a finite-sentinel plane.
        neg_fin = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
        sm3 = jnp.maximum(s3, neg_fin)
        if m3 is not None:
            sm3 = jnp.where(_unpack_bits(m3, group), neg_fin, sm3)
        if group == _GROUP:
            flat_cand = _candidate_gather_pallas(sm3, gidx, k, group)
        else:
            # recursion level (16-wide groups): planes are small, the XLA
            # einsum is fine and the kernel's layouts want 128 lanes
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (b, k, n_groups), 2)
                == gidx[:, :, None]
            ).astype(sm3.dtype)
            prec = (
                jax.lax.Precision.HIGHEST
                if scores.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            flat_cand = (
                jnp.einsum("bkg,bgl->bkl", oh, sm3, precision=prec)
                .astype(scores.dtype)
                .reshape(b, k * group)
            )
    else:
        cand = jnp.take_along_axis(s3, gidx[:, :, None], axis=1)
        if m3 is not None:
            mb = jnp.take_along_axis(m3, gidx[:, :, None], axis=1)
            cand = jnp.where(_unpack_bits(mb, group), neg, cand)
        flat_cand = cand.reshape(b, k * group)
    cand_idx = gidx[:, :, None] * group + jnp.arange(group, dtype=gidx.dtype)
    if on_tpu and group > 16 and k * group >= 32 * k:
        # recurse with 16-wide groups: the same two-stage theorem shrinks
        # the final sort from k*group (6400 at k=50) to k*16 (800) — the
        # flat lax.top_k over 6400 candidates was ~19 ms of the 33 ms
        # remaining at the elec shape
        v, pos = grouped_topk(flat_cand, k, group=16)
    else:
        v, pos = jax.lax.top_k(flat_cand, k)
    idx = jnp.take_along_axis(cand_idx.reshape(b, k * group), pos, axis=1)
    return v, idx
