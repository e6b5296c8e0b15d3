"""Fused score+mask+top-k for full-sort evaluation — the (B, n) score
matrix never touches HBM.

The reference's full-sort eval hot path materializes the user-chunk score
matrix, masks train positives, and sorts it
(``src/common/trainer.py:379-387`` — ``torch.matmul`` + ``torch.topk``).
Round 4's grouped top-k (``ops/topk.py``) already replaced the full-row
sort with an exact two-stage 128-lane selection, but still read/wrote the
(B, n) score plane: at the elec catalog width that write+read is ~4.1 GB
per 16k users and bounds the op at ~14% of v5e HBM peak
(``docs/ROOFLINE.md``). This module fuses the scoring GEMM itself into the
selection so the only HBM traffic is the operands, the bit-packed mask,
the (B, n/128) group maxima, and the (B, k*128) candidate rows:

1. **fold kernel** — per user tile, compute score tiles ``u @ T`` on the
   MXU with the item table resident in VMEM, apply the bit-packed
   train-positive mask in-register, and fold each 128-lane group to its
   max. Output: (B, n/128) group maxima. Scores stay in VMEM.
2. ``lax.top_k`` over the group maxima picks the k candidate groups per
   row — provably a superset of the groups holding the true top-k (same
   theorem as ``ops/topk.py``).
3. **candidate kernel** — recompute the score tiles (the op is
   bandwidth-bound; doubling the MXU work is ~free) and gather the k
   winning groups' 128 raw lanes PLUS their 128 mask bytes via one-hot
   MXU contractions, masking at (B, k*128) candidate width — the v1
   full-plane mask unpack+select was the kernel's VPU bottleneck.
   Output: (B, k*128) masked candidates.
4. the exact final top-k over k*128 candidates reuses
   ``ops/topk.grouped_topk``'s 16-wide recursion.

Numerics match the unfused bf16 eval path exactly: the in-kernel GEMM
accumulates f32 and rounds to bf16 (same as XLA's bf16 dot), masked cells
carry the same finite ``finfo(bf16).min`` sentinel.

Bit-mask layout: Mosaic cannot lower the interleaved unpack
``(b, tn/8, 8) -> (b, tn)`` (minor-dim collapse of 8), so the mask is
stored **planar per item tile**: within each TN-lane tile, byte ``j``
holds bit ``k`` for the item at tile-lane ``k*(TN/8)+j``. In-kernel unpack
is then 8 shift-ands concatenated along lanes at TN/8 (128-aligned)
offsets — all layout-native. ``pack_planar_mask`` produces this layout
from a dense bool matrix on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genmmrec_tpu.ops.topk import _GROUP, grouped_topk

TILE_N = 8192   # item-tile width (lanes); the planar mask layout unit
_BT = 256       # user-tile rows per kernel invocation


def n_full_for(n_items: int, tile_n: int = TILE_N) -> int:
    """Catalog width padded to the planar-mask tile multiple."""
    return -(-n_items // tile_n) * tile_n


def pack_planar_mask(dense: np.ndarray, tile_n: int = TILE_N) -> np.ndarray:
    """(B, n) bool -> (B, n_full/8) uint8 in the per-tile planar layout.

    Pad columns (n..n_full) are marked MASKED so zero-scored table padding
    can never enter the top-k.
    """
    b, n = dense.shape
    nf = n_full_for(n, tile_n)
    if nf != n:
        dense = np.concatenate(
            [dense, np.ones((b, nf - n), dtype=bool)], axis=1
        )
    m4 = dense.reshape(b, nf // tile_n, 8, tile_n // 8)
    return np.packbits(m4, axis=2, bitorder="little").reshape(b, nf // 8)


def _masked_tile(u, t_ref, m_ref, j, *, bt, tn, arith=False):
    """Score tile j as masked bf16: u @ T[:, tile] (f32 MXU accum, rounded
    to bf16 — XLA's bf16 dot semantics) with the planar bit-mask applied
    in-register. All-bf16 vectors: an f32-domain variant of this tile chain
    sent the Mosaic compiler into a multi-minute layout-inference stall at
    nt=8, and buys nothing — bf16 rounding is monotone, so maxima agree.

    arith=True replaces the compare+select with ``s - bit * max|bf16|``,
    one bf16 FMA per lane; masked lanes land at ~-3.39e38 (score magnitudes
    are <<1e36, so they can never win a group max), unmasked lanes are
    bit-identical. Candidate-width masking later restores the exact
    finfo.min sentinel contract."""
    s = jnp.dot(
        u, t_ref[:, j * tn:(j + 1) * tn],
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    m32 = m_ref[:, j * (tn // 8):(j + 1) * (tn // 8)].astype(jnp.int32)
    bits = jnp.concatenate([(m32 >> k) & 1 for k in range(8)], axis=1)
    if arith:
        big = jnp.asarray(jnp.finfo(jnp.bfloat16).max, jnp.bfloat16)
        return s - bits.astype(jnp.bfloat16) * big
    neg = jnp.asarray(jnp.finfo(jnp.bfloat16).min, jnp.bfloat16)
    return jnp.where(bits != 0, neg, s)


def _fold_kernel(u_ref, t_ref, m_ref, g_ref, *, bt, tn, nt, group,
                 arith=False):
    u = u_ref[:]
    outs = []
    for j in range(nt):
        s = _masked_tile(u, t_ref, m_ref, j, bt=bt, tn=tn, arith=arith)
        s3 = s.reshape(bt, tn // group, group)
        outs.append(jnp.max(s3, axis=-1))
    g_ref[:] = jnp.concatenate(outs, axis=1)


def _cand_kernel(gidx_ref, u_ref, t_ref, m_ref, c_ref, *, bt, tn, nt, group, kp):
    """Gather the kp winning groups' 128 raw score lanes AND their 128
    mask bytes via one-hot MXU contractions, then mask at candidate width.

    The full (bt, tn) mask unpack + select that dominated the v1 kernel's
    VPU time is avoided: in the planar layout a group's 128 bits live in
    128 consecutive BYTES (tile byte-lane (g%8)*128 ..), all at bit
    position (g//8)%8, so gathering bytes with the same one-hot pattern as
    the scores and shifting once per candidate does the mask at
    kp*group width instead of tn."""
    gt = tn // group
    u = u_ref[:]
    gidx = gidx_ref[:]                                   # (bt, kp) int32
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (bt, kp, gt), 2)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (bt, kp, gt // 8), 2)
    acc = jnp.zeros((bt, kp, group), jnp.float32)
    accm = jnp.zeros((bt, kp, group), jnp.float32)
    for j in range(nt):
        s = jnp.dot(
            u, t_ref[:, j * tn:(j + 1) * tn],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        s3 = s.reshape(bt, gt, group)
        rel = gidx - j * gt
        # groups outside this tile match no iota lane -> all-zero rows;
        # each group id selects lanes from exactly one tile, so summing
        # tile contributions is the gather
        oh = (iota_g == rel[:, :, None]).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh, s3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # mask bytes: tile j holds tn/8 bytes = gt/8 blocks of 128; group
        # g (local l = g - j*gt) owns byte block l%8 at bit plane l//8
        # Mosaic has no uint8->bf16 cast; widen to int32 first
        mb = (
            m_ref[:, j * (tn // 8):(j + 1) * (tn // 8)]
            .astype(jnp.int32)
            .astype(jnp.bfloat16)
        )
        m3 = mb.reshape(bt, gt // 8, group)
        # gate folded into the compared value (out-of-tile -> -1, matching
        # no iota lane): Mosaic cannot minor-dim-broadcast i1 vectors
        sel = jnp.where((rel >= 0) & (rel < gt), rel % 8, -1)
        ohb = iota_b == sel[:, :, None]
        accm = accm + jax.lax.dot_general(
            ohb.astype(jnp.bfloat16), m3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    # bit plane of each candidate group: (g mod gt) // 8, same for all of
    # its 128 lanes. Bytes are exact small ints in f32.
    kbit = (gidx % gt) // 8                              # (bt, kp)
    bits = (accm.astype(jnp.int32) >> kbit[:, :, None]) & 1
    cand = jnp.where(
        bits != 0,
        jnp.asarray(jnp.finfo(jnp.bfloat16).min, jnp.bfloat16),
        acc.astype(jnp.bfloat16),
    )
    c_ref[:] = cand.reshape(bt, kp * group)


def _cand_kernel_slim(gidx_ref, u_ref, t_ref, c_ref, *, bt, tn, nt, group, kp):
    """Score-only candidate gather: the kp winning groups' 128 raw lanes via
    the one-hot MXU contraction, NO mask handling. The caller re-applies the
    bit mask at (bt, kp*group) width outside the kernel with a per-row byte
    gather from the planar mask — (bt, kp*group/8) bytes, ~1/8 of tn — which
    XLA lowers as a plain gather, cheaper than the in-kernel one-hot byte
    contraction it replaces."""
    gt = tn // group
    u = u_ref[:]
    gidx = gidx_ref[:]                                   # (bt, kp) int32
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (bt, kp, gt), 2)
    acc = jnp.zeros((bt, kp, group), jnp.float32)
    for j in range(nt):
        s = jnp.dot(
            u, t_ref[:, j * tn:(j + 1) * tn],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        s3 = s.reshape(bt, gt, group)
        rel = gidx - j * gt
        oh = (iota_g == rel[:, :, None]).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh, s3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    c_ref[:] = acc.astype(jnp.bfloat16).reshape(bt, kp * group)


def _external_mask(cand, gidx, planar_mask, *, group, tn):
    """Apply the planar bit mask to gathered candidates outside the kernel.

    cand: (b, kp*group) bf16 raw scores; gidx: (b, kp) group ids (the
    out-of-range pad id ng force-masks its whole column). Inverse of
    ``pack_planar_mask``'s layout: item i lives in tile T = i // tn at
    in-tile offset r = i % tn, stored at packed column T*(tn/8) + r%(tn/8),
    bit position r // (tn/8). The per-row byte gather is (b, kp*group)
    bytes — ~tn/8 of the in-kernel full-plane unpack — and XLA lowers it
    as a plain gather.
    """
    b, kpg = cand.shape
    tn8 = tn // 8
    lane = jnp.arange(group, dtype=jnp.int32)
    item = (gidx[:, :, None] * group + lane).reshape(b, kpg)
    t_idx = item // tn
    r = item % tn
    bitpos = r // tn8
    col = t_idx * tn8 + r % tn8
    oob = col >= planar_mask.shape[1]
    col = jnp.minimum(col, planar_mask.shape[1] - 1)
    mb = jnp.take_along_axis(planar_mask, col, axis=1).astype(jnp.int32)
    bits = (mb >> bitpos) & 1
    neg = jnp.asarray(jnp.finfo(jnp.bfloat16).min, jnp.bfloat16)
    return jnp.where((bits != 0) | oob, neg, cand)


def fused_grouped_topk(
    u_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    planar_mask: jnp.ndarray,
    *,
    group: int = _GROUP,
    bt: int = _BT,
    fold_arith: bool = False,
    cand_mask: str = "mxu",
    interpret: bool = False,
):
    """Exact masked top-k of ``u_emb @ item_emb.T`` without materializing
    the score matrix.

    u_emb: (B, d) — any float dtype, scored in bf16 (models/base.py
        scores_cached bf16 path).
    item_emb: (n_items, d) — padded internally to the TN tile multiple.
    planar_mask: (B, n_full/8) uint8 from ``pack_planar_mask`` (True bits
        = exclude; pad columns must be marked).
    Returns ``(values, indices)`` — bf16 values (masked rows surface the
    ``finfo(bf16).min`` sentinel, same contract as ``grouped_topk``),
    int32 indices into the unpadded catalog.
    """
    b, d = u_emb.shape
    n_items = item_emb.shape[0]
    nf = n_full_for(n_items)
    nt = nf // TILE_N
    ng = nf // group
    if planar_mask.shape != (b, nf // 8):
        raise ValueError(
            f"planar_mask shape {planar_mask.shape} != {(b, nf // 8)}"
        )
    kp = max(8, -(-k // 8) * 8)

    table = item_emb
    if nf != n_items:
        table = jnp.pad(table, ((0, nf - n_items), (0, 0)))
    table = table.astype(jnp.bfloat16).T          # (d, nf), loop-invariant
    ue = u_emb.astype(jnp.bfloat16)

    b_pad = -(-b // bt) * bt
    if b_pad != b:
        ue = jnp.pad(ue, ((0, b_pad - b), (0, 0)))
        planar_mask = jnp.pad(
            planar_mask, ((0, b_pad - b), (0, 0)), constant_values=255
        )

    vmem = (
        {}
        if interpret
        else dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        )
    )

    gmax = pl.pallas_call(
        partial(_fold_kernel, bt=bt, tn=TILE_N, nt=nt, group=group,
                arith=fold_arith),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, d), lambda i: (i, 0)),
            pl.BlockSpec((d, nf), lambda i: (0, 0)),
            pl.BlockSpec((bt, nf // 8), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, ng), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, ng), jnp.bfloat16),
        interpret=interpret,
        **vmem,
    )(ue, table, planar_mask)

    _, gidx = jax.lax.top_k(gmax, k)                     # (b_pad, k)
    gidx_p = jnp.pad(gidx, ((0, 0), (0, kp - k)), constant_values=ng)

    if cand_mask == "external":
        cand = pl.pallas_call(
            partial(_cand_kernel_slim, bt=bt, tn=TILE_N, nt=nt,
                    group=group, kp=kp),
            grid=(b_pad // bt,),
            in_specs=[
                pl.BlockSpec((bt, kp), lambda i: (i, 0)),
                pl.BlockSpec((bt, d), lambda i: (i, 0)),
                pl.BlockSpec((d, nf), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bt, kp * group), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b_pad, kp * group), jnp.bfloat16),
            interpret=interpret,
            **vmem,
        )(gidx_p, ue, table)
        cand = _external_mask(cand, gidx_p, planar_mask, group=group,
                              tn=TILE_N)
    else:
        cand = pl.pallas_call(
            partial(_cand_kernel, bt=bt, tn=TILE_N, nt=nt, group=group,
                    kp=kp),
            grid=(b_pad // bt,),
            in_specs=[
                pl.BlockSpec((bt, kp), lambda i: (i, 0)),
                pl.BlockSpec((bt, d), lambda i: (i, 0)),
                pl.BlockSpec((d, nf), lambda i: (0, 0)),
                pl.BlockSpec((bt, nf // 8), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bt, kp * group), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b_pad, kp * group), jnp.bfloat16),
            interpret=interpret,
            **vmem,
        )(gidx_p, ue, table, planar_mask)

    flat_cand = cand[:b, : k * group]
    gidx = gidx[:b]
    cand_idx = gidx[:, :, None] * group + jnp.arange(group, dtype=gidx.dtype)
    if k * group >= 32 * k and not interpret:
        # same 16-wide recursion as ops/topk.py — shrinks the final exact
        # sort from k*128 candidates to k*16
        v, pos = grouped_topk(flat_cand, k, group=16)
    else:
        v, pos = jax.lax.top_k(flat_cand, k)
    idx = jnp.take_along_axis(cand_idx.reshape(b, k * group), pos, axis=1)
    return v, idx
