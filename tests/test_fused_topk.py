"""Fused score+mask+top-k kernel (ops/fused_topk.py) vs the explicit
score-plane path, in Pallas interpret mode on the CPU test mesh.

The fused kernel replaces the reference full-sort eval hot path
(``src/common/trainer.py:379-387``) without ever writing the (B, n)
score matrix to HBM; these tests pin its exact-match contract against a
straightforward bf16 score+mask+lax.top_k oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genmmrec_tpu.ops.fused_topk import (
    TILE_N,
    fused_grouped_topk,
    n_full_for,
    pack_planar_mask,
)


def _unpack_planar(pm: np.ndarray, nf: int, tile_n: int = TILE_N):
    """Invert pack_planar_mask: (B, nf/8) uint8 -> (B, nf) bool."""
    b = pm.shape[0]
    m4 = np.unpackbits(
        pm.reshape(b, nf // tile_n, 1, tile_n // 8),
        axis=2, bitorder="little",
    )
    return m4.reshape(b, nf).astype(bool)


def test_pack_planar_mask_roundtrip():
    rng = np.random.default_rng(0)
    n = 2 * TILE_N + 300            # exercises the pad-to-tile path
    dense = rng.random((4, n)) < 0.1
    pm = pack_planar_mask(dense)
    nf = n_full_for(n)
    assert pm.shape == (4, nf // 8)
    rec = _unpack_planar(pm, nf)
    np.testing.assert_array_equal(rec[:, :n], dense)
    assert rec[:, n:].all(), "pad columns must be marked masked"


def _oracle(u, it, k, dense):
    """bf16 score + sentinel mask + exact lax.top_k, matching the unfused
    eval path's numerics."""
    s = jnp.dot(
        u.astype(jnp.bfloat16), it.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    neg = jnp.asarray(jnp.finfo(jnp.bfloat16).min, jnp.bfloat16)
    s = jnp.where(jnp.asarray(dense), neg, s)
    return jax.lax.top_k(s, k)


@pytest.mark.parametrize("n_items,k", [(TILE_N - 73, 10), (TILE_N + 500, 20)])
def test_fused_matches_oracle(n_items, k):
    rng = np.random.default_rng(7)
    b = 9                            # odd, exercises user-tile padding
    d = 64
    u = jnp.asarray(rng.standard_normal((b, d), np.float32))
    it = jnp.asarray(rng.standard_normal((n_items, d), np.float32))
    dense = rng.random((b, n_items)) < 0.05
    pm = jnp.asarray(pack_planar_mask(dense))

    v_f, i_f = fused_grouped_topk(u, it, k, pm, interpret=True)
    v_o, i_o = _oracle(u, it, k, dense)

    v_f = np.asarray(v_f, np.float32)
    v_o = np.asarray(v_o, np.float32)
    np.testing.assert_array_equal(v_f, v_o)

    # indices must agree except across ties at equal bf16 value
    i_f, i_o = np.asarray(i_f), np.asarray(i_o)
    diff = i_f != i_o
    if diff.any():
        rows, cols = np.nonzero(diff)
        assert (v_f[rows, cols] == v_o[rows, cols]).all()
    # fused indices must never point at a masked or padded item
    assert (i_f < n_items).all()
    assert not dense[np.arange(b)[:, None], i_f].any()


def test_fused_mask_dominated_rows():
    """Rows with fewer than k unmasked items surface the bf16-min sentinel
    in the value tail and still return in-catalog indices."""
    rng = np.random.default_rng(3)
    b, d, k = 4, 32, 12
    n_items = 700
    u = jnp.asarray(rng.standard_normal((b, d), np.float32))
    it = jnp.asarray(rng.standard_normal((n_items, d), np.float32))
    dense = np.ones((b, n_items), bool)
    keep = rng.integers(0, n_items, (b, 5))       # only ~5 unmasked per row
    dense[np.arange(b)[:, None], keep] = False
    pm = jnp.asarray(pack_planar_mask(dense))

    v, i = fused_grouped_topk(u, it, k, pm, interpret=True)
    v = np.asarray(v, np.float32)
    i = np.asarray(i)
    sent = float(jnp.finfo(jnp.bfloat16).min)
    n_keep = (~dense).sum(axis=1)
    for r in range(b):
        assert (v[r, n_keep[r]:] == sent).all()
        real = i[r, : n_keep[r]]
        assert not dense[r, real].any()
    assert (i < n_items).all()


@pytest.mark.parametrize("fold_arith,cand_mask", [
    (True, "mxu"), (False, "external"), (True, "external"),
])
def test_fused_variants_match_oracle(fold_arith, cand_mask):
    """The tuning-knob variants (arith fold mask, external candidate mask)
    keep the exact-match contract of the default kernel."""
    rng = np.random.default_rng(11)
    b, d, k = 7, 64, 17
    n_items = TILE_N + 321
    u = jnp.asarray(rng.standard_normal((b, d), np.float32))
    it = jnp.asarray(rng.standard_normal((n_items, d), np.float32))
    dense = rng.random((b, n_items)) < 0.05
    pm = jnp.asarray(pack_planar_mask(dense))

    v_f, i_f = fused_grouped_topk(
        u, it, k, pm, interpret=True,
        fold_arith=fold_arith, cand_mask=cand_mask,
    )
    v_o, i_o = _oracle(u, it, k, dense)
    v_f = np.asarray(v_f, np.float32)
    v_o = np.asarray(v_o, np.float32)
    np.testing.assert_array_equal(v_f, v_o)
    i_f, i_o = np.asarray(i_f), np.asarray(i_o)
    diff = i_f != i_o
    if diff.any():
        rows, cols = np.nonzero(diff)
        assert (v_f[rows, cols] == v_o[rows, cols]).all()
    assert (i_f < n_items).all()
    assert not dense[np.arange(b)[:, None], i_f].any()


@pytest.mark.parametrize("cand_mask", ["mxu", "external"])
def test_fused_variants_mask_dominated(cand_mask):
    rng = np.random.default_rng(5)
    b, d, k = 3, 32, 9
    n_items = 450
    u = jnp.asarray(rng.standard_normal((b, d), np.float32))
    it = jnp.asarray(rng.standard_normal((n_items, d), np.float32))
    dense = np.ones((b, n_items), bool)
    keep = rng.integers(0, n_items, (b, 4))
    dense[np.arange(b)[:, None], keep] = False
    pm = jnp.asarray(pack_planar_mask(dense))
    v, i = fused_grouped_topk(
        u, it, k, pm, interpret=True, fold_arith=True, cand_mask=cand_mask)
    v = np.asarray(v, np.float32)
    i = np.asarray(i)
    sent = float(jnp.finfo(jnp.bfloat16).min)
    n_keep = (~dense).sum(axis=1)
    for r in range(b):
        assert (v[r, n_keep[r]:] == sent).all()
        assert not dense[r, i[r, : n_keep[r]]].any()
    assert (i < n_items).all()
