"""grouped_topk must be exactly lax.top_k on wide rows (modulo ties, which
continuous random draws make measure-zero)."""

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.ops.topk import grouped_topk


def test_grouped_topk_matches_lax_wide():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((64, 63001)).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(s, 50)
    v, i = grouped_topk(s, 50)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))


def test_grouped_topk_with_mask_values():
    # masked rows full of -1e10 plus a handful of real scores: the real
    # scores must all surface, in order
    rng = np.random.default_rng(1)
    s = np.full((8, 40000), -1e10, np.float32)
    for r in range(8):
        cols = rng.choice(40000, size=200, replace=False)
        s[r, cols] = rng.standard_normal(200).astype(np.float32)
    v, i = grouped_topk(jnp.asarray(s), 50)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(s), 50)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_grouped_topk_narrow_fallback():
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.standard_normal((4, 500)).astype(np.float32))
    v, i = grouped_topk(s, 50)
    v_ref, i_ref = jax.lax.top_k(s, 50)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_grouped_topk_non_multiple_width():
    # width not a multiple of 128 exercises the -inf pad path
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.standard_normal((16, 63001)).astype(np.float32))
    _, i = grouped_topk(s, 7)
    _, i_ref = jax.lax.top_k(s, 7)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_grouped_topk_packed_mask():
    # fused bit-packed mask must equal mask-then-topk exactly
    rng = np.random.default_rng(5)
    B, N, K = 16, 63001, 50
    s = rng.standard_normal((B, N)).astype(np.float32)
    dense = np.zeros((B, N), bool)
    for r in range(B):
        dense[r, rng.choice(N, size=200, replace=False)] = True
    packed = jnp.asarray(np.packbits(dense, axis=1, bitorder="little"))
    v, i = grouped_topk(jnp.asarray(s), K, packed_mask=packed)
    ref_scores = np.where(dense, -np.inf, s)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(ref_scores), K)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))


def test_grouped_topk_packed_mask_narrow():
    rng = np.random.default_rng(6)
    B, N, K = 4, 900, 20
    s = rng.standard_normal((B, N)).astype(np.float32)
    dense = np.zeros((B, N), bool)
    for r in range(B):
        dense[r, rng.choice(N, size=30, replace=False)] = True
    packed = jnp.asarray(np.packbits(dense, axis=1, bitorder="little"))
    _, i = grouped_topk(jnp.asarray(s), K, packed_mask=packed)
    _, i_ref = jax.lax.top_k(jnp.asarray(np.where(dense, -np.inf, s)), K)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_candidate_extract_pallas_interpret():
    # the Pallas candidate kernel (interpret mode on CPU) must match the
    # XLA gather+top_k stage exactly
    from genmmrec_tpu.ops.topk import _candidate_extract_pallas

    rng = np.random.default_rng(7)
    b, g, group, k = 48, 493, 128, 50
    sm3 = jnp.asarray(rng.standard_normal((b, g, group)).astype(np.float32))
    gmax = sm3.max(-1)
    _, gidx = jax.lax.top_k(gmax, k)

    v, i = _candidate_extract_pallas(sm3, gidx, k, group, interpret=True)

    cand = jnp.take_along_axis(sm3, gidx[:, :, None], axis=1)
    cand_idx = gidx[:, :, None] * group + jnp.arange(group, dtype=gidx.dtype)
    v_ref, pos = jax.lax.top_k(cand.reshape(b, k * group), k)
    i_ref = jnp.take_along_axis(cand_idx.reshape(b, k * group), pos, axis=1)

    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))


def test_grouped_topk_bf16():
    rng = np.random.default_rng(4)
    s32 = rng.standard_normal((8, 20000)).astype(np.float32)
    s = jnp.asarray(s32).astype(jnp.bfloat16)
    v, i = grouped_topk(s, 20)
    v_ref, i_ref = jax.lax.top_k(s, 20)
    # bf16 rounding creates real ties; compare the selected VALUE sets
    np.testing.assert_array_equal(
        np.sort(np.asarray(v, np.float32)), np.sort(np.asarray(v_ref, np.float32))
    )
