"""exact_topk_set == lax.top_k set equality (ops/topk.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dafne_tpu.ops.topk import exact_topk_set


def _sets_match(scores, k):
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(scores), k)
    v_got, i_got = exact_topk_set(jnp.asarray(scores), k)
    v_ref, i_ref = np.asarray(v_ref), np.asarray(i_ref)
    v_got, i_got = np.asarray(v_got), np.asarray(i_got)
    assert v_got.shape == v_ref.shape
    for r in range(scores.reshape(-1, scores.shape[-1]).shape[0]):
        ri = i_ref.reshape(-1, k)[r]
        gi = i_got.reshape(-1, k)[r]
        assert set(ri.tolist()) == set(gi.tolist()), (
            r, sorted(set(ri) - set(gi)), sorted(set(gi) - set(ri)),
        )
        # ascending-index order contract
        assert (np.diff(gi) > 0).all()
        np.testing.assert_array_equal(
            np.sort(v_got.reshape(-1, k)[r]), np.sort(v_ref.reshape(-1, k)[r])
        )


def test_random_uniform():
    rng = np.random.default_rng(0)
    s = rng.uniform(0, 1, (4, 1000)).astype(np.float32)
    _sets_match(s, 100)


def test_heavy_ties_and_zeros():
    rng = np.random.default_rng(1)
    # quantized scores -> massive exact ties, plus many exact zeros
    s = (rng.integers(0, 8, (6, 500)) / 8.0).astype(np.float32)
    s[rng.uniform(size=s.shape) < 0.5] = 0.0
    _sets_match(s, 64)


def test_fewer_positives_than_k():
    s = np.zeros((3, 200), np.float32)
    s[0, [5, 17]] = [0.3, 0.9]
    s[1, 100] = 1.0
    _sets_match(s, 50)


def test_k_equals_n_and_large_k():
    rng = np.random.default_rng(2)
    s = rng.uniform(0, 1, (2, 64)).astype(np.float32)
    _sets_match(s, 64)
    _sets_match(s, 63)
    _sets_match(s, 1)


def test_denormal_and_extreme_values():
    s = np.asarray(
        [[1e-38, 1e38, 0.0, 5e-39, 1.0, 1.0, 1.0, 2e-38] + [0.0] * 8],
        np.float32,
    )
    _sets_match(s, 4)


def test_decode_scale_shapes():
    # the two real call shapes: per-level (2000 of 245760) downsized for CPU
    # test speed, and global cap (4096 of 9856)
    rng = np.random.default_rng(3)
    s = rng.uniform(0, 1, (2, 24576)).astype(np.float32)
    s[s < 0.9] = 0.0  # sparse like thresholded cls scores
    _sets_match(s, 2000)
    s2 = rng.uniform(0, 1, (2, 9856)).astype(np.float32)
    _sets_match(s2, 4096)


def test_scores_above_two_no_midpoint_overflow():
    # regression: with >= k entries >= 2.0 (bit patterns > 2^30) the naive
    # (lo + hi) >> 1 midpoint wraps int32 and corrupts the bisection —
    # decode only feeds [0, 1] scores, but the module contract is "any
    # non-negative f32"
    rng = np.random.default_rng(5)
    s = rng.uniform(0, 10, (4, 400)).astype(np.float32)
    _sets_match(s, 10)
    _sets_match(s, 128)
    s2 = rng.uniform(1e30, 1e38, (2, 300)).astype(np.float32)
    _sets_match(s2, 17)


def test_jit_and_grad_free_path():
    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.uniform(0, 1, (3, 512)).astype(np.float32))
    v1, i1 = jax.jit(lambda x: exact_topk_set(x, 99))(s)
    v2, i2 = exact_topk_set(s, 99)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_bitlevel_fuzz_all_digits():
    # radix-specific adversary: random POSITIVE f32 bit patterns (uniform
    # over the full 31-bit space, so every 4-bit digit round carries
    # information), plus rows sharing the top 28 bits so the selection is
    # decided only in the last round, with exact ties at the k-th value
    rng = np.random.default_rng(6)
    raw = rng.integers(1, 2**31, (6, 700), dtype=np.int64).astype(np.int32)
    s = raw.view(np.float32)
    s = np.where(np.isnan(s), np.float32(0.0), s)  # contract: non-NaN
    _sets_match(s, 333)
    base = np.int32(0x3F7F0000)  # shared high digits
    tail = rng.integers(0, 16, (4, 600), dtype=np.int64).astype(np.int32)
    s2 = (base | tail).view(np.float32)
    _sets_match(s2, 123)
