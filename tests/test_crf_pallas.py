"""Pallas CRF forward kernel parity with the lax.scan implementation."""

import numpy as np
import pytest

from kbner_tpu.ops.crf import crf_forward
from kbner_tpu.ops.crf_pallas import crf_forward_pallas


def test_pallas_forward_matches_scan():
    rng = np.random.RandomState(0)
    B, T, K = 5, 7, 9
    START, STOP = K - 2, K - 1
    emissions = rng.randn(B, T, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    lengths = rng.randint(1, T + 1, size=B)
    lengths[0] = T
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int32)

    ref = np.asarray(crf_forward(emissions, mask, transitions, START, STOP))
    got = np.asarray(crf_forward_pallas(
        emissions, mask, transitions, START, STOP))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_forward_interior_masking():
    rng = np.random.RandomState(1)
    B, T, K = 2, 6, 6
    START, STOP = K - 2, K - 1
    emissions = rng.randn(B, T, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    mask = np.array([[1, 1, 0, 1, 0, 1], [1, 0, 1, 1, 1, 0]], np.int32)
    ref = np.asarray(crf_forward(emissions, mask, transitions, START, STOP))
    got = np.asarray(crf_forward_pallas(
        emissions, mask, transitions, START, STOP))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_viterbi_matches_scan():
    from kbner_tpu.ops.crf_pallas import crf_decode_pallas

    rng = np.random.RandomState(2)
    B, T, K = 5, 9, 7
    START, STOP = K - 2, K - 1
    emissions = rng.randn(B, T, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    lengths = rng.randint(1, T + 1, size=B)
    lengths[0] = T
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int32)
    mask[0, 4] = 0  # interior X-mask too

    from kbner_tpu.ops.crf import crf_decode

    ref_tags, ref_scores = crf_decode(
        emissions, mask, transitions, START, STOP)
    got_tags, got_scores = crf_decode_pallas(
        emissions, mask, transitions, START, STOP)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(ref_scores), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_tags), np.asarray(ref_tags))


def test_pallas_viterbi_single_step():
    from kbner_tpu.ops.crf_pallas import crf_decode_pallas
    from kbner_tpu.ops.crf import crf_decode

    rng = np.random.RandomState(3)
    K = 5
    emissions = rng.randn(2, 1, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    mask = np.ones((2, 1), np.int32)
    ref = crf_decode(emissions, mask, transitions, K - 2, K - 1)
    got = crf_decode_pallas(emissions, mask, transitions, K - 2, K - 1)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
