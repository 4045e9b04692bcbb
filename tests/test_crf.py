"""CRF kernel tests against a brute-force NumPy reference.

Validates: partition function, gold-path score, NLL, Viterbi, marginals,
and — crucially — that transition-skip masking is exactly equivalent to the
reference's sequence-compaction approach to X-token removal
(sequence_tagger_model.py:2448-2506).
"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbner_tpu.ops.crf import (
    crf_decode,
    crf_forward,
    crf_gold_score,
    crf_marginals,
    crf_neg_log_likelihood,
)

K = 5  # tags incl START/STOP
START, STOP = K - 2, K - 1


def brute_force(emissions, transitions, length):
    """Enumerate all tag paths of given length.

    Enumerates over the full tagset including START/STOP: the CRF sums over
    all K states, and (as in the reference) paths through START/STOP are
    excluded by -10000 transition constraints at the model level, not
    structurally (sequence_tagger_model.py:390-410).
    """
    real_tags = range(K)
    paths, scores = [], []
    for path in itertools.product(real_tags, repeat=length):
        s = transitions[START, path[0]] + emissions[0, path[0]]
        for t in range(1, length):
            s += transitions[path[t - 1], path[t]] + emissions[t, path[t]]
        s += transitions[path[-1], STOP]
        paths.append(path)
        scores.append(s)
    return paths, np.array(scores)


def logsumexp(x):
    m = np.max(x)
    return m + np.log(np.sum(np.exp(x - m)))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, T = 3, 4
    emissions = rng.randn(B, T, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    lengths = np.array([4, 3, 2])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int32)
    tags = rng.randint(0, K - 2, size=(B, T)).astype(np.int32)
    return emissions, transitions, mask, tags, lengths


def test_forward_matches_brute_force(setup):
    emissions, transitions, mask, tags, lengths = setup
    log_z = np.asarray(
        crf_forward(emissions, mask, transitions, START, STOP))
    for b in range(len(lengths)):
        _, scores = brute_force(emissions[b], transitions, lengths[b])
        assert log_z[b] == pytest.approx(logsumexp(scores), abs=1e-4)


def test_gold_score_matches_brute_force(setup):
    emissions, transitions, mask, tags, lengths = setup
    gold = np.asarray(
        crf_gold_score(emissions, tags, mask, transitions, START, STOP))
    for b in range(len(lengths)):
        L = lengths[b]
        path = tuple(tags[b, :L])
        s = transitions[START, path[0]] + emissions[b, 0, path[0]]
        for t in range(1, L):
            s += transitions[path[t - 1], path[t]] + emissions[b, t, path[t]]
        s += transitions[path[-1], STOP]
        assert gold[b] == pytest.approx(s, abs=1e-4)


def test_nll_is_valid_log_prob(setup):
    emissions, transitions, mask, tags, lengths = setup
    nll = np.asarray(crf_neg_log_likelihood(
        emissions, tags, mask, transitions, START, STOP))
    assert np.all(nll > 0)  # p(gold) < 1 for random scores
    for b in range(len(lengths)):
        paths, scores = brute_force(emissions[b], transitions, lengths[b])
        gold_path = tuple(tags[b, : lengths[b]])
        p = np.exp(scores[paths.index(gold_path)] - logsumexp(scores))
        assert nll[b] == pytest.approx(-np.log(p), abs=1e-4)


def test_viterbi_matches_brute_force(setup):
    emissions, transitions, mask, tags, lengths = setup
    decoded, best_score = crf_decode(
        emissions, mask, transitions, START, STOP)
    decoded, best_score = np.asarray(decoded), np.asarray(best_score)
    for b in range(len(lengths)):
        paths, scores = brute_force(emissions[b], transitions, lengths[b])
        best = paths[int(np.argmax(scores))]
        assert tuple(decoded[b, : lengths[b]]) == best
        assert best_score[b] == pytest.approx(np.max(scores), abs=1e-4)


def test_marginals_match_brute_force(setup):
    emissions, transitions, mask, tags, lengths = setup
    marg = np.asarray(crf_marginals(
        emissions, mask, transitions, START, STOP))
    b, L = 0, int(lengths[0])
    paths, scores = brute_force(emissions[b], transitions, L)
    probs = np.exp(scores - logsumexp(scores))
    expected = np.zeros((L, K))
    for path, p in zip(paths, probs):
        for t, k in enumerate(path):
            expected[t, k] += p
    np.testing.assert_allclose(marg[b, :L], expected, atol=1e-4)
    # rows sum to 1 at real positions
    np.testing.assert_allclose(marg[b, :L].sum(-1), 1.0, atol=1e-4)


def test_transition_skip_equals_compaction():
    """Masking interior positions == physically removing them (the reference's
    remove_x compaction)."""
    rng = np.random.RandomState(1)
    T = 6
    emissions = rng.randn(1, T, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    tags = rng.randint(0, K - 2, size=(1, T)).astype(np.int32)
    # mask out positions 2 and 4 (as if they were S-X context tokens)
    mask = np.array([[1, 1, 0, 1, 0, 1]], dtype=np.int32)
    keep = [0, 1, 3, 5]

    compact_emissions = emissions[:, keep]
    compact_tags = tags[:, keep]
    compact_mask = np.ones((1, len(keep)), dtype=np.int32)

    for fn in (crf_forward, ):
        masked = np.asarray(fn(emissions, mask, transitions, START, STOP))
        compact = np.asarray(
            fn(compact_emissions, compact_mask, transitions, START, STOP))
        np.testing.assert_allclose(masked, compact, atol=1e-5)

    nll_masked = np.asarray(crf_neg_log_likelihood(
        emissions, tags, mask, transitions, START, STOP))
    nll_compact = np.asarray(crf_neg_log_likelihood(
        compact_emissions, compact_tags, compact_mask, transitions, START, STOP))
    np.testing.assert_allclose(nll_masked, nll_compact, atol=1e-5)

    dec_masked, score_masked = crf_decode(
        emissions, mask, transitions, START, STOP, pad_tag=0)
    dec_compact, score_compact = crf_decode(
        compact_emissions, compact_mask, transitions, START, STOP)
    np.testing.assert_allclose(
        np.asarray(score_masked), np.asarray(score_compact), atol=1e-5)
    assert np.asarray(dec_masked)[0, keep].tolist() == \
        np.asarray(dec_compact)[0].tolist()


def test_nll_is_differentiable_and_jittable(setup):
    emissions, transitions, mask, tags, lengths = setup

    @jax.jit
    def loss_fn(em, tr):
        return jnp.mean(crf_neg_log_likelihood(em, tags, mask, tr, START, STOP))

    g_em, g_tr = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(emissions), jnp.asarray(transitions))
    assert np.all(np.isfinite(np.asarray(g_em)))
    assert np.all(np.isfinite(np.asarray(g_tr)))
    # grads at padded positions must be zero
    padded = np.asarray(g_em)[np.asarray(mask) == 0]
    np.testing.assert_allclose(padded, 0.0, atol=1e-6)


def test_decode_single_timestep():
    rng = np.random.RandomState(2)
    emissions = rng.randn(2, 1, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    mask = np.ones((2, 1), dtype=np.int32)
    decoded, score = crf_decode(emissions, mask, transitions, START, STOP)
    for b in range(2):
        scores = [transitions[START, k] + emissions[b, 0, k] +
                  transitions[k, STOP] for k in range(K)]
        assert int(np.asarray(decoded)[b, 0]) == int(np.argmax(scores))
