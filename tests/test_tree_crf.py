"""Tree CRF parity vs brute-force enumeration of projective trees,
plus kmeans length-bucketing semantics.

Mirrors the strategy of ``tests/test_crf.py``: enumerate every legal
structure for small n and compare logZ / marginals / losses exactly.
Reference behavior: ``/root/reference/flair/parser/utils/alg.py:10-179``
(kmeans, crf, inside)."""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbner_tpu.data.encode import kmeans
from kbner_tpu.ops.tree_crf import (
    tree_crf_inside,
    tree_crf_loss,
    tree_crf_marginals,
)


def ancestors(heads, x):
    """Head chain of x up to ROOT (heads[d-1] = head of word d)."""
    out = []
    while x != 0:
        x = heads[x - 1]
        out.append(x)
        if len(out) > len(heads) + 1:  # cycle guard
            return None
    return out


def projective_trees(n):
    """All single-root projective head assignments for grid size n
    (ROOT=0, words 1..n-1)."""
    trees = []
    for heads in itertools.product(range(n), repeat=n - 1):
        if sum(1 for h in heads if h == 0) != 1:
            continue  # single root child
        if any(h == d + 1 for d, h in enumerate(heads)):
            continue  # self loop
        chains = [ancestors(heads, d) for d in range(1, n)]
        if any(c is None for c in chains):
            continue  # cycle
        ok = True
        for d in range(1, n):
            h = heads[d - 1]
            lo, hi = min(h, d), max(h, d)
            for k in range(lo + 1, hi):
                # projectivity: h dominates every word inside the arc span
                if h != k and h not in ancestors(heads, k):
                    ok = False
                    break
            if not ok:
                break
        if ok:
            trees.append(heads)
    return trees


def logsumexp(xs):
    xs = np.asarray(xs, dtype=np.float64)
    m = xs.max()
    return m + np.log(np.exp(xs - m).sum())


def tree_score(scores, heads):
    return sum(scores[d, heads[d - 1]] for d in range(1, len(heads) + 1))


def brute_logZ(scores, length, allowed=None):
    """scores [n, n] (d, h); length = #words; allowed[d, h] optional."""
    vals = []
    for heads in projective_trees(length + 1):
        if allowed is not None and any(
                not allowed[d, heads[d - 1]]
                for d in range(1, length + 1)):
            continue
        vals.append(tree_score(scores, heads))
    return logsumexp(vals)


def brute_marginals(scores, length):
    n = scores.shape[0]
    trees = projective_trees(length + 1)
    ws = np.asarray([tree_score(scores, t) for t in trees], np.float64)
    p = np.exp(ws - logsumexp(ws))
    marg = np.zeros((n, n))
    for t, pi in zip(trees, p):
        for d in range(1, length + 1):
            marg[d, t[d - 1]] += pi
    return marg


@pytest.fixture
def batch():
    rng = np.random.RandomState(7)
    n = 6  # grid size incl ROOT, padded
    B = 3
    scores = rng.randn(B, n, n).astype(np.float32)
    lens = [5, 3, 1]
    word_mask = np.zeros((B, n - 1), np.int32)
    for b, L in enumerate(lens):
        word_mask[b, :L] = 1
    return scores, word_mask, lens


def test_logZ_matches_brute_force(batch):
    scores, word_mask, lens = batch
    logZ = np.asarray(tree_crf_inside(
        jnp.asarray(scores), jnp.asarray(word_mask)))
    for b, L in enumerate(lens):
        want = brute_logZ(scores[b].astype(np.float64), L)
        assert abs(logZ[b] - want) < 1e-3, (b, logZ[b], want)


def test_marginals_match_brute_force(batch):
    scores, word_mask, lens = batch
    marg = np.asarray(tree_crf_marginals(
        jnp.asarray(scores), jnp.asarray(word_mask)))
    for b, L in enumerate(lens):
        want = brute_marginals(scores[b].astype(np.float64), L)
        np.testing.assert_allclose(
            marg[b, : L + 1, : L + 1], want[: L + 1, : L + 1],
            atol=1e-4)
        # no probability mass on arcs outside the sentence
        assert marg[b, L + 1:, :].sum() < 1e-5
        # each real word has exactly one head in expectation
        np.testing.assert_allclose(
            marg[b, 1: L + 1].sum(axis=1), 1.0, atol=1e-4)


def test_loss_is_nll_of_gold_tree(batch):
    scores, word_mask, lens = batch
    # gold: word 1 is the root child, every other word attaches to word 1
    # (a projective star) — legal for all lens here
    n = scores.shape[1]
    heads = np.zeros((scores.shape[0], n - 1), np.int32)
    heads[:, 0] = 0
    heads[:, 1:] = 1
    loss = np.asarray(tree_crf_loss(
        jnp.asarray(scores), jnp.asarray(word_mask), jnp.asarray(heads)))
    for b, L in enumerate(lens):
        gold = tree_score(scores[b].astype(np.float64),
                          tuple(heads[b][:L]))
        want = brute_logZ(scores[b].astype(np.float64), L) - gold
        assert abs(loss[b] - want) < 1e-3
        assert loss[b] > -1e-4  # valid -log prob


def test_partial_loss_marginalizes_unannotated(batch):
    scores, word_mask, lens = batch
    B, n, _ = scores.shape
    heads = np.full((B, n - 1), -1, np.int32)
    heads[:, 0] = 0  # only word 1's head annotated
    loss = np.asarray(tree_crf_loss(
        jnp.asarray(scores), jnp.asarray(word_mask), jnp.asarray(heads),
        partial=True))
    for b, L in enumerate(lens):
        allowed = np.ones((n, n), bool)
        allowed[1, :] = False
        allowed[1, 0] = True
        want = (brute_logZ(scores[b].astype(np.float64), L)
                - brute_logZ(scores[b].astype(np.float64), L, allowed))
        assert abs(loss[b] - want) < 1e-3
        assert loss[b] > -1e-4


def test_loss_is_differentiable_and_jittable(batch):
    scores, word_mask, _ = batch

    @jax.jit
    def f(s):
        return jnp.sum(tree_crf_loss(
            s, jnp.asarray(word_mask),
            jnp.zeros((s.shape[0], s.shape[1] - 1), jnp.int32)))

    g = jax.grad(f)(jnp.asarray(scores))
    assert np.all(np.isfinite(np.asarray(g)))


def test_kmeans_buckets():
    lengths = [3, 3, 3, 10, 11, 12, 30, 31, 29, 30, 5]
    centroids, clusters = kmeans(lengths, 3, seed=0)
    # every datapoint assigned exactly once
    all_idx = sorted(i for c in clusters for i in c)
    assert all_idx == list(range(len(lengths)))
    assert len(centroids) == len(clusters) <= 3
    # clusters group similar lengths: the ~30s end up together
    big = max(clusters, key=lambda c: np.mean([lengths[i] for i in c]))
    assert sorted(big) == [6, 7, 8, 9]


def test_kmeans_requires_enough_distinct_values():
    with pytest.raises(ValueError):
        kmeans([5, 5, 5], 2)
