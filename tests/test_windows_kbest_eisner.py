"""Sliding windows, k-best KD loss, ScalarMix, Eisner decoding."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kbner_tpu.data import HashTokenizer, encode_batch, load_column_corpus
from kbner_tpu.data.conll import SentenceRecord
from kbner_tpu.data.windows import (
    predict_long,
    split_long_record,
    stitch_window_predictions,
)
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.models.biaffine import chu_liu_edmonds, eisner_decode
from kbner_tpu.models.embedders import ScalarMix
from kbner_tpu.ops.crf import crf_decode_nbest

TOK = HashTokenizer(vocab_size=997)


# -- windows ------------------------------------------------------------------

def test_split_short_record_passthrough():
    rec = SentenceRecord(tokens=["a", "b"], tags={"ner": ["O", "O"]})
    pieces = split_long_record(rec, TOK, max_subtokens=510)
    assert len(pieces) == 1 and pieces[0][1] == 0


def test_split_long_record_overlap_and_coverage():
    tokens = [f"w{i}" for i in range(100)]
    rec = SentenceRecord(tokens=tokens, tags={"ner": ["O"] * 100})
    pieces = split_long_record(rec, TOK, max_subtokens=34, stride_words=8)
    assert len(pieces) > 2
    # coverage: every word is inside some chunk
    covered = set()
    for chunk, off in pieces:
        covered.update(range(off, off + len(chunk.tokens)))
    assert covered == set(range(100))
    # consecutive chunks overlap by stride
    for (c1, o1), (c2, o2) in zip(pieces, pieces[1:]):
        assert o2 < o1 + len(c1.tokens)


def test_stitch_seam_halving():
    # two chunks, overlap of 4 at positions 6..9: left supplies 6,7;
    # right supplies 8,9
    left = (["L"] * 10, 0, 10)
    right = (["R"] * 10, 6, 10)
    out = stitch_window_predictions([left, right], 16)
    assert out[:8] == ["L"] * 8
    assert out[8:] == ["R"] * 8


def test_predict_long_end_to_end():
    corpus = load_column_corpus(
        "tests/fixtures/ner_toy", {0: "text", 1: "ner"},
        comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    eb = encode_batch(corpus.train[:2], TOK, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in eb.arrays().items()})
    from kbner_tpu.train import FinetuneTrainer

    trainer = FinetuneTrainer(model, params, corpus, TOK, tag_dict)
    long_rec = SentenceRecord(
        tokens=[f"tok{i}" for i in range(80)], tags={"ner": ["O"] * 80})
    preds = predict_long(trainer, [long_rec] + corpus.train[:1],
                         max_subtokens=40, stride_words=6)
    assert len(preds[0]) == 80
    assert len(preds[1]) == len(corpus.train[0].tokens)


# -- k-best KD ------------------------------------------------------------------

def test_kbest_distill_loss_runs_and_prefers_teacher_paths():
    corpus = load_column_corpus(
        "tests/fixtures/ner_toy", {0: "text", 1: "ner"},
        comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    eb = encode_batch(corpus.train[:2], TOK, tag_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    model, params = init_tagger(cfg, jax.random.PRNGKey(0), arrays)

    # teacher paths: gold as the 1-best + a perturbed 2nd best
    gold = np.asarray(eb.tag_ids)
    second = gold.copy()
    second[:, 0] = 0
    paths = jnp.asarray(np.stack([gold, second], axis=1))  # [B, 2, W]
    weights = jnp.asarray(np.tile([0.7, 0.3], (gold.shape[0], 1)))
    loss = model.apply(
        params, arrays, paths, weights, deterministic=True,
        interpolation=0.5, method=model.kbest_distill_loss)
    assert np.isfinite(float(loss))


# -- ScalarMix --------------------------------------------------------------------

def test_scalar_mix():
    stack = jnp.asarray(np.random.RandomState(0).randn(3, 2, 4, 8))
    sm = ScalarMix(num_layers=3)
    params = sm.init(jax.random.PRNGKey(0), stack)
    out = sm.apply(params, stack)
    assert out.shape == (2, 4, 8)
    # zero-init weights -> uniform average, gamma=1
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(stack.mean(0)), atol=1e-5)


# -- Eisner ------------------------------------------------------------------------

def brute_force_best_tree(scores, projective_only):
    """Enumerate all head assignments, filter trees (and projectivity)."""
    n = scores.shape[0]

    def is_tree(heads):
        # all nodes reach root without cycles
        for start in range(1, n):
            seen, node = set(), start
            while node != 0:
                if node in seen:
                    return False
                seen.add(node)
                node = heads[node]
        return True

    def is_projective(heads):
        for d in range(1, n):
            h = heads[d]
            lo, hi = min(d, h), max(d, h)
            for k in range(lo + 1, hi):
                a = heads[k]
                if a < lo or a > hi:
                    return False
            # no arc from outside into (lo, hi)
            for k in range(1, n):
                if lo < k < hi:
                    continue
                a = heads[k]
                if lo < a < hi and k not in (lo, hi):
                    return False
        return True

    best, best_heads = -np.inf, None
    for combo in itertools.product(range(n), repeat=n - 1):
        heads = np.asarray((0,) + combo)
        if not is_tree(heads):
            continue
        if projective_only and not is_projective(heads):
            continue
        s = sum(scores[d, heads[d]] for d in range(1, n))
        if s > best:
            best, best_heads = s, heads
    return best_heads, best


def test_eisner_matches_brute_force():
    rng = np.random.RandomState(3)
    for trial in range(4):
        n = 5
        scores = rng.randn(n, n)
        np.fill_diagonal(scores, -1e9)
        scores[0, :] = -1e9
        heads = eisner_decode(scores)
        ref_heads, ref_score = brute_force_best_tree(
            scores, projective_only=True)
        got_score = sum(scores[d, heads[d]] for d in range(1, n))
        assert got_score == pytest.approx(ref_score, abs=1e-6), trial


def test_eisner_vs_cle_on_projective_case():
    # when the unconstrained MST is projective, both decoders agree
    scores = np.full((4, 4), -1e9)
    scores[1, 2] = 5.0
    scores[2, 0] = 4.0
    scores[3, 2] = 3.0
    e = eisner_decode(scores)
    c = chu_liu_edmonds(scores)
    assert e[1:].tolist() == c[1:].tolist() == [2, 0, 2]
