"""MFVI head, n-best Viterbi, text classifier/regressor tests."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kbner_tpu.data import HashTokenizer, encode_batch
from kbner_tpu.data.conll import SentenceRecord, read_fasttext_file
from kbner_tpu.models import XLMRConfig
from kbner_tpu.models.classifier import (
    TextClassifier,
    TextClassifierConfig,
    TextRegressor,
    TextRegressorConfig,
    build_label_dictionary,
    encode_labels,
)
from kbner_tpu.ops.crf import crf_decode, crf_decode_nbest
from kbner_tpu.ops.mfvi import MFVIHead, mean_field_iterate

TOK = HashTokenizer(vocab_size=997)


# -- n-best Viterbi -------------------------------------------------------------

def brute_force_paths(emissions, transitions, length, K, start, stop):
    paths, scores = [], []
    for path in itertools.product(range(K), repeat=length):
        s = transitions[start, path[0]] + emissions[0, path[0]]
        for t in range(1, length):
            s += transitions[path[t - 1], path[t]] + emissions[t, path[t]]
        s += transitions[path[-1], stop]
        paths.append(path)
        scores.append(s)
    order = np.argsort(scores)[::-1]
    return [paths[i] for i in order], np.asarray(scores)[order]


def test_nbest_matches_brute_force():
    rng = np.random.RandomState(0)
    K, T, B, N = 5, 4, 2, 4
    START, STOP = K - 2, K - 1
    emissions = rng.randn(B, T, K).astype(np.float32)
    transitions = rng.randn(K, K).astype(np.float32)
    mask = np.ones((B, T), np.int32)
    mask[1, 3] = 0  # one shorter sentence
    tags, scores = crf_decode_nbest(
        emissions, mask, transitions, START, STOP, n_best=N)
    tags, scores = np.asarray(tags), np.asarray(scores)
    for b in range(B):
        L = int(mask[b].sum())
        paths, ref_scores = brute_force_paths(
            emissions[b], transitions, L, K, START, STOP)
        for n in range(N):
            assert tuple(tags[b, n, :L]) == paths[n], (b, n)
            assert scores[b, n] == pytest.approx(ref_scores[n], abs=1e-4)
    # 1-best agrees with plain Viterbi
    best, best_scores = crf_decode(
        emissions, mask, transitions, START, STOP)
    np.testing.assert_array_equal(np.asarray(best) * mask,
                                  tags[:, 0] * mask)


# -- MFVI ------------------------------------------------------------------------

def test_mean_field_iterate_prefers_compatible_pairs():
    B, T, K = 1, 3, 2
    unary = np.zeros((B, T, K), np.float32)
    unary[0, 0, 0] = 2.0  # position 0 prefers tag 0
    binary = np.zeros((B, T - 1, K, K), np.float32)
    binary[:, :, 0, 0] = 3.0  # strong 0->0 attraction
    binary[:, :, 1, 1] = 3.0
    mask = np.ones((B, T), np.int32)
    q = np.asarray(mean_field_iterate(
        jnp.asarray(unary), jnp.asarray(binary), jnp.asarray(mask),
        iterations=5))
    # the 0-preference propagates along the chain
    assert (q[0, :, 0] > 0.5).all()
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)


def test_mfvi_head_overfits():
    rng = np.random.RandomState(0)
    B, T, K, H = 4, 6, 4, 8
    feats = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    unary = jnp.asarray(rng.randn(B, T, K).astype(np.float32) * 0.1)
    tags = jnp.asarray(rng.randint(0, K, (B, T)).astype(np.int32))
    mask = jnp.ones((B, T), jnp.int32)
    head = MFVIHead(num_tags=K, rank=8, iterations=2)
    params = head.init({"params": jax.random.PRNGKey(0)}, feats, unary,
                       tags, mask, method=head.loss)
    tx = optax.adam(5e-2)
    opt = tx.init(params)

    # learn unary via a linear map from feats too? here only potentials are
    # trainable; train unary as a param by closing over a dense layer is
    # out of scope — check the loss decreases through the potentials alone
    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(lambda pp: head.apply(
            pp, feats, unary, tags, mask, method=head.loss))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(80):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    decoded = head.apply(params, feats, unary, mask, method=head.decode)
    assert decoded.shape == (B, T)


def test_ternary_messages_match_dense_einsums():
    """The rank-space third-order messages equal the reference's dense
    [B,T-2,K,K,K] einsums (variational_inference.py:234-239)."""
    from kbner_tpu.ops.mfvi import (
        HexalinearPotentials, dense_ternary, ternary_messages)

    rng = np.random.RandomState(1)
    B, T, K, H, R = 2, 7, 3, 5, 6
    feats = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    q = jax.nn.softmax(
        jnp.asarray(rng.randn(B, T, K).astype(np.float32)), -1)
    mask = np.ones((B, T), np.float32)
    mask[1, 5:] = 0.0
    triple_mask = jnp.asarray(mask[:, :-2] * mask[:, 1:-1] * mask[:, 2:])

    mod = HexalinearPotentials(num_tags=K, rank=R)
    params = mod.init(jax.random.PRNGKey(0), feats)
    factors = mod.apply(params, feats)

    fast = np.asarray(ternary_messages(q, factors, triple_mask))

    tern = np.asarray(dense_ternary(factors)) * np.asarray(
        triple_mask)[:, :, None, None, None]
    qn = np.asarray(q)
    want = np.zeros_like(np.asarray(q))
    want[:, 2:] += np.einsum("nsa,nsb,nsabc->nsc", qn[:, :-2], qn[:, 1:-1],
                             tern)
    want[:, 1:-1] += np.einsum("nsa,nsc,nsabc->nsb", qn[:, :-2], qn[:, 2:],
                               tern)
    want[:, :-2] += np.einsum("nsb,nsc,nsabc->nsa", qn[:, 1:-1], qn[:, 2:],
                              tern)
    np.testing.assert_allclose(fast, want, atol=1e-5)


def test_mfvi_third_order_head_overfits():
    rng = np.random.RandomState(0)
    B, T, K, H = 4, 6, 4, 8
    feats = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    unary = jnp.asarray(rng.randn(B, T, K).astype(np.float32) * 0.1)
    tags = jnp.asarray(rng.randint(0, K, (B, T)).astype(np.int32))
    mask = jnp.ones((B, T), jnp.int32)
    head = MFVIHead(num_tags=K, rank=8, iterations=2, use_third_order=True)
    params = head.init({"params": jax.random.PRNGKey(0)}, feats, unary,
                       tags, mask, method=head.loss)
    # the triple-product parameterization oscillates at the 2nd-order
    # test's 5e-2; 1e-2 converges to ~0
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(lambda pp: head.apply(
            pp, feats, unary, tags, mask, method=head.loss))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(120):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1
    assert "ternary" in params["params"]
    decoded = head.apply(params, feats, unary, mask, method=head.decode)
    assert decoded.shape == (B, T)


# -- text classification ----------------------------------------------------------

def test_fasttext_reader(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("__label__pos great movie\n__label__neg terrible film\n")
    recs = read_fasttext_file(p)
    assert recs[0].labels == ["pos"]
    assert recs[0].tokens == ["great", "movie"]


def test_text_classifier_overfits():
    recs = [
        SentenceRecord(tokens=["great", "fantastic", "movie"],
                       labels=["pos"]),
        SentenceRecord(tokens=["terrible", "awful", "film"],
                       labels=["neg"]),
        SentenceRecord(tokens=["wonderful", "great", "acting"],
                       labels=["pos"]),
        SentenceRecord(tokens=["bad", "terrible", "plot"], labels=["neg"]),
    ]
    label_dict = build_label_dictionary(recs)
    eb = encode_batch(recs, TOK, None)
    encode_labels(recs, label_dict, eb)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}

    cfg = TextClassifierConfig(
        encoder=XLMRConfig.tiny(vocab_size=1000),
        num_labels=len(label_dict))
    model = TextClassifier(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(lambda pp: model.apply(
            pp, arrays, deterministic=True, method=model.loss))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    for _ in range(100):
        params, opt, loss = step(params, opt)
    preds = np.asarray(model.apply(params, arrays, method=model.predict))
    gold = np.asarray(eb.extra["label_ids"])
    assert (preds == gold).all()


def test_text_regressor_runs():
    recs = [SentenceRecord(tokens=["a", "b"], labels=[]),
            SentenceRecord(tokens=["c", "d"], labels=[])]
    eb = encode_batch(recs, TOK, None)
    eb.extra["targets"] = np.asarray([1.0, -1.0], np.float32)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    model = TextRegressor(TextRegressorConfig(
        encoder=XLMRConfig.tiny(vocab_size=1000)))
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    loss = model.apply(params, arrays, deterministic=True, method=model.loss)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("pooling,mult", [
    ("mean", 1), ("max", 1), ("min", 1), ("min_max_mean", 3), ("rnn", 0)])
def test_document_pooling_modes(pooling, mult):
    """DocumentPoolEmbeddings / DocumentRNNEmbeddings modes over the
    encoder token states (reference embeddings.py:4198-4731): correct
    widths, mask-independence of padding, and trainability."""
    recs = [
        SentenceRecord(tokens=["great", "fantastic", "movie"],
                       labels=["pos"]),
        SentenceRecord(tokens=["bad"], labels=["neg"]),
    ]
    label_dict = build_label_dictionary(recs)
    eb = encode_batch(recs, TOK, None)
    encode_labels(recs, label_dict, eb)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}

    enc = XLMRConfig.tiny(vocab_size=1000)
    cfg = TextClassifierConfig(encoder=enc, num_labels=2, pooling=pooling,
                               rnn_hidden=16)
    model = TextClassifier(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    doc = model.apply(params, arrays, method=model.document_embedding)
    want = 16 if pooling == "rnn" else enc.hidden_size * mult
    assert doc.shape == (2, want)
    assert np.isfinite(np.asarray(doc)).all()

    # padding must not leak: growing the pad region leaves doc unchanged
    wider = {k: (jnp.pad(v, ((0, 0), (0, 8))) if v.ndim == 2
                 and v.shape[1] == arrays["input_ids"].shape[1] else v)
             for k, v in arrays.items()}
    doc2 = model.apply(params, wider, method=model.document_embedding)
    np.testing.assert_allclose(np.asarray(doc), np.asarray(doc2),
                               rtol=1e-5, atol=1e-5)

    loss = model.apply(params, arrays, deterministic=True,
                       method=model.loss)
    assert np.isfinite(float(loss))
