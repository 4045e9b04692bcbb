"""Small parity surfaces: HTML viz, reranking, splitter, optim extras,
LM generation, token-budget batching."""

import zlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbner_tpu.data import HashTokenizer, make_batches
from kbner_tpu.data.conll import SentenceRecord
from kbner_tpu.data.encode import build_char_vocab
from kbner_tpu.models.embedders import CharLMHead
from kbner_tpu.retrieval.engine import RetrievedDoc
from kbner_tpu.retrieval.rerank import (
    bertscore_f1,
    edit_distance,
    normalized_edit_similarity,
    rerank_by_bertscore,
    rerank_by_edit_distance,
    split_corpus,
)
from kbner_tpu.train.lm_trainer import generate_text
from kbner_tpu.train.optim import (
    ReduceLROnPlateau,
    exp_anneal_schedule,
    sgdw,
)
from kbner_tpu.utils.html_viz import render_ner_html

TOK = HashTokenizer(vocab_size=997)


def test_render_ner_html():
    recs = [SentenceRecord(
        tokens=["Alice", "visited", "Berlin", "<EOS>", "ctx"],
        tags={"ner": ["S-PER", "O", "S-LOC", "S-X", "S-X"]})]
    page = render_ner_html(recs)
    assert "Alice" in page and "PER" in page and "LOC" in page
    assert "background:" in page
    # X spans filtered
    assert ">X<" not in page


def test_edit_distance_and_rerank():
    assert edit_distance("kitten", "sitting") == 3
    assert normalized_edit_similarity("abc", "abc") == 1.0
    docs = [
        RetrievedDoc(doc_id=0, score=3.0, sentence="totally different text"),
        RetrievedDoc(doc_id=1, score=2.0, sentence="alice visited berlin"),
    ]
    ranked = rerank_by_edit_distance("alice visited berlin", docs)
    assert ranked[0].doc_id == 1


def test_bertscore_f1_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    Lq, K, Ld, D = 5, 3, 7, 16
    q = rng.randn(Lq, D).astype(np.float32)
    d = rng.randn(K, Ld, D).astype(np.float32)
    qm = np.array([1, 1, 1, 1, 0], np.int32)
    dm = (rng.rand(K, Ld) > 0.3).astype(np.int32)
    dm[:, 0] = 1
    got = np.asarray(bertscore_f1(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm)))

    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    for k in range(K):
        sim = qn @ dn[k].T  # [Lq, Ld]
        sim = sim[qm > 0][:, dm[k] > 0]
        r = sim.max(axis=1).mean()
        p = sim.max(axis=0).mean()
        f1 = 2 * p * r / (p + r)
        assert got[k] == pytest.approx(f1, rel=1e-5)


def test_rerank_by_bertscore_prefers_match():
    """With a deterministic hash-projection token embedder, the context
    sharing the query's tokens must outrank disjoint contexts."""
    rng = np.random.RandomState(1)
    proj = rng.randn(997, 24).astype(np.float32)

    def encode(texts):
        S = max(len(t.split()) for t in texts)
        emb = np.zeros((len(texts), S, 24), np.float32)
        mask = np.zeros((len(texts), S), np.int32)
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()):
                emb[i, j] = proj[zlib.crc32(w.encode()) % 997]
                mask[i, j] = 1
        return jnp.asarray(emb), jnp.asarray(mask)

    docs = [
        RetrievedDoc(doc_id=0, score=9.0, sentence="unrelated words entirely"),
        RetrievedDoc(doc_id=1, score=1.0,
                     sentence="alice visited berlin yesterday"),
        RetrievedDoc(doc_id=2, score=5.0, sentence="other nonsense string"),
    ]
    ranked = rerank_by_bertscore(encode, "alice visited berlin", docs)
    assert ranked[0].doc_id == 1
    assert rerank_by_bertscore(encode, "q", []) == []


def test_split_corpus():
    recs = list(range(10))
    parts = split_corpus(recs, 3)
    assert [len(p) for p in parts] == [4, 3, 3]
    assert sorted(x for p in parts for x in p) == recs


def test_sgdw_and_schedules():
    import optax

    tx = sgdw(1e-2, momentum=0.9, weight_decay=0.01)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    updates, state = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["w"]) < 0)

    sched = exp_anneal_schedule(1.0, 0.5)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(2)) == pytest.approx(0.25)


def test_reduce_lr_on_plateau():
    ctl = ReduceLROnPlateau(factor=0.5, patience=1)
    assert ctl.step(0.5) == 1.0  # first metric = best
    assert ctl.step(0.6) == 1.0  # improved
    assert ctl.step(0.55) == 1.0  # 1 bad epoch tolerated
    assert ctl.step(0.55) == 0.5  # patience exceeded -> halve
    assert ctl.step(0.7) == 0.5  # improvement keeps current scale


def test_generate_text():
    recs = [SentenceRecord(tokens=["hello", "world"], tags={})]
    cv = build_char_vocab(recs)
    model = CharLMHead(char_vocab_size=len(cv), embed_dim=8, hidden=12)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    text = generate_text(model, params, cv, prefix="h", length=10)
    assert len(text) == 11  # prefix + 10 sampled chars


def test_token_budget_batching():
    recs = [SentenceRecord(tokens=["w"] * n, tags={"ner": ["O"] * n})
            for n in (2, 3, 5, 8, 13)]
    batches = make_batches(recs, TOK, None, batch_size=999,
                           token_budget=12, tag_layer="ner")
    # each batch respects the subtoken budget (hash tok: 1 subtok/word + 2)
    for eb in batches:
        total = sum(len(r.tokens) + 2 for r in eb.records)
        assert total <= 12 or len(eb.records) == 1
    assert sum(len(b.records) for b in batches) == len(recs)


def test_tsne_plot(tmp_path):
    from kbner_tpu.utils.plotter import plot_embedding_tsne

    rng = np.random.RandomState(0)
    emb = np.vstack([rng.randn(10, 8) + 4, rng.randn(10, 8) - 4])
    labels = ["A"] * 10 + ["B"] * 10
    out = plot_embedding_tsne(emb, labels, tmp_path / "tsne.png")
    if out is not None:
        assert out.exists() and out.stat().st_size > 0
