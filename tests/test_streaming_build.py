"""Streaming chunked build + sharded persistence parity.

``BM25Index.build_streaming`` is the collection-scale ingest (the role of
the reference's 10k-doc ``_bulk`` batches, ``kb/build_kb.py:41-86``): it
must produce the same index as the one-shot ``build_encoded`` on the
concatenated input, and ``save_sharded``/``load_sharded`` must round-trip
it exactly.
"""

import numpy as np
import pytest

from kbner_tpu.retrieval import BM25Index
from kbner_tpu.retrieval.synth import synth_wiki_docs

VOCAB = 500


def _chunks(seed=0, widths=(24, 24, 24), n=(400, 300, 137)):
    rng = np.random.RandomState(seed)
    out = []
    for w, ni in zip(widths, n):
        lens = rng.randint(3, w + 1, size=ni)
        tok = np.full((ni, w), -1, np.int32)
        for i, L in enumerate(lens):
            tok[i, :L] = rng.randint(0, VOCAB, size=L)
        out.append(tok)
    return out


def _pad_concat(chunks):
    w = max(c.shape[1] for c in chunks)
    rows = [np.pad(c, ((0, 0), (0, w - c.shape[1])), constant_values=-1)
            for c in chunks]
    return np.vstack(rows)


@pytest.mark.parametrize("widths", [(24, 24, 24), (16, 40, 28)])
def test_streaming_equals_one_shot(widths):
    chunks = _chunks(widths=widths)
    vocab = {f"t{i}": i for i in range(VOCAB)}
    one = BM25Index.build_encoded(_pad_concat(chunks), vocab)
    stream = BM25Index.build_streaming(iter(chunks), vocab)
    assert stream.n_docs == one.n_docs
    assert stream.avgdl == one.avgdl
    np.testing.assert_array_equal(stream.idf, one.idf)
    np.testing.assert_array_equal(stream.doc_terms, one.doc_terms)
    np.testing.assert_array_equal(stream.doc_impacts, one.doc_impacts)
    np.testing.assert_array_equal(stream.doc_dl, one.doc_dl)


def test_streaming_capped_score_parity():
    """Under a max_doc_terms cap the per-row term ORDER may differ (both
    paths keep the highest-impact terms); scores must still be equal."""
    chunks = _chunks(seed=3, widths=(48, 48), n=(200, 200))
    vocab = {f"t{i}": i for i in range(VOCAB)}
    one = BM25Index.build_encoded(_pad_concat(chunks), vocab,
                                  max_doc_terms=8)
    stream = BM25Index.build_streaming(iter(chunks), vocab, max_doc_terms=8)
    assert stream.doc_terms.shape == one.doc_terms.shape
    # same kept (term, impact) multiset per row
    o = np.sort(
        one.doc_terms.astype(np.int64) * (1 << 32)
        + one.doc_impacts.view(np.int32), axis=1)
    s = np.sort(
        stream.doc_terms.astype(np.int64) * (1 << 32)
        + stream.doc_impacts.view(np.int32), axis=1)
    np.testing.assert_array_equal(o, s)


def test_streaming_synth_chunks_match():
    """Seeded synth chunks == one-shot on the stacked corpus (the shape the
    20M-doc bench rehearsal streams)."""
    vocab = {i: i for i in range(2000)}
    chunks = [synth_wiki_docs(512, vocab=2000, n_topics=16, seed=s)
              for s in range(3)]
    one = BM25Index.build_encoded(np.vstack(chunks), vocab)
    stream = BM25Index.build_streaming(iter(chunks), vocab)
    np.testing.assert_array_equal(stream.doc_terms, one.doc_terms)
    np.testing.assert_array_equal(stream.doc_impacts, one.doc_impacts)


def test_sharded_roundtrip(tmp_path):
    chunks = _chunks(seed=7)
    vocab = {f"t{i}": i for i in range(VOCAB)}
    idx = BM25Index.build_streaming(iter(chunks), vocab)
    idx.save_sharded(tmp_path / "sharded", n_shards=4)
    back = BM25Index.load_sharded(tmp_path / "sharded")
    assert back.n_docs == idx.n_docs and back.avgdl == idx.avgdl
    assert back.params == idx.params
    np.testing.assert_array_equal(back.idf, idx.idf)
    np.testing.assert_array_equal(back.doc_terms, idx.doc_terms)
    np.testing.assert_array_equal(back.doc_impacts, idx.doc_impacts)
    np.testing.assert_array_equal(back.doc_dl, idx.doc_dl)
    # the reopened index scores identically (engine-facing contract)
    q = ["t3 t17 t17 t99"]
    idx.vocab = back.vocab = {f"t{i}": i for i in range(VOCAB)}
    np.testing.assert_allclose(back.score_oracle(q), idx.score_oracle(q))


def test_sharded_uneven_last_shard(tmp_path):
    vocab = {i: i for i in range(300)}
    tok = synth_wiki_docs(1001, vocab=300, seed=1)
    idx = BM25Index.build_encoded(tok, vocab)
    idx.save_sharded(tmp_path / "s", n_shards=3)  # 334+334+333
    back = BM25Index.load_sharded(tmp_path / "s")
    np.testing.assert_array_equal(back.doc_terms, idx.doc_terms)
    np.testing.assert_array_equal(back.doc_impacts, idx.doc_impacts)
