"""Retrieval tests: analyzer, BM25 math vs an independent oracle, kernels,
sharded engine recall parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbner_tpu.ops.bm25 import (
    bm25_score_block_pallas,
    bm25_score_block_xla,
    bm25_topk,
)
from kbner_tpu.parallel import make_mesh
from kbner_tpu.retrieval import (
    BM25Index,
    BM25Params,
    DocStore,
    RetrievalEngine,
    cjk_analyze,
    quantize_doc_length,
    standard_analyze,
)

DOCS = [
    "Anthology is a compilation album by New Zealand singer Bic Runga",
    "The quick brown fox jumps over the lazy dog",
    "Berlin is the capital and largest city of Germany",
    "Bic Runga released her first album Drive in 1997",
    "A compilation album is a collection of songs from various recordings",
    "The European Union is a political and economic union of member states",
    "New York City is the most populous city in the United States",
    "Paris is the capital of France and a major European city",
    "The album topped the New Zealand charts for three weeks",
    "Germany is a country in Central Europe",
]
TITLES = [
    "Anthology (Bic Runga album)", "Fox", "Berlin", "Bic Runga",
    "Compilation album", "European Union", "New York City", "Paris",
    "Anthology (Bic Runga album)", "Germany",
]


# -- analyzer -----------------------------------------------------------------

def test_standard_analyze():
    # UAX#29: Single_Quote joins letters, underscore (ExtendNumLet) joins
    assert standard_analyze("Hello, World! It's 42.") == [
        "hello", "world", "it's", "42"]
    assert standard_analyze("foo_bar") == ["foo_bar"]


def test_standard_analyze_cjk_chars():
    assert standard_analyze("abc北京def") == ["abc", "北", "京", "def"]


def test_cjk_analyze_bigrams():
    toks = cjk_analyze("北京大学")
    assert "北" in toks and "北京" in toks and "京大" in toks


def test_analyze_with_offsets_roundtrip():
    from kbner_tpu.retrieval.analyzer import analyze_with_offsets

    text = "Hello, World! It's 42 in 北京 today."
    triples = analyze_with_offsets(text)
    # tokens agree with standard_analyze, offsets slice the source text
    assert [t for t, _, _ in triples] == standard_analyze(text)
    for tok, s, e in triples:
        assert text[s:e].lower() == tok


def test_highlight_hits_format():
    from kbner_tpu.retrieval.analyzer import highlight_hits

    out = highlight_hits("The Beatles played in Hamburg.",
                         {"beatles", "hamburg"})
    assert out == "The <hit>Beatles</hit> played in <hit>Hamburg</hit>."
    # no match -> empty fragment, the ES-omitted-field convention
    assert highlight_hits("nothing here", {"zzz"}) == ""


def test_write_retrieval_file_hits_column(tmp_path):
    from kbner_tpu.data.conll import SentenceRecord
    from kbner_tpu.retrieval.engine import RetrievedDoc
    from kbner_tpu.retrieval.pipeline import (read_retrieval_file,
                                              write_retrieval_file)

    recs = [SentenceRecord(tokens=["alice", "visited", "berlin"],
                           tags={"ner": ["O", "O", "O"]})]
    docs = [[RetrievedDoc(doc_id=0, score=1.5,
                          sentence="Alice lives near Berlin",
                          paragraph="p", title="Berlin City",
                          url="u")]]
    p = tmp_path / "r.tsv"
    write_retrieval_file(p, recs, docs, entities=[["berlin"]])
    line = [ln for ln in p.read_text().splitlines() if "\t" in ln][0]
    hits = line.split("\t")[5]
    assert hits == ("<hit>Alice</hit> lives near <hit>Berlin</hit>"
                    " ---#--- <hit>Berlin</hit> City")
    # interop: the parser still reads the file back
    parsed = read_retrieval_file(p)
    assert list(parsed.values())[0][0].title == "Berlin City"


def test_norm_quantization_monotone_and_lossy():
    lengths = [0, 1, 5, 7, 8, 13, 100, 1000, 12345]
    q = [quantize_doc_length(x) for x in lengths]
    assert q == sorted(q)
    assert q[:4] == [0, 1, 5, 7]  # small values exact
    assert q[-1] <= 12345 and q[-1] >= 12345 * 0.8  # lossy but close


# -- index math vs independent oracle ------------------------------------------

def naive_bm25(docs, query, k1=1.2, b=0.75, quantize=False):
    """Independent BM25 implementation (no shared code with the index)."""
    from collections import Counter
    import math

    toks = [standard_analyze(d) for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    df = Counter()
    for t in toks:
        df.update(set(t))
    scores = []
    q = standard_analyze(query)
    for t_doc in toks:
        counts = Counter(t_doc)
        dl = quantize_doc_length(len(t_doc)) if quantize else len(t_doc)
        s = 0.0
        for term in q:
            tf = counts.get(term, 0)
            if tf == 0:
                continue
            idf = math.log(1 + (N - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return np.array(scores)


@pytest.fixture(scope="module")
def index():
    return BM25Index.build(DOCS, params=BM25Params(quantize_norms=False),
                           pad_docs_to=8)


def test_index_oracle_matches_naive(index):
    query = "anthology is a compilation album by bic runga"
    expected = naive_bm25(DOCS, query)
    got = index.score_oracle([query])[0][: len(DOCS)]
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    # the Bic Runga anthology doc must rank first (reference README example)
    assert int(np.argmax(got)) == 0


def test_query_multiplicity_weights(index):
    # duplicate query terms score double (one clause per occurrence)
    s1 = index.score_oracle(["album"])[0]
    s2 = index.score_oracle(["album album"])[0]
    np.testing.assert_allclose(s2, 2 * s1, rtol=1e-6)


# -- kernels -------------------------------------------------------------------

@pytest.fixture(scope="module")
def operands(index):
    q_terms, q_weights = index.encode_queries(
        ["bic runga compilation album", "capital city of germany"],
        max_query_terms=8)
    dtt = jnp.asarray(index.doc_terms.T)
    dit = jnp.asarray(index.doc_impacts.T)
    return (jnp.asarray(q_terms), jnp.asarray(q_weights), dtt, dit)


def test_xla_kernel_matches_oracle(index, operands):
    scores = np.asarray(bm25_score_block_xla(*operands))
    oracle = index.score_oracle(
        ["bic runga compilation album", "capital city of germany"])
    np.testing.assert_allclose(scores, oracle, rtol=1e-5)


def test_pallas_kernel_matches_xla(operands):
    # interpret mode on CPU; real Mosaic compile on TPU
    qt, qw, dtt, dit = operands
    # pad queries to block size 2->2 (block_q=2), docs are 16-padded
    got = np.asarray(bm25_score_block_pallas(
        qt, qw, dtt, dit, block_q=2, block_d=8))
    want = np.asarray(bm25_score_block_xla(qt, qw, dtt, dit))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_topk_chunked_matches_full(operands):
    qt, qw, dtt, dit = operands
    full_s, full_i = bm25_topk([(qt, qw, dtt, dit)], k=3, use_pallas=False)
    chunk_s, chunk_i = bm25_topk(
        [(qt, qw, dtt, dit)], k=3, doc_chunk=8, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(full_s), np.asarray(chunk_s), rtol=1e-5)
    assert np.array_equal(np.asarray(full_i), np.asarray(chunk_i))


# -- engine --------------------------------------------------------------------

def test_engine_single_device(index):
    store = DocStore(sentences=DOCS, titles=TITLES)
    eng = RetrievalEngine(index, store=store, use_pallas=False, block_d=8)
    results = eng.search(
        ["anthology is a compilation album by bic runga"], k=5)
    assert results[0][0].doc_id == 0
    assert "Bic Runga" in results[0][0].sentence
    oracle = index.score_oracle(
        ["anthology is a compilation album by bic runga"])[0]
    assert results[0][0].score == pytest.approx(float(oracle.max()), rel=1e-5)


def test_engine_sharded_matches_unsharded(index):
    mesh = make_mesh(data=8, model=1)
    store = DocStore(sentences=DOCS, titles=TITLES)
    eng1 = RetrievalEngine(index, store=store, use_pallas=False, block_d=8)
    eng8 = RetrievalEngine(index, store=store, mesh=mesh, use_pallas=False,
                           block_d=8)
    queries = ["bic runga album", "capital of germany", "european union"]
    r1 = eng1.search(queries, k=5)
    r8 = eng8.search(queries, k=5)
    for a, b in zip(r1, r8):
        assert [d.doc_id for d in a] == [d.doc_id for d in b]
        np.testing.assert_allclose(
            [d.score for d in a], [d.score for d in b], rtol=1e-5)


def test_engine_title_boost(index):
    title_index = BM25Index.build(
        TITLES, params=BM25Params(quantize_norms=False), pad_docs_to=8)
    store = DocStore(sentences=DOCS, titles=TITLES)
    eng = RetrievalEngine(index, store=store, title_index=title_index,
                          use_pallas=False, block_d=8)
    plain = eng.search(["the album charts"], k=3)
    boosted = eng.search(["the album charts"], k=3,
                         entity_queries=[["Bic Runga"]])
    # entity boost must pull a Bic Runga-titled doc upward
    boosted_titles = [d.title for d in boosted[0]]
    assert any("Bic Runga" in t for t in boosted_titles)
    # and boosted scores exceed plain for those docs
    assert boosted[0][0].score >= plain[0][0].score


def test_standard_analyze_edge_cases():
    # Lucene standard-analyzer behaviors our recall parity depends on
    # (full golden fixture: tests/test_analyzer_lucene_golden.py)
    assert standard_analyze("U.S.A. is BIG") == ["u.s.a", "is", "big"]
    assert standard_analyze("3.14 and 1,000") == ["3.14", "and", "1,000"]
    assert standard_analyze("über café naïve") == ["über", "café", "naïve"]
    assert standard_analyze("don't stop") == ["don't", "stop"]
    assert standard_analyze("e-mail@example.com") == [
        "e", "mail", "example.com"]
    assert standard_analyze("Ελληνικά русский") == ["ελληνικά", "русский"]
    assert standard_analyze("") == []
    assert standard_analyze("   \t\n  ") == []


def test_analyzer_hangul_and_kana():
    # Hangul syllables are ALetter (runs join); katakana runs join too
    assert standard_analyze("한국어 テスト") == ["한국어", "テスト"]


def test_build_encoded_matches_build():
    """The vectorized bulk path (term ids in, one NumPy pass) produces the
    identical index to the text path for the same tokenization."""
    rng = np.random.RandomState(3)
    docs = []
    for _ in range(57):
        words = rng.randint(0, 40, size=rng.randint(1, 15))
        docs.append(" ".join(f"w{w:02d}" for w in words))
    a = BM25Index.build(docs, pad_docs_to=16)

    # encode by hand with the same vocab and compare every array
    L = max(len(d.split()) for d in docs)
    tok = np.full((len(docs), L), -1, np.int32)
    for i, d in enumerate(docs):
        for j, t in enumerate(d.split()):
            tok[i, j] = a.vocab[t]
    b = BM25Index.build_encoded(tok, a.vocab, pad_docs_to=16)
    np.testing.assert_array_equal(a.doc_terms, b.doc_terms)
    np.testing.assert_allclose(a.doc_impacts, b.doc_impacts, rtol=1e-6)
    np.testing.assert_allclose(a.idf, b.idf)
    assert a.avgdl == b.avgdl and a.n_docs == b.n_docs


def test_build_max_doc_terms_keeps_highest_impact():
    """Capping distinct terms per doc drops the LOWEST-impact slots."""
    # doc 0 has 6 distinct terms; rare terms (high idf) must survive a cap=3
    docs = ["r1 r2 r3 c1 c2 c3"] + ["c1 c2 c3"] * 9
    full = BM25Index.build(docs, max_doc_terms=None, pad_docs_to=8)
    capped = BM25Index.build(docs, max_doc_terms=3, pad_docs_to=8)
    assert capped.doc_terms.shape[1] == 3
    kept = set(capped.doc_terms[0].tolist())
    assert kept == {full.vocab["r1"], full.vocab["r2"], full.vocab["r3"]}
    # impacts of kept slots are exact (same stats as the uncapped build)
    by_term_full = dict(zip(full.doc_terms[0].tolist(),
                            full.doc_impacts[0].tolist()))
    for t, imp in zip(capped.doc_terms[0], capped.doc_impacts[0]):
        assert imp == pytest.approx(by_term_full[int(t)])
