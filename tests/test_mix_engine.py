"""MixEngine: single-dispatch multi-index MIX-track search.

Parity target: the per-engine fan-out (:func:`mix_search`), which itself
mirrors the reference's wildcard ``*wiki_v1`` msearch
(``/root/reference/kb/generate_data.py:21-24``). The MixEngine runs the
SAME two-pass pruned search per language inside one jitted scan over the
concatenated multi-index structure, so (lang, doc, score) results must
match the per-engine loop exactly (same quantization, same knobs).
"""

import numpy as np
import pytest

from kbner_tpu.retrieval import (BM25Index, DocStore, MixEngine,
                                 RetrievalEngine, mix_search)

KNOBS = dict(mode="pruned", use_pallas=False, rare_terms=8,
             posting_budget=2048, n_candidates=64, tiny_df_cap=16,
             tiny_pack=False, tiny_f16=True)


def _mk(seed, n=300, vocab=300, doc_len=12):
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    return [" ".join(f"w{w}" for w in rng.choice(vocab, size=doc_len,
                                                 p=probs))
            for _ in range(n)]


@pytest.fixture(scope="module")
def mix_setup():
    corp = {lang: _mk(seed, n=200 + 50 * seed)
            for lang, seed in (("en", 0), ("de", 2), ("tr", 3))}
    idxs = {lang: BM25Index.build(d, pad_docs_to=64)
            for lang, d in corp.items()}
    return corp, idxs


def _queries(corp):
    return [corp["en"][0], corp["de"][3], corp["tr"][5],
            "w1 w2 w3 w250", corp["en"][11]]


def test_mix_engine_matches_per_engine_fanout(mix_setup):
    corp, idxs = mix_setup
    ref = {lang: RetrievalEngine(
        idx, store=DocStore(sentences=list(corp[lang])), **KNOBS)
        for lang, idx in idxs.items()}
    host = {lang: RetrievalEngine(
        idx, store=DocStore(sentences=list(corp[lang])), device=False,
        **KNOBS) for lang, idx in idxs.items()}
    mix = MixEngine(host, n_candidates=64)

    queries = _queries(corp)
    want = mix_search(ref, queries, k=5)
    got = mix.search_texts(queries, k=5)
    assert len(got) == len(queries)
    for qi in range(len(queries)):
        w = [(lang, d.doc_id, d.sentence,
              pytest.approx(d.score, rel=1e-5)) for lang, d in want[qi]]
        g = [(lang, d.doc_id, d.sentence, d.score)
             for lang, d in got[qi]]
        assert g == w


def test_mix_engine_stream_matches_batchwise(mix_setup):
    corp, idxs = mix_setup
    host = {lang: RetrievalEngine(idx, device=False, **KNOBS)
            for lang, idx in idxs.items()}
    mix = MixEngine(host, n_candidates=64)
    queries = _queries(corp)
    batches = [queries[:3], queries[3:], queries[1:4]]
    want = [mix.search_texts(b, k=5) for b in batches]
    got = list(mix.search_texts_stream(batches, k=5, workers=2, depth=1))
    assert len(got) == len(want)
    for wb, gb in zip(want, got):
        assert [[(lang, d.doc_id, d.score) for lang, d in row]
                for row in wb] == \
               [[(lang, d.doc_id, d.score) for lang, d in row]
                for row in gb]


def test_mix_engine_m11_all_reference_languages():
    """The reference's wildcard search spans 11 language indices
    (bn,de,en,es,fa,hi,ko,nl,ru,tr,zh — kb/build_kb.py); the concatenated
    structure must stay exact at M=11 and cost the SUM of the per-language
    indices (concatenation, not pad-to-max)."""
    langs = "bn de en es fa hi ko nl ru tr zh".split()
    corp = {lang: _mk(seed, n=100 + 20 * seed, doc_len=10)
            for seed, lang in enumerate(langs)}
    idxs = {lang: BM25Index.build(d, pad_docs_to=64)
            for lang, d in corp.items()}
    ref = {lang: RetrievalEngine(
        idx, store=DocStore(sentences=list(corp[lang])), **KNOBS)
        for lang, idx in idxs.items()}
    host = {lang: RetrievalEngine(
        idx, store=DocStore(sentences=list(corp[lang])), device=False,
        **KNOBS) for lang, idx in idxs.items()}
    mix = MixEngine(host, n_candidates=32)

    queries = [corp["bn"][0], corp["zh"][7], corp["ko"][3],
               "w1 w5 w9 w200", corp["ru"][19]]
    want = mix_search(ref, queries, k=5)
    got = mix.search_texts(queries, k=5)
    for qi in range(len(queries)):
        w = [(lang, d.doc_id, pytest.approx(d.score, rel=1e-5))
             for lang, d in want[qi]]
        g = [(lang, d.doc_id, d.score) for lang, d in got[qi]]
        assert g == w
    # doc-axis arrays concatenate: total slots == SUM of per-language
    # padded docs (pad-to-max would be len(langs) * max instead)
    total = sum(e.n_padded for e in host.values())
    assert np.asarray(mix._dev[1]).shape[0] == total


def test_mix_engine_rejects_mismatched_engines(mix_setup):
    corp, idxs = mix_setup
    a = RetrievalEngine(idxs["en"], device=False, **KNOBS)
    b = RetrievalEngine(idxs["de"], device=False,
                        **{**KNOBS, "rare_terms": 4})
    with pytest.raises(ValueError, match="pass-1 knobs"):
        MixEngine({"en": a, "de": b})
    with pytest.raises(ValueError, match="pruned mode"):
        MixEngine({"en": RetrievalEngine(idxs["en"], mode="exhaustive",
                                         use_pallas=False, block_d=64)})


def test_device_false_engine_refuses_direct_search(mix_setup):
    corp, idxs = mix_setup
    eng = RetrievalEngine(idxs["en"], device=False, **KNOBS)
    with pytest.raises(ValueError, match="device=False"):
        eng.search([corp["en"][0]], k=3)
