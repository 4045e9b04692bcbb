"""Delta16 pass-2 row layout: packer round-trip, engine parity, sharding.

The delta16 layout (engine.py::_pack_doc_rows_delta16) is the equal-memory
push of VERDICT r3 #1: ~2 B per posting gap-coded uint16 slots with exact
device-side tfNorm reconstruction, replacing the reference's Lucene
delta-vint postings (~2 B/posting) at the same memory class
(/root/reference/kb/build_kb.py builds that index via Elasticsearch).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from kbner_tpu.retrieval import BM25Index, BM25Params, RetrievalEngine
from kbner_tpu.retrieval.engine import (
    DELTA16_MAX_GAP, _nontiny_remap, _pack_doc_rows_delta16)


def zipf_corpus(n_docs=512, vocab=400, doc_len=12, seed=0, max_rep=3):
    """Zipf docs with bounded within-doc repeats (tf <= max_rep keeps the
    delta16 3-bit tf field exact, so parity tests can assert equality)."""
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    docs = []
    for _ in range(n_docs):
        words = []
        counts = {}
        while len(words) < doc_len:
            w = int(rng.choice(vocab, p=probs))
            if counts.get(w, 0) >= max_rep:
                continue
            counts[w] = counts.get(w, 0) + 1
            words.append(f"w{w}")
        docs.append(" ".join(words))
    return docs


@pytest.fixture(scope="module")
def q_index():
    docs = zipf_corpus()
    # quantize_norms=True: the delta16 layout's supported mode (the
    # Lucene-parity default, index.py::BM25Params)
    index = BM25Index.build(docs, params=BM25Params(quantize_norms=True),
                            pad_docs_to=64)
    return docs, index


def _decode_flat(flat, off, lens, d):
    """Host reference decode of one doc's delta16 segment."""
    slots = flat.ravel()[off[d]: off[d] + int(lens[d])]
    ids, tfs = [], []
    cur = 0
    for v in slots.astype(np.int64):
        gap, tf = int(v) >> 3, int(v) & 7
        cur += gap
        if tf > 0:
            ids.append(cur)
            tfs.append(tf)
    return ids, tfs


def test_packer_roundtrip():
    """Every (doc, term, tf) survives the gap/continuation encoding."""
    rng = np.random.RandomState(0)
    N, L, V = 64, 10, 50000
    dt = np.full((N, L), -1, np.int32)
    di = np.zeros((N, L), np.float32)
    idf = rng.uniform(0.5, 8.0, V).astype(np.float32)
    norm = rng.uniform(0.4, 2.4, N).astype(np.float32)
    want = {}
    for d in range(N):
        n = rng.randint(0, L + 1)
        terms = rng.choice(V, size=n, replace=False)
        tfs = rng.randint(1, 7, size=n)
        for j, (t, tf) in enumerate(zip(terms, tfs)):
            dt[d, j] = t
            di[d, j] = idf[t] * tf / (tf + norm[d])
        want[d] = sorted(zip(terms.tolist(), tfs.tolist()))
    df = np.zeros(V, np.int64)
    v = dt >= 0
    np.add.at(df, dt[v], 1)
    remap, tp = _nontiny_remap(df, 0)
    flat, off, lens, r2 = _pack_doc_rows_delta16(dt, di, remap, idf, norm)
    assert flat.dtype == np.uint16
    for d in range(N):
        ids, tfs = _decode_flat(flat, off, lens, d)
        got = sorted(
            (int(np.nonzero(remap == i)[0][0]), tf)
            for i, tf in zip(ids, tfs))
        assert got == want[d], d
    # continuations exist for this vocab size (gaps can exceed the field)
    max_id = max((max(ids) if ids else 0
                  for ids in (_decode_flat(flat, off, lens, d)[0]
                              for d in range(N))), default=0)
    assert max_id < tp


def test_packer_native_matches_fallback(monkeypatch):
    """The fused C++ transform and the NumPy fallback produce identical
    layouts (same flat slots, offsets, lens)."""
    rng = np.random.RandomState(7)
    N, L, V = 128, 14, 9000
    dt = np.full((N, L), -1, np.int32)
    di = np.zeros((N, L), np.float32)
    idf = rng.uniform(0.5, 8.0, V).astype(np.float32)
    norm = rng.uniform(0.4, 2.4, N).astype(np.float32)
    for d in range(N):
        n = rng.randint(0, L + 1)
        terms = rng.choice(V, size=n, replace=False)
        tfs = rng.randint(1, 7, size=n)
        dt[d, :n] = terms
        di[d, :n] = idf[terms] * tfs / (tfs + norm[d])
    df = np.zeros(V, np.int64)
    np.add.at(df, dt[dt >= 0], 1)
    remap, _ = _nontiny_remap(df, 0)
    got_n = _pack_doc_rows_delta16(dt, di, remap, idf, norm)
    import kbner_tpu.native as nat
    monkeypatch.setattr(nat, "delta16_rows",
                        lambda *a, **k: None)
    monkeypatch.setattr(nat, "pack_delta16",
                        lambda *a, **k: False)
    got_f = _pack_doc_rows_delta16(dt, di, remap, idf, norm)
    np.testing.assert_array_equal(got_n[0], got_f[0])
    np.testing.assert_array_equal(got_n[1], got_f[1])
    np.testing.assert_array_equal(got_n[2], got_f[2])
    assert got_n[3] == got_f[3]


def test_packer_continuation_edge():
    """A gap right at the 13-bit boundary round-trips (continuation slot
    + zero-gap real slot)."""
    V = 3 * DELTA16_MAX_GAP
    idf = np.ones(V, np.float32)
    norm = np.ones(1, np.float32)
    # remap = identity (df equal -> stable order keeps ascending ids)
    df = np.full(V, 5, np.int64)
    remap, _ = _nontiny_remap(df, 0)
    tgt = [0, DELTA16_MAX_GAP, 2 * DELTA16_MAX_GAP + 1]
    orig = [int(np.nonzero(remap == t)[0][0]) for t in tgt]
    dt = np.asarray([orig], np.int32)
    di = np.asarray([[1.0 * 1 / (1 + 1.0)] * 3], np.float32)
    flat, off, lens, _ = _pack_doc_rows_delta16(dt, di, remap, idf, norm)
    ids, tfs = _decode_flat(flat, off, lens, 0)
    assert ids == tgt
    assert tfs == [1, 1, 1]


def test_engine_delta16_matches_packed32(q_index):
    """Same top-k from both row layouts on a bounded-tf corpus (where the
    3-bit tf field is exact)."""
    docs, index = q_index
    rng = np.random.RandomState(1)
    queries = [docs[i] for i in rng.randint(0, len(docs), 32)]
    kw = dict(mode="pruned", use_pallas=False, rare_terms=8,
              posting_budget=2048, n_candidates=256, tiny_df_cap=8)
    e32 = RetrievalEngine(index, row_layout="packed32", **kw)
    e16 = RetrievalEngine(index, row_layout="delta16", **kw)
    assert not e32._row_d16 and e16._row_d16
    qt, qw = index.encode_queries(queries)
    s32, i32 = e32.search_encoded(qt, qw, k=10)
    s16, i16 = e16.search_encoded(qt, qw, k=10)
    # delta16 rescoring is EXACT f32 while packed32 carries 12-bit log
    # codes -> compare at the code quantization tolerance, and ids up to
    # quantization-tie swaps: every returned id must carry an exact score
    # matching its counterpart rankwise
    np.testing.assert_allclose(s16, s32, rtol=2e-3, atol=1e-3)
    same = (i16 == i32).mean()
    assert same > 0.9, same


def test_engine_delta16_matches_exhaustive(q_index):
    """Pruned delta16 == exhaustive exact top-k on a small corpus."""
    docs, index = q_index
    rng = np.random.RandomState(2)
    queries = [docs[i] for i in rng.randint(0, len(docs), 16)]
    exact = RetrievalEngine(index, mode="exhaustive", use_pallas=False)
    e16 = RetrievalEngine(index, mode="pruned", use_pallas=False,
                          rare_terms=8, posting_budget=2048,
                          n_candidates=256, tiny_df_cap=8,
                          row_layout="delta16")
    qt, qw = index.encode_queries(queries)
    es, ei = exact.search_encoded(qt, qw, k=5)
    ps, pi = e16.search_encoded(qt, qw, k=5)
    np.testing.assert_allclose(ps, es, rtol=1e-4, atol=1e-4)
    # ids may swap only on score ties
    for q in range(len(queries)):
        diff = pi[q] != ei[q]
        if diff.any():
            np.testing.assert_allclose(
                ps[q][diff], es[q][diff], rtol=1e-4)


def test_engine_delta16_sharded_matches_unsharded(q_index):
    from kbner_tpu.parallel import make_mesh

    docs, index = q_index
    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(3)
    queries = [docs[i] for i in rng.randint(0, len(docs), 16)]
    kw = dict(mode="pruned", use_pallas=False, rare_terms=8,
              posting_budget=2048, n_candidates=256, tiny_df_cap=8,
              row_layout="delta16")
    e1 = RetrievalEngine(index, **kw)
    e8 = RetrievalEngine(index, mesh=mesh, **kw)
    assert e8._row_d16
    qt, qw = index.encode_queries(queries)
    s1, i1 = e1.search_encoded(qt, qw, k=5)
    s8, i8 = e8.search_encoded(qt, qw, k=5)
    np.testing.assert_allclose(s8, s1, rtol=1e-5, atol=1e-5)
    for q in range(len(queries)):
        diff = i8[q] != i1[q]
        if diff.any():  # tie swaps only
            np.testing.assert_allclose(s8[q][diff], s1[q][diff], rtol=1e-5)


def test_pallas_rescore_matches_xla(q_index):
    """The delta16 Pallas rescore tile (interpret mode on CPU) returns
    the same top-k scores as the XLA decode branch."""
    docs, index = q_index
    rng = np.random.RandomState(5)
    queries = [docs[i] for i in rng.randint(0, len(docs), 16)]
    kw = dict(mode="pruned", rare_terms=8, posting_budget=2048,
              n_candidates=128, tiny_df_cap=8, row_layout="delta16")
    ex = RetrievalEngine(index, use_pallas=False, **kw)
    ep = RetrievalEngine(index, use_pallas=True, **kw)
    qt, qw = index.encode_queries(queries)
    sx, ix = ex.search_encoded(qt, qw, k=10)
    sp, ip = ep.search_encoded(qt, qw, k=10)
    np.testing.assert_allclose(sp, sx, rtol=1e-5, atol=1e-5)
    for q in range(len(queries)):
        diff = ip[q] != ix[q]
        if diff.any():  # tie swaps only
            np.testing.assert_allclose(sp[q][diff], sx[q][diff], rtol=1e-5)


def test_tf_saturation_bounded():
    """tf > 7 saturates: the device score understates tfNorm by the
    saturation delta only (small — tfNorm is near-flat past 7)."""
    # one doc with a term repeated 12 times
    docs = ["rare " + " ".join(["hot"] * 12), "rare other words here",
            "cold stuff entirely", "more cold filler text"] * 8
    index = BM25Index.build(docs, params=BM25Params(quantize_norms=True),
                            pad_docs_to=64)
    e16 = RetrievalEngine(index, mode="pruned", use_pallas=False,
                          rare_terms=8, posting_budget=512,
                          n_candidates=64, tiny_df_cap=0,
                          row_layout="delta16")
    qt, qw = index.encode_queries(["hot rare"])
    s, i = e16.search_encoded(qt, qw, k=3)
    oracle = index.score_oracle(["hot rare"])[0]
    top = int(i[0, 0])
    true = oracle[top]
    norm = float(index.params.k1)  # rough scale; assert a tight band
    assert s[0, 0] <= true + 1e-4
    # saturated tfNorm(7) vs true tfNorm(12): within ~10%
    assert s[0, 0] >= true * 0.85


def test_auto_layout_gating():
    """auto -> delta16 only when the index stores doc lengths with
    quantized norms; explicit delta16 on an unsupported index raises."""
    docs = zipf_corpus(n_docs=64)
    idx_q = BM25Index.build(docs, params=BM25Params(quantize_norms=True))
    idx_r = BM25Index.build(docs, params=BM25Params(quantize_norms=False))
    e_auto = RetrievalEngine(idx_q, mode="pruned", use_pallas=False,
                             rare_terms=4, posting_budget=512,
                             n_candidates=64)
    assert e_auto._row_d16
    e_raw = RetrievalEngine(idx_r, mode="pruned", use_pallas=False,
                            rare_terms=4, posting_budget=512,
                            n_candidates=64)
    assert not e_raw._row_d16
    with pytest.raises(ValueError):
        RetrievalEngine(idx_r, mode="pruned", row_layout="delta16")
    idx_q.doc_dl = None  # legacy pickle without stored lengths
    e_leg = RetrievalEngine(idx_q, mode="pruned", use_pallas=False,
                            rare_terms=4, posting_budget=512,
                            n_candidates=64)
    assert not e_leg._row_d16
