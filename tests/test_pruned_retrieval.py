"""Two-pass pruned retrieval: native gather, pruned top-k, recall parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from kbner_tpu.native import build_library, gather_postings
from kbner_tpu.ops.bm25 import bm25_pruned_topk
from kbner_tpu.retrieval import BM25Index, BM25Params, RetrievalEngine


def make_corpus(n_docs=400, vocab=300, doc_len=12, seed=0):
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    docs = []
    for _ in range(n_docs):
        words = rng.choice(vocab, size=doc_len, p=probs)
        docs.append(" ".join(f"w{w}" for w in words))
    return docs


@pytest.fixture(scope="module")
def corpus_index():
    docs = make_corpus()
    index = BM25Index.build(docs, params=BM25Params(quantize_norms=False),
                            pad_docs_to=64)
    return docs, index


def test_csr_consistency(corpus_index):
    docs, index = corpus_index
    offsets, p_doc, p_imp, df = index.csr
    # df equals the number of docs per posting range and counts from arrays
    for t in np.random.RandomState(0).randint(0, len(index.vocab), 20):
        lo, hi = offsets[t], offsets[t + 1]
        assert hi - lo == df[t]
        # postings point at docs that really contain the term
        for d in p_doc[lo:hi][:5]:
            assert t in index.doc_terms[d]


def test_native_gather_matches_numpy(corpus_index, monkeypatch, tmp_path):
    docs, index = corpus_index
    offsets, p_doc, p_imp, df = index.csr
    q_terms = np.asarray(
        [[1, 5, -1, 9], [2, -1, 3, 4]], dtype=np.int32)
    built = build_library()
    native = gather_postings(offsets, p_doc, p_imp, q_terms, budget=64)

    # Force the NumPy fallback: no cached lib, a .so path that does not
    # exist, AND build_library disabled — otherwise _load() would compile
    # the real library into the bogus path and compare native with itself.
    import kbner_tpu.native as nat

    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_SO", tmp_path / "nonexistent.so")
    monkeypatch.setattr(nat, "build_library", lambda force=False: False)
    assert nat._load() is None  # the fallback branch is really exercised
    fallback = gather_postings(offsets, p_doc, p_imp, q_terms, budget=64)
    assert not (tmp_path / "nonexistent.so").exists()

    np.testing.assert_array_equal(native[0], fallback[0])
    np.testing.assert_allclose(native[1], fallback[1])
    assert built


def test_pruned_matches_exhaustive_recall(corpus_index):
    docs, index = corpus_index
    rng = np.random.RandomState(1)
    queries = [docs[i] for i in rng.randint(0, len(docs), 16)]

    exact = RetrievalEngine(index, use_pallas=False, block_d=64)
    # compact_rows=False: pass 2 rescores EVERY term from the 12-bit rows
    pruned_full = RetrievalEngine(index, mode="pruned", rare_terms=12,
                                  posting_budget=4096, n_candidates=128,
                                  compact_rows=False)
    # default compact rows: tiny terms scored exactly from the host CSR
    # (f32), mid terms from the 12-bit device rows
    pruned_compact = RetrievalEngine(index, mode="pruned", rare_terms=12,
                                     posting_budget=4096, n_candidates=128)
    r_exact = exact.search(queries, k=10)

    # compact tiny-term scores are host-gathered f32 (exact); mid terms
    # rescore from 12-bit rows in both engines
    for pruned, rel, bar in ((pruned_full, 1e-4, 0.99),
                             (pruned_compact, 5e-4, 0.99)):
        r_pruned = pruned.search(queries, k=10)
        recalls = []
        for a, b in zip(r_exact, r_pruned):
            want = {d.doc_id for d in a}
            got = {d.doc_id for d in b}
            if want:
                recalls.append(len(want & got) / len(want))
        assert np.mean(recalls) >= bar, np.mean(recalls)
        for a, b in zip(r_exact, r_pruned):
            exact_by_id = {d.doc_id: d.score for d in a}
            for d in b:
                if d.doc_id in exact_by_id:
                    assert d.score == pytest.approx(
                        exact_by_id[d.doc_id], rel=rel)


def test_compact_rows_drop_tiny_and_memory(corpus_index):
    """Compact rows really shrink the pass-2 arrays, and the dropped
    slots are exactly the tiny-df terms."""
    from kbner_tpu.retrieval.engine import _drop_tiny_slots

    docs, index = corpus_index
    full = RetrievalEngine(index, mode="pruned", rare_terms=12,
                           posting_budget=4096, n_candidates=128,
                           compact_rows=False)
    compact = RetrievalEngine(index, mode="pruned", rare_terms=12,
                              posting_budget=4096, n_candidates=128)
    assert compact.compact_rows and not full.compact_rows
    fb = sum(int(a.nbytes) for a in full._device_rows["text"])
    cb = sum(int(a.nbytes) for a in compact._device_rows["text"])
    assert cb < fb

    df = index.csr[3]
    dt = np.asarray([[0, 1, -1], [2, -1, -1]], np.int32)
    di = np.asarray([[1.0, 2.0, 0.0], [3.0, 0.0, 0.0]], np.float32)
    df_fake = np.zeros(3, np.int64)
    df_fake[0], df_fake[1], df_fake[2] = 1, 100, 100
    dt2, di2 = _drop_tiny_slots(dt, di, df_fake, tiny_cap=10)
    # term 0 (df=1 <= 10) dropped; terms 1/2 kept and left-compacted
    assert dt2[0].tolist()[:1] == [1] and di2[0, 0] == 2.0
    assert dt2[1, 0] == 2 and di2[1, 0] == 3.0


def test_tiny_f16_matches_f32(corpus_index):
    """f16 tiny-block upload (two half scores per int32 column — the
    tiny block is ~90% of a batch's tunnel bytes) returns the same docs
    as the f32 block, scores within f16 resolution (2^-11 relative)."""
    docs, index = corpus_index
    kw = dict(mode="pruned", rare_terms=12, posting_budget=4096,
              n_candidates=128, tiny_df_cap=64, tiny_pack=False)
    e32 = RetrievalEngine(index, tiny_f16=False, **kw)
    e16 = RetrievalEngine(index, tiny_f16=True, **kw)
    qt, qw = index.encode_queries([docs[i] for i in range(0, 64, 2)])
    s32, i32 = e32.search_encoded(qt, qw, k=10)
    s16, i16 = e16.search_encoded(qt, qw, k=10)
    s32, i32 = np.asarray(s32), np.asarray(i32)
    s16, i16 = np.asarray(s16), np.asarray(i16)
    # the f16 upload is narrower than the f32 one
    p32 = e32._pack_queries(qt, qw, ())[0]
    p16 = e16._pack_queries(qt, qw, ())[0]
    assert p16.shape[1] < p32.shape[1]
    np.testing.assert_allclose(s16, s32, rtol=2e-3, atol=1e-3)
    for q in range(len(s32)):
        diff = i16[q] != i32[q]
        if diff.any():  # near-tie swaps within f16 resolution only
            np.testing.assert_allclose(s16[q][diff], s32[q][diff],
                                       rtol=2e-3, atol=1e-3)


def test_index_memory_vs_lucene_estimate():
    """Absolute memory gate (BASELINE 'equal index memory'): with the
    delta16 rows + tiny_df_cap=128 the device bytes must stay within
    1.1x of the delta-vint Lucene estimate (2 B/posting + 1 B/doc
    norm). Measured 41.4 B/doc vs 43.3 (0.96x) at 4.19M docs on chip;
    the ratio is scale-stable, so gate it at test scale too
    (VERDICT r3 #6: gates ratchet to the BASELINE targets as met)."""
    from kbner_tpu.retrieval.synth import synth_wiki_docs

    N = 1 << 14
    tok = synth_wiki_docs(N, vocab=20_000, n_topics=N // 64, seed=0)
    index = BM25Index.build_encoded(tok, {i: i for i in range(20_000)})
    engine = RetrievalEngine(index, mode="pruned", rare_terms=16,
                             posting_budget=6144, n_candidates=512,
                             tiny_width=384, tiny_pack=False,
                             tiny_df_cap=128)
    dev_bytes = (sum(int(a.nbytes) for a in engine._device_rows["text"])
                 + sum(int(a.nbytes) for a in engine._device_csr))
    nnz = int((index.doc_terms >= 0).sum())
    lucene = 2 * nnz + N
    ratio = dev_bytes / lucene
    assert ratio <= 1.1, (
        f"device index {dev_bytes / N:.0f} B/doc is {ratio:.2f}x the "
        f"Lucene estimate {lucene / N:.0f} B/doc — the delta16-rows "
        "equal-memory contract regressed")

    # and the memory-lean layout must still be ~exact: recall@10 vs the
    # exhaustive kernel at the same wiki statistics (bench invariant)
    from bench import encode_rows
    from kbner_tpu.ops.bm25 import bm25_topk

    rng = np.random.RandomState(1)
    qt, qw = encode_rows(tok[rng.randint(0, N, size=32)])
    p_scores, p_ids = engine.search_encoded(qt, qw, k=10)
    dtt = jnp.asarray(np.ascontiguousarray(index.doc_terms.T))
    dit = jnp.asarray(np.ascontiguousarray(index.doc_impacts.T))
    e_scores, e_ids = bm25_topk(
        ((jnp.asarray(qt), jnp.asarray(qw), dtt, dit),), k=10,
        doc_chunk=1 << 12)
    e_ids, p_ids = np.asarray(e_ids), np.asarray(p_ids)
    recalls = [len(set(e_ids[i]) & set(p_ids[i])) / 10 for i in range(32)]
    assert np.mean(recalls) >= 0.99, np.mean(recalls)


def test_compact_rows_exact_when_impacts_uniform():
    """With a single distinct impact value the 8-bit log grid is lossless,
    so compact-mode scores must EQUAL the exhaustive engine's — isolating
    the exact-tiny accumulation plumbing from quantization noise."""
    # every doc: same length, disjoint rare vocabulary + one shared term
    docs = [f"u{i} v{i} shared" for i in range(64)]
    index = BM25Index.build(docs, params=BM25Params(quantize_norms=False),
                            pad_docs_to=32)
    eng_ex = RetrievalEngine(index, use_pallas=False, block_d=32)
    eng_c = RetrievalEngine(index, mode="pruned", rare_terms=8,
                            posting_budget=512, n_candidates=32)
    assert eng_c.compact_rows
    queries = [docs[3], docs[17], "u5 shared"]
    r_ex = eng_ex.search(queries, k=3)
    r_c = eng_c.search(queries, k=3)
    for a, b in zip(r_ex, r_c):
        assert [d.doc_id for d in a][:1] == [d.doc_id for d in b][:1]
        by_id = {d.doc_id: d.score for d in a}
        for d in b:
            assert d.score == pytest.approx(by_id[d.doc_id], rel=1e-5)


def test_pruned_topk_duplicate_summing():
    # two candidate entries for the same doc must merge before top-C
    cand_doc = jnp.asarray([[3, 3, 7, -1]], jnp.int32)
    cand_imp = jnp.asarray([[1.0, 2.0, 5.0, 0.0]], jnp.float32)
    # trivial field: doc 3 has term 0 impact 1.0; doc 7 has term 1 imp 1.0
    dterms = jnp.full((8, 2), -1, jnp.int32)
    dterms = dterms.at[3, 0].set(0).at[7, 0].set(1)
    dimps = jnp.zeros((8, 2), jnp.float32)
    dimps = dimps.at[3, 0].set(1.0).at[7, 0].set(4.0)
    qt = jnp.asarray([[0, 1]], jnp.int32)
    qw = jnp.ones((1, 2), jnp.float32)
    scores, ids = bm25_pruned_topk(
        cand_doc, cand_imp, ((qt, qw, dterms, dimps),),
        n_real_docs=8, k=2, n_candidates=4, max_dup_shifts=4)
    ids = np.asarray(ids)[0].tolist()
    scores = np.asarray(scores)[0].tolist()
    # exact rescore: doc 7 -> 4.0, doc 3 -> 1.0
    assert ids == [7, 3]
    assert scores[0] == pytest.approx(4.0)
    assert scores[1] == pytest.approx(1.0)


def test_pruned_dedup_scan_long_runs():
    """The segmented doubling dedup-sum must fully merge runs up to
    max_dup_shifts so pass-1 selection ranks a many-duplicate doc above
    single higher-impact entries; runs LONGER than the window truncate
    (contract: duplicates per doc <= #rare terms <= max_dup_shifts)."""
    P = 64
    # doc 5: 16 duplicate entries of impact 1.0 (run sum 16); docs
    # 10..19: one entry of impact 10. With n_candidates=2 doc 5 only
    # survives pass 1 if its run sums to 16 > 10. A 20-long run for doc
    # 77 (beyond the 16 window) must not crash or double-count.
    docs = [5] * 16 + list(range(10, 20)) + [77] * 20
    imps = [1.0] * 16 + [10.0] * 10 + [0.1] * 20
    docs += [-1] * (P - len(docs))
    imps += [0.0] * (P - len(imps))
    cand_doc = jnp.asarray([docs], jnp.int32)
    cand_imp = jnp.asarray([imps], jnp.float32)
    N = 100
    dterms = jnp.full((N, 1), -1, jnp.int32)
    dimps = jnp.zeros((N, 1), jnp.float32)
    for d, v in [(5, 3.0), (77, 0.5)] + [(d, 1.0) for d in range(10, 20)]:
        dterms = dterms.at[d, 0].set(0)
        dimps = dimps.at[d, 0].set(v)
    qt = jnp.asarray([[0]], jnp.int32)
    qw = jnp.ones((1, 1), jnp.float32)
    scores, ids = bm25_pruned_topk(
        cand_doc, cand_imp, ((qt, qw, dterms, dimps),),
        n_real_docs=N, k=2, n_candidates=2, max_dup_shifts=16)
    ids = np.asarray(ids)[0].tolist()
    assert ids[0] == 5  # run-sum 16 beats the 10.0 singletons
    assert ids[1] in range(10, 20)
    assert np.asarray(scores)[0][0] == pytest.approx(3.0)


def test_langwiki_routing(corpus_index):
    docs, index = corpus_index
    from kbner_tpu.retrieval.engine import DocStore, langwiki_search

    # langwiki routing: per-query language index selection
    eng = RetrievalEngine(index, store=DocStore(sentences=docs),
                          use_pallas=False, block_d=64)
    res = langwiki_search({"en": eng}, [docs[0], docs[1]], ["en", "xx"], k=3)
    assert len(res[0]) > 0 and res[1] == []  # unknown language -> empty


def test_pruned_sharded_matches_unsharded(corpus_index):
    from kbner_tpu.parallel import make_mesh

    docs, index = corpus_index
    rng = np.random.RandomState(2)
    queries = [docs[i] for i in rng.randint(0, len(docs), 8)]
    single = RetrievalEngine(index, mode="pruned", rare_terms=8,
                             posting_budget=2048, n_candidates=64)
    mesh = make_mesh(data=8, model=1)
    sharded = RetrievalEngine(index, mode="pruned", rare_terms=8,
                              posting_budget=2048, n_candidates=64,
                              mesh=mesh)
    r1 = single.search(queries, k=5)
    r8 = sharded.search(queries, k=5)
    for a, b in zip(r1, r8):
        assert {d.doc_id for d in a} == {d.doc_id for d in b}
        np.testing.assert_allclose(
            sorted(d.score for d in a), sorted(d.score for d in b),
            rtol=1e-5)


def test_pruned_sharded_jit_is_cached(corpus_index):
    """The meshed pruned search must reuse one compiled closure across
    query batches (it used to rebuild jit(shard_map(...)) per call)."""
    from kbner_tpu.parallel import make_mesh

    docs, index = corpus_index
    mesh = make_mesh(data=8, model=1)
    eng = RetrievalEngine(index, mode="pruned", rare_terms=8,
                          posting_budget=2048, n_candidates=64, mesh=mesh)
    eng.search([docs[0], docs[1]], k=5)
    eng.search([docs[2], docs[3]], k=5)
    assert len(eng._pruned_cache) == 1
    (run,) = eng._pruned_cache.values()
    assert run._cache_size() == 1  # second batch hit the jit cache


def test_query_truncation_keeps_rare_terms():
    """Over-long queries keep the highest-idf terms and drop OOV first
    (index.py encode_queries), instead of arbitrary insertion order."""
    docs = ["common filler"] * 20 + ["common rareword special"]
    index = BM25Index.build(docs, pad_docs_to=8)
    q = "unknownoov common rareword"
    q_terms, q_weights = index.encode_queries([q], max_query_terms=2)
    kept = set(q_terms[0].tolist())
    assert index.vocab["rareword"] in kept  # rarest survives
    assert index.vocab["common"] in kept    # in-vocab beats OOV
    # with one slot, only the rarest survives
    q_terms1, _ = index.encode_queries([q], max_query_terms=1)
    assert q_terms1[0, 0] == index.vocab["rareword"]


def test_rescore_pallas_matches_xla():
    """The Pallas pass-2 rescore kernel (interpret mode on CPU) matches
    the XLA broadcast-compare formulation on the same quantized rows."""
    from kbner_tpu.ops.bm25 import bm25_rescore_pallas

    rng = np.random.RandomState(0)
    Q, Lq, Ld, C = 16, 12, 20, 256
    qt = rng.randint(-1, 50, size=(Q, Lq)).astype(np.int32)
    qw = rng.rand(Q, Lq).astype(np.float32)
    dt = rng.randint(-1, 50, size=(Q, C, Ld)).astype(np.int32)
    codes = rng.randint(0, 1 << 16, size=(Q, C, Ld)).astype(np.int32)
    lo, step = -2.0, 1e-4

    di = np.where(codes > 0, np.exp(lo + (codes - 1.0) * step), 0.0)
    want = np.zeros((Q, C), np.float32)
    for l in range(Lq):
        m = dt == qt[:, l][:, None, None]
        want += qw[:, l][:, None] * np.where(m, di, 0.0).sum(-1)

    got = bm25_rescore_pallas(
        jnp.asarray(qt), jnp.asarray(qw),
        jnp.asarray(np.swapaxes(dt, 1, 2).copy()),
        jnp.asarray(np.swapaxes(codes, 1, 2).copy()),
        lo=lo, step=step)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_pruned_pallas_rescore_end_to_end(corpus_index):
    """use_pallas pruned engine returns the same docs as the XLA path."""
    docs, index = corpus_index
    rng = np.random.RandomState(3)
    queries = [docs[i] for i in rng.randint(0, len(docs), 16)]
    a = RetrievalEngine(index, mode="pruned", rare_terms=8,
                        posting_budget=2048, n_candidates=128,
                        use_pallas=False).search(queries, k=5)
    b = RetrievalEngine(index, mode="pruned", rare_terms=8,
                        posting_budget=2048, n_candidates=128,
                        use_pallas=True).search(queries, k=5)
    for ra, rb in zip(a, b):
        assert [d.doc_id for d in ra] == [d.doc_id for d in rb]
        np.testing.assert_allclose(
            [d.score for d in ra], [d.score for d in rb], rtol=1e-5)


def test_pruned_entity_boost_matches_exhaustive(corpus_index):
    """Entity-boosted (title-field) pruned search returns the same docs
    as the exhaustive engine — the packed-query multi-field path
    (generate_data.py's bool.should + title boost 2.0 semantics)."""
    docs, index = corpus_index
    rng = np.random.RandomState(5)
    titles = [" ".join(d.split()[:2]) for d in docs]
    tidx = BM25Index.build(titles, params=BM25Params(quantize_norms=False),
                           pad_docs_to=64)
    queries = [docs[i] for i in rng.randint(0, len(docs), 8)]
    ents = [[t] for t in (titles[i] for i in rng.randint(0, len(docs), 8))]

    exact = RetrievalEngine(index, title_index=tidx, use_pallas=False,
                            block_d=64)
    pruned = RetrievalEngine(index, title_index=tidx, mode="pruned",
                             rare_terms=12, posting_budget=4096,
                             n_candidates=256)
    re_ = exact.search(queries, k=5, entity_queries=ents)
    rp = pruned.search(queries, k=5, entity_queries=ents)
    for a, b in zip(re_, rp):
        assert {d.doc_id for d in a} == {d.doc_id for d in b}
        np.testing.assert_allclose(
            sorted(d.score for d in a), sorted(d.score for d in b),
            rtol=2e-3)  # 12-bit log-quantized row impacts


def test_search_stream_matches_batchwise(corpus_index):
    """The pipelined stream yields exactly the per-batch results, in
    order (upload/compute overlap must not reorder or corrupt)."""
    docs, index = corpus_index
    engine = RetrievalEngine(index, mode="pruned", rare_terms=12,
                             posting_budget=4096, n_candidates=128)
    rng = np.random.RandomState(7)
    batches = [index.encode_queries(
        [docs[i] for i in rng.randint(0, len(docs), 16)])
        for _ in range(4)]
    for workers, depth in [(2, 1), (3, 2), (1, 4)]:
        got = list(engine.search_stream(
            batches, k=5, workers=workers, depth=depth))
        assert len(got) == 4
        for (qt, qw), (s, i) in zip(batches, got):
            s2, i2 = engine._search_pruned(qt, qw, 5, None, None)
            np.testing.assert_array_equal(i, i2)
            np.testing.assert_allclose(s, s2, rtol=1e-6)


def test_packed_kernel_matches_two_operand(corpus_index):
    """The single-key packed kernel returns the same top-k as the
    two-operand reference kernel on identical candidate pools."""
    import jax.numpy as jnp
    from kbner_tpu.ops.bm25 import (bm25_pruned_topk_packed,
                                    gather_pruned_candidate_keys,
                                    gather_pruned_candidates)

    docs, index = corpus_index
    eng = RetrievalEngine(index, mode="pruned", rare_terms=12,
                          posting_budget=4096, n_candidates=128,
                          compact_rows=False, row_layout="packed32")
    rng = np.random.RandomState(3)
    queries = [docs[i] for i in rng.randint(0, len(docs), 8)]
    qt, qw = index.encode_queries(queries)
    rare = eng._select_rare_terms(qt)
    off, pk = eng._device_csr
    lo, step = eng._csr_scale
    cd, ci = gather_pruned_candidates(jnp.asarray(rare), off, pk,
                                      eng.per_term_cap, lo, step)
    keys = gather_pruned_candidate_keys(jnp.asarray(rare), off, pk,
                                        eng.per_term_cap)
    _tag, tb, rlo, rstep, r2 = eng._row_meta["text"]
    flat, doff, dlen = eng._device_rows["text"]
    qwf = eng._fold_weights(qt, qw, "text")
    fields = ((jnp.asarray(qt), jnp.asarray(qwf), flat, doff, dlen, tb,
               rlo, rstep),)
    s1, i1 = bm25_pruned_topk(cd, ci, fields, n_real_docs=index.n_docs,
                              k=10, n_candidates=128, max_dup_shifts=12,
                              ragged_rows=(r2,))
    s2, i2 = bm25_pruned_topk_packed(
        keys, fields, n_real_docs=index.n_docs, k=10, n_candidates=128,
        max_dup_shifts=12, imp_lo=lo, imp_step=step, ragged_rows=(r2,))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_slice_tiny_per_shard_roundtrip(corpus_index):
    """The host-side per-shard tiny-block slicer must conserve every
    (query, doc, exact-sum) entry with shard-LOCAL doc ids (VERDICT r3
    #10: the old path broadcast the global block to every shard)."""
    from kbner_tpu.parallel import make_mesh

    docs, index = corpus_index
    mesh = make_mesh(data=8, model=1)
    eng = RetrievalEngine(index, mode="pruned", rare_terms=8,
                          posting_budget=2048, n_candidates=64, mesh=mesh)
    qt, qw = index.encode_queries([docs[0], docs[5], docs[9]])
    t_doc, _, t_ex = eng._gather_tiny_exact(qt, qw)
    block, tb = eng._slice_tiny_per_shard(t_doc, t_ex)
    assert block.shape == (eng.n_shards, qt.shape[0], 2 * tb)
    got = set()
    ss = eng._shard_size
    for s in range(eng.n_shards):
        d = block[s, :, :tb]
        ex = -block[s, :, tb:].view(np.float32)
        for q in range(qt.shape[0]):
            for j in range(tb):
                if d[q, j] >= 0:
                    assert 0 <= d[q, j] < ss  # local coordinates
                    got.add((q, int(d[q, j]) + s * ss, float(ex[q, j])))
    want = {(q, int(t_doc[q, j]), float(t_ex[q, j]))
            for q in range(qt.shape[0]) for j in range(t_doc.shape[1])
            if t_doc[q, j] >= 0}
    assert got == want


def test_mix_search_pipelined_matches_serial(corpus_index):
    """Pipelined mix fan-out (dispatch all engines, then pull) returns
    exactly what per-engine serial searches would (VERDICT r3 #8)."""
    from kbner_tpu.retrieval import DocStore, mix_search

    docs, index = corpus_index
    other_docs = make_corpus(n_docs=200, vocab=300, seed=7)
    other = BM25Index.build(other_docs,
                            params=BM25Params(quantize_norms=False),
                            pad_docs_to=64)
    engines = {
        "en": RetrievalEngine(index, store=DocStore(sentences=list(docs)),
                              mode="pruned", rare_terms=8,
                              posting_budget=2048, n_candidates=64),
        "de": RetrievalEngine(other,
                              store=DocStore(sentences=list(other_docs)),
                              use_pallas=False, block_d=64),
    }
    queries = [docs[0], other_docs[3], docs[7]]
    merged = mix_search(engines, queries, k=5)
    # serial reference: per-engine .search + score merge
    serial = {lang: eng.search(queries, k=5)
              for lang, eng in engines.items()}
    for qi in range(len(queries)):
        rows = [(lang, d) for lang, res in serial.items()
                for d in res[qi]]
        rows.sort(key=lambda x: -x[1].score)
        want = [(lang, d.doc_id, pytest.approx(d.score, rel=1e-6))
                for lang, d in rows[:5]]
        got = [(lang, d.doc_id, d.score) for lang, d in merged[qi]]
        assert got == want


def test_deep_windows_recall_and_scores(corpus_index):
    """deep_terms extends the RAREST selected terms' pass-1 windows to
    deep_cap (r5 miss diagnosis: residual misses are docs carried by one
    mid-df term past the uniform window). With deep windows covering the
    full posting depth, a starved budget must recover the misses; scores
    of commonly-returned docs stay identical to the shallow engine's
    (pass 2 is untouched)."""
    docs, index = corpus_index
    rng = np.random.RandomState(11)
    queries = [docs[i] for i in rng.randint(0, len(docs), 16)]

    exact = RetrievalEngine(index, use_pallas=False, block_d=64)
    # starved uniform windows: per_term_cap = 256//8 = 32 postings
    shallow = RetrievalEngine(index, mode="pruned", rare_terms=8,
                              posting_budget=256, n_candidates=128)
    deep = RetrievalEngine(index, mode="pruned", rare_terms=8,
                           posting_budget=256, n_candidates=128,
                           deep_terms=4, deep_cap=1024)
    assert deep.per_term_cap == shallow.per_term_cap == 32

    def mean_recall(eng):
        res = eng.search(queries, k=10)
        r_exact = exact.search(queries, k=10)
        recalls = []
        for a, b in zip(r_exact, res):
            want = {d.doc_id for d in a}
            if want:
                recalls.append(
                    len(want & {d.doc_id for d in b}) / len(want))
        return float(np.mean(recalls))

    r_shallow, r_deep = mean_recall(shallow), mean_recall(deep)
    assert r_deep >= r_shallow
    assert r_deep >= 0.99, (r_shallow, r_deep)

    # identical pass-2 scores for docs both engines return
    rs, rd = shallow.search(queries, k=10), deep.search(queries, k=10)
    for a, b in zip(rs, rd):
        sa = {d.doc_id: d.score for d in a}
        for d in b:
            if d.doc_id in sa:
                assert d.score == pytest.approx(sa[d.doc_id], rel=1e-6)


def test_deep_windows_validation():
    docs = make_corpus(n_docs=100, vocab=200, seed=9)
    index = BM25Index.build(docs, params=BM25Params(quantize_norms=False),
                            pad_docs_to=64)
    with pytest.raises(ValueError, match="deep_terms"):
        RetrievalEngine(index, mode="pruned", rare_terms=8,
                        deep_terms=12, deep_cap=512)
    with pytest.raises(ValueError, match="unsharded"):
        RetrievalEngine(index, mode="exhaustive", deep_terms=2,
                        deep_cap=512)
