"""Native (C++) index-build helpers: build_csr / compact_tiny / csr_cap /
pack_ragged parity against the NumPy reference paths they replace
(the upload-path hotspots: lexsort-based CSR build and the ragged-row
scatter, engine.py / index.py)."""

import numpy as np
import pytest

from kbner_tpu import native


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.default_rng(0)
    N, Ld, V = 5000, 20, 3000
    dt = np.where(rng.random((N, Ld)) < 0.8,
                  rng.integers(0, V, (N, Ld)), -1).astype(np.int32)
    order = np.argsort(dt < 0, axis=1, kind="stable")  # left-pack
    dt = np.take_along_axis(dt, order, axis=1)
    di = ((rng.random((N, Ld)).astype(np.float32) + 0.01)
          * (dt >= 0)).astype(np.float32)
    return dt, di, V


@pytest.fixture(scope="module")
def csr(arrays):
    dt, di, V = arrays
    res = native.build_csr(dt, di, V)
    if res is None:
        pytest.skip("native library unavailable")
    return res


def test_build_csr_matches_lexsort(arrays, csr):
    dt, di, V = arrays
    valid = dt >= 0
    terms = dt[valid]
    docs = np.nonzero(valid)[0].astype(np.int32)
    imps = di[valid]
    order = np.lexsort((-imps, terms))  # stable: ties keep doc order
    df_ref = np.bincount(terms[order], minlength=V)
    off_ref = np.zeros(V + 1, np.int64)
    np.cumsum(df_ref, out=off_ref[1:])

    off, p_doc, p_imp, df = csr
    assert np.array_equal(off, off_ref)
    assert np.array_equal(df, df_ref)
    assert np.array_equal(p_imp, imps[order])
    assert np.array_equal(p_doc, docs[order])


def test_compact_tiny_matches_numpy(arrays, csr):
    dt, di, V = arrays
    df = csr[3]
    tiny_cap = 5
    keep = dt >= 0
    keep[keep] = df[dt[keep]] > tiny_cap
    new_len = keep.sum(1)
    ld2 = max(int(new_len.max()), 1)
    dt_ref = np.full((len(dt), ld2), -1, np.int32)
    di_ref = np.zeros((len(dt), ld2), np.float32)
    rows = np.nonzero(keep)[0]
    cols = (np.cumsum(keep, 1) - 1)[keep]
    dt_ref[rows, cols] = dt[keep]
    di_ref[rows, cols] = di[keep]

    dt2, di2 = native.compact_tiny(dt, di, df, tiny_cap)
    assert np.array_equal(dt2, dt_ref)
    assert np.array_equal(di2, di_ref)


@pytest.mark.parametrize("cap,min_df", [(8, 0), (8, 3), (0, 3)])
def test_csr_cap_matches_numpy(csr, cap, min_df):
    off, p_doc, p_imp, df = csr
    starts = off[:-1]
    pos = np.arange(len(p_doc), dtype=np.int64) - np.repeat(starts, df)
    df_c = df.copy()
    keep = np.ones(len(p_doc), bool)
    if cap > 0:
        keep &= pos < cap
        np.minimum(df_c, cap, out=df_c)
    if min_df > 0:
        tiny = df <= min_df
        keep &= ~np.repeat(tiny, df)
        df_c[tiny] = 0
    off_ref = np.zeros(len(df) + 1, np.int64)
    np.cumsum(df_c, out=off_ref[1:])

    r = native.csr_cap(off, p_doc, p_imp, df, cap, min_df)
    assert r is not None
    assert np.array_equal(r[0], off_ref)
    assert np.array_equal(r[1], p_doc[keep])
    assert np.array_equal(r[2], p_imp[keep])


def test_pack_ragged_matches_numpy(arrays):
    from kbner_tpu.retrieval.engine import _pack_doc_rows_ragged

    dt, di, V = arrays
    flat, off, lens, term_bits, lo, step, r2 = _pack_doc_rows_ragged(
        dt, di, V)
    # independent unpack check: every real slot decodes back to its term
    # id and a code whose dequantized impact is within half a step
    mask = (1 << term_bits) - 1
    levels = (1 << (32 - term_bits)) - 2
    n_checked = 0
    for d in range(0, len(dt), 97):
        L = int(lens[d])
        seg = flat.ravel()[int(off[d]): int(off[d]) + L]
        terms = seg.view(np.uint32) & mask
        codes = seg.view(np.uint32) >> term_bits
        real = dt[d][dt[d] >= 0]
        assert np.array_equal(terms.astype(np.int64), real.astype(np.int64))
        imp = di[d][dt[d] >= 0]
        deq = np.where(codes > 0, np.exp(lo + (codes.astype(np.float64) - 1)
                                         * step), 0.0)
        assert np.allclose(np.log(np.maximum(deq, 1e-30)),
                           np.log(np.maximum(imp, 1e-30)),
                           atol=step / 2 + 1e-9)
        n_checked += 1
    assert n_checked > 10


def test_pack_ragged_native_numpy_agree(arrays, monkeypatch):
    """The native fused pack and the NumPy fallback fill identical rows
    (same scale passed to both)."""
    from kbner_tpu.retrieval import engine as eng_mod

    dt, di, V = arrays
    out_native = eng_mod._pack_doc_rows_ragged(dt, di, V)
    if native._load() is None:
        pytest.skip("native library unavailable")
    monkeypatch.setattr(eng_mod, "native_pack_ragged",
                        lambda *a, **k: False, raising=False)
    monkeypatch.setattr("kbner_tpu.native.pack_ragged",
                        lambda *a, **k: False)
    out_numpy = eng_mod._pack_doc_rows_ragged(dt, di, V)
    assert np.array_equal(out_native[0], out_numpy[0])
    assert np.array_equal(out_native[1], out_numpy[1])
    assert np.array_equal(out_native[2], out_numpy[2])
    assert out_native[3:] == out_numpy[3:]


def test_pack_ragged_per_term_scale(arrays):
    """Per-term scale mode: codes store ln(imp) - term_lo[t]; decode with
    lo=0 and the base folded into the query weight reproduces the true
    impact to within step/2 — and the step is (much) finer than the
    global-scale step for the same bit budget."""
    from kbner_tpu.retrieval.engine import (_pack_doc_rows_ragged,
                                            _term_scale_from_csr)
    from kbner_tpu.retrieval import BM25Index, BM25Params

    dt, di, V = arrays
    term_bits = max(int(np.ceil(np.log2(V + 2))), 1)
    code_bits = 32 - term_bits

    # term scale from a real index csr over the same arrays
    class FakeIdx:
        pass
    idx = FakeIdx()
    idx.vocab = {i: i for i in range(V)}
    res = native.build_csr(dt, di, V)
    idx.csr = res
    term_lo, step = _term_scale_from_csr(idx, code_bits)
    assert term_lo.shape == (V,)

    g = _pack_doc_rows_ragged(dt, di, V)           # global scale
    p = _pack_doc_rows_ragged(dt, di, V, scale=(term_lo, step))
    assert p[4] == 0.0                              # lo folded out
    assert p[6] == g[6]
    assert step < g[5]                              # finer quantization

    flat, off, lens, tb, lo, st, r2 = p
    mask = (1 << tb) - 1
    for d in range(0, len(dt), 131):
        L = int(lens[d])
        seg = flat.ravel()[int(off[d]): int(off[d]) + L]
        terms = (seg.view(np.uint32) & mask).astype(np.int64)
        codes = seg.view(np.uint32) >> tb
        true = di[d][dt[d] >= 0]
        deq = np.where(
            codes > 0,
            np.exp(term_lo[terms].astype(np.float64)
                   + (codes.astype(np.float64) - 1) * st), 0.0)
        ok = true > 0
        assert np.allclose(np.log(np.maximum(deq[ok], 1e-30)),
                           np.log(true[ok]), atol=st / 2 + 1e-9)


def test_pack_ragged_per_term_native_numpy_agree(arrays, monkeypatch):
    from kbner_tpu.retrieval import engine as eng_mod
    from kbner_tpu.retrieval.engine import _term_scale_from_csr

    dt, di, V = arrays
    if native._load() is None:
        pytest.skip("native library unavailable")

    class FakeIdx:
        pass
    idx = FakeIdx()
    idx.vocab = {i: i for i in range(V)}
    idx.csr = native.build_csr(dt, di, V)
    term_bits = max(int(np.ceil(np.log2(V + 2))), 1)
    term_lo, step = _term_scale_from_csr(idx, 32 - term_bits)

    a = eng_mod._pack_doc_rows_ragged(dt, di, V, scale=(term_lo, step))
    monkeypatch.setattr("kbner_tpu.native.pack_ragged",
                        lambda *args, **kw: False)
    b = eng_mod._pack_doc_rows_ragged(dt, di, V, scale=(term_lo, step))
    assert np.array_equal(a[0], b[0])
