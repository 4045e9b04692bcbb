"""Native (C++) runtime components, loaded via ctypes.

The reference's native pieces live in external processes (Elasticsearch's
Lucene, cuDNN); here the native data path is in-repo: ``postings.cc`` is the
posting-gather engine feeding the TPU's pruned BM25 kernels. A NumPy
fallback keeps everything functional when the shared library hasn't been
built (``python -m kbner_tpu.native`` builds it).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libpostings.so"
_LIB: Optional[ctypes.CDLL] = None
_SO_ANALYZER = _DIR / "libanalyzer.so"
_LIB_ANALYZER: Optional[ctypes.CDLL] = None


def _compile(src_name: str, so_path: Path, force: bool) -> bool:
    # stale .so (older than its source) is rebuilt automatically
    if (so_path.exists() and not force
            and so_path.stat().st_mtime >= (_DIR / src_name).stat().st_mtime):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_DIR / src_name),
             "-o", str(so_path)],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def build_library(force: bool = False) -> bool:
    """Compile libpostings.so with g++; returns True on success."""
    return _compile("postings.cc", _SO, force)


def build_analyzer_library(force: bool = False) -> bool:
    """Compile libanalyzer.so with g++; returns True on success."""
    return _compile("analyzer.cc", _SO_ANALYZER, force)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not build_library() and not _SO.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.gather_postings.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gather_postings.restype = None
    lib.tiny_exact.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tiny_exact.restype = ctypes.c_int64
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _f32p = ctypes.POINTER(ctypes.c_float)
    try:  # symbols added after the first .so release; stale lib = no-op
        lib.build_csr.argtypes = [
            _i32p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _i64p, _i64p, _i32p, _f32p]
        lib.build_csr.restype = None
        lib.compact_tiny.argtypes = [
            _i32p, _f32p, _i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, _i32p, _f32p, _i32p]
        lib.compact_tiny.restype = None
        lib.csr_cap.argtypes = [
            _i64p, _i32p, _f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _i64p, _i32p, _f32p]
        lib.csr_cap.restype = None
        lib.pack_ragged.argtypes = [
            _i32p, _f32p, _i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, _f32p, _i32p]
        lib.pack_ragged.restype = None
        lib.pack_delta16.argtypes = [
            _i32p, _i32p, _i32p, ctypes.POINTER(ctypes.c_uint8), _i64p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16)]
        lib.pack_delta16.restype = None
        lib.delta16_lens.argtypes = [
            _i32p, _f32p, _i32p, _f32p, _f32p,
            ctypes.c_int64, ctypes.c_int64, _i64p]
        lib.delta16_lens.restype = None
        lib.delta16_emit.argtypes = [
            _i32p, _f32p, _i32p, _f32p, _f32p, _i64p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16)]
        lib.delta16_emit.restype = None
    except AttributeError:
        pass
    _LIB = lib
    return lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def build_csr(doc_terms: np.ndarray, doc_impacts: np.ndarray,
              vocab_size: int):
    """Native impact-ordered CSR build (postings.cc::build_csr): returns
    (offsets int64 [V+1], doc ids int32 [NNZ], impacts f32 [NNZ],
    df int64 [V]) matching ``np.lexsort((-imps, terms))`` ordering, or
    None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "build_csr"):
        return None
    dt = np.ascontiguousarray(doc_terms, np.int32)
    di = np.ascontiguousarray(doc_impacts, np.float32)
    N, Ld = dt.shape
    V = int(vocab_size)
    nnz = int((dt >= 0).sum())
    offsets = np.zeros(V + 1, np.int64)
    df = np.zeros(V, np.int64)
    out_doc = np.empty(nnz, np.int32)
    out_imp = np.empty(nnz, np.float32)
    lib.build_csr(_ptr(dt, ctypes.c_int32), _ptr(di, ctypes.c_float),
                  N, Ld, V, _ptr(offsets, ctypes.c_int64),
                  _ptr(df, ctypes.c_int64), _ptr(out_doc, ctypes.c_int32),
                  _ptr(out_imp, ctypes.c_float))
    return offsets, out_doc, out_imp, df


def compact_tiny(doc_terms: np.ndarray, doc_impacts: np.ndarray,
                 df: np.ndarray, tiny_cap: int):
    """Native tiny-slot compaction (postings.cc::compact_tiny): returns
    (dt2 [N, Ld2] pad -1, di2 [N, Ld2]) with df<=tiny_cap slots removed,
    or None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "compact_tiny"):
        return None
    dt = np.ascontiguousarray(doc_terms, np.int32)
    di = np.ascontiguousarray(doc_impacts, np.float32)
    dfc = np.ascontiguousarray(df, np.int64)
    N, Ld = dt.shape
    lens = np.empty(N, np.int32)
    none32 = np.empty(0, np.int32)
    nonef = np.empty(0, np.float32)
    lib.compact_tiny(_ptr(dt, ctypes.c_int32), _ptr(di, ctypes.c_float),
                     _ptr(dfc, ctypes.c_int64), tiny_cap, N, Ld, 0,
                     _ptr(none32, ctypes.c_int32),
                     _ptr(nonef, ctypes.c_float),
                     _ptr(lens, ctypes.c_int32))
    ld2 = max(int(lens.max(initial=0)), 1)
    dt2 = np.full((N, ld2), -1, np.int32)
    di2 = np.zeros((N, ld2), np.float32)
    lib.compact_tiny(_ptr(dt, ctypes.c_int32), _ptr(di, ctypes.c_float),
                     _ptr(dfc, ctypes.c_int64), tiny_cap, N, Ld, ld2,
                     _ptr(dt2, ctypes.c_int32), _ptr(di2, ctypes.c_float),
                     _ptr(lens, ctypes.c_int32))
    return dt2, di2


def pack_ragged(doc_terms: np.ndarray, doc_impacts: np.ndarray,
                off: np.ndarray, term_bits: int, lo: float, step: float,
                levels: int, flat: np.ndarray,
                term_lo: Optional[np.ndarray] = None) -> bool:
    """Native fused quantize+pack of the ragged pass-2 rows into ``flat``
    (in place). ``term_lo`` ([V] f32) switches to per-term log bases.
    Returns False when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "pack_ragged"):
        return False
    dt = np.ascontiguousarray(doc_terms, np.int32)
    di = np.ascontiguousarray(doc_impacts, np.float32)
    offc = np.ascontiguousarray(off, np.int64)
    assert flat.dtype == np.int32 and flat.flags.c_contiguous
    N, Ld = dt.shape
    if term_lo is not None:
        term_lo = np.ascontiguousarray(term_lo, np.float32)
        tl_ptr = _ptr(term_lo, ctypes.c_float)
    else:
        tl_ptr = ctypes.POINTER(ctypes.c_float)()
    lib.pack_ragged(_ptr(dt, ctypes.c_int32), _ptr(di, ctypes.c_float),
                    _ptr(offc, ctypes.c_int64), N, Ld, term_bits,
                    float(lo), float(step), levels, tl_ptr,
                    _ptr(flat, ctypes.c_int32))
    return True


def pack_delta16(rem: np.ndarray, tf: np.ndarray, n_cont: np.ndarray,
                 valid: np.ndarray, off: np.ndarray,
                 flat: np.ndarray) -> bool:
    """Native emission of the delta16 slot stream (engine.py::
    _pack_doc_rows_delta16): per valid (doc, j) posting, ``n_cont``
    continuation slots then ``(rem << 3) | tf``, written at the doc's
    ``off`` slot cursor. Returns False when unavailable (NumPy fallback
    in the caller)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pack_delta16"):
        return False
    N, L = rem.shape
    remc = np.ascontiguousarray(rem, np.int32)
    tfc = np.ascontiguousarray(tf, np.int32)
    ncc = np.ascontiguousarray(n_cont, np.int32)
    vc = np.ascontiguousarray(valid, np.uint8)
    offc = np.ascontiguousarray(off, np.int64)
    assert flat.dtype == np.uint16 and flat.flags.c_contiguous
    lib.pack_delta16(_ptr(remc, ctypes.c_int32), _ptr(tfc, ctypes.c_int32),
                     _ptr(ncc, ctypes.c_int32), _ptr(vc, ctypes.c_uint8),
                     _ptr(offc, ctypes.c_int64), N, L,
                     _ptr(flat, ctypes.c_uint16))
    return True


def delta16_rows(dt: np.ndarray, di: np.ndarray, remap: np.ndarray,
                 idf: np.ndarray, norm: np.ndarray):
    """Fused native delta16 transform: returns a ``(lens, emit)`` pair —
    ``lens`` [N] int64 slot counts, and ``emit(off, flat)`` writing each
    doc's slots at its assigned offset — or None when the library is
    unavailable (the caller falls back to NumPy)."""
    lib = _load()
    if lib is None or not hasattr(lib, "delta16_lens"):
        return None
    N, L = dt.shape
    dtc = np.ascontiguousarray(dt, np.int32)
    dic = np.ascontiguousarray(di, np.float32)
    rmc = np.ascontiguousarray(remap, np.int32)
    idfc = np.ascontiguousarray(idf, np.float32)
    nrmc = np.ascontiguousarray(norm, np.float32)
    lens = np.zeros(max(N, 1), np.int64)
    lib.delta16_lens(_ptr(dtc, ctypes.c_int32), _ptr(dic, ctypes.c_float),
                     _ptr(rmc, ctypes.c_int32), _ptr(idfc, ctypes.c_float),
                     _ptr(nrmc, ctypes.c_float), N, L,
                     _ptr(lens, ctypes.c_int64))

    def emit(off: np.ndarray, flat: np.ndarray) -> None:
        offc = np.ascontiguousarray(off, np.int64)
        assert flat.dtype == np.uint16 and flat.flags.c_contiguous
        lib.delta16_emit(
            _ptr(dtc, ctypes.c_int32), _ptr(dic, ctypes.c_float),
            _ptr(rmc, ctypes.c_int32), _ptr(idfc, ctypes.c_float),
            _ptr(nrmc, ctypes.c_float), _ptr(offc, ctypes.c_int64), N, L,
            _ptr(flat, ctypes.c_uint16))

    return lens, emit


def csr_cap(offsets: np.ndarray, p_doc: np.ndarray, p_imp: np.ndarray,
            df: np.ndarray, cap: int, min_df: int):
    """Native capped/min_df-filtered CSR copy (postings.cc::csr_cap):
    returns (offsets int64 [V+1], doc ids, impacts) or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "csr_cap"):
        return None
    off = np.ascontiguousarray(offsets, np.int64)
    pd = np.ascontiguousarray(p_doc, np.int32)
    pi = np.ascontiguousarray(p_imp, np.float32)
    V = len(off) - 1
    df_c = np.asarray(df, np.int64)
    if cap > 0:
        df_c = np.minimum(df_c, cap)
    if min_df > 0:
        df_c = np.where(np.asarray(df, np.int64) <= min_df, 0, df_c)
    out_off = np.zeros(V + 1, np.int64)
    np.cumsum(df_c, out=out_off[1:])
    nnz = int(out_off[-1])
    out_doc = np.empty(nnz, np.int32)
    out_imp = np.empty(nnz, np.float32)
    lib.csr_cap(_ptr(off, ctypes.c_int64), _ptr(pd, ctypes.c_int32),
                _ptr(pi, ctypes.c_float), V, cap, min_df,
                _ptr(out_off, ctypes.c_int64),
                _ptr(out_doc, ctypes.c_int32),
                _ptr(out_imp, ctypes.c_float))
    return out_off, out_doc, out_imp


# reusable dense accumulators for tiny_exact, keyed by n_docs
_TINY_SCRATCH: dict = {}
_TINY_EPOCH = [1]


def gather_tiny_exact(offsets, p_doc, p_imp, q_terms, q_weights, is_tiny,
                      n_docs):
    """Native tiny-exact gather (see postings.cc::tiny_exact): per query,
    dedup-accumulated (impact, weight*impact) sums over every posting of
    every tiny query term — the compact-rows engine's host-side exact
    block. Returns (doc [Q, T], imp, exact) or None when the native
    library is unavailable (callers fall back to vectorized NumPy)."""
    lib = _load()
    if lib is None:
        return None
    Q, L = q_terms.shape
    offsets = np.ascontiguousarray(offsets, np.int64)
    p_doc = np.ascontiguousarray(p_doc, np.int32)
    p_imp = np.ascontiguousarray(p_imp, np.float32)
    qt = np.ascontiguousarray(q_terms, np.int32)
    qw = np.ascontiguousarray(q_weights, np.float32)
    tiny = np.ascontiguousarray(is_tiny, np.uint8)
    key = int(n_docs)
    if key not in _TINY_SCRATCH:
        _TINY_SCRATCH[key] = (
            np.zeros(n_docs, np.int32), np.empty(n_docs, np.float32),
            np.empty(n_docs, np.float32), np.empty(n_docs, np.int32))
    ep, im, ex, dl = _TINY_SCRATCH[key]
    if _TINY_EPOCH[0] > 2**31 - 4 * Q:
        ep[:] = 0
        _TINY_EPOCH[0] = 1

    def call(T, out_doc, out_imp, out_ex):
        base = _TINY_EPOCH[0]
        _TINY_EPOCH[0] += Q
        return int(lib.tiny_exact(
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            p_doc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            p_imp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            qt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            qw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tiny.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            Q, L, T, n_docs,
            ep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ex.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            base,
            out_doc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_imp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_ex.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ))

    none = np.empty(0, np.int32), np.empty(0, np.float32), np.empty(
        0, np.float32)
    max_docs = call(0, *none)  # measuring pass (no output)
    T = ((max_docs + 127) // 128) * 128
    out_doc = np.full((Q, T), -1, np.int32)
    out_imp = np.zeros((Q, T), np.float32)
    out_ex = np.zeros((Q, T), np.float32)
    if T:
        call(T, out_doc, out_imp, out_ex)
    return out_doc, out_imp, out_ex


def gather_postings(
    offsets: np.ndarray,  # [V+1] int64
    postings_doc: np.ndarray,  # [NNZ] int32
    postings_imp: np.ndarray,  # [NNZ] float32
    q_terms: np.ndarray,  # [Q, M] int32, <0 = empty
    budget: int,
    df_cap: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate each query's terms' posting ranges into [Q, budget]
    buffers (pad doc id -1). Native when libpostings.so is available,
    NumPy otherwise."""
    Q, M = q_terms.shape
    out_doc = np.full((Q, budget), -1, dtype=np.int32)
    out_imp = np.zeros((Q, budget), dtype=np.float32)

    lib = _load()
    if lib is not None:
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        postings_doc = np.ascontiguousarray(postings_doc, dtype=np.int32)
        postings_imp = np.ascontiguousarray(postings_imp, dtype=np.float32)
        qt = np.ascontiguousarray(q_terms, dtype=np.int32)
        lib.gather_postings(
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            postings_doc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            postings_imp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            qt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            Q, M, budget, df_cap,
            out_doc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_imp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out_doc, out_imp

    # NumPy fallback
    for q in range(Q):
        used = 0
        for m in range(M):
            t = int(q_terms[q, m])
            if t < 0 or used >= budget:
                continue
            lo, hi = int(offsets[t]), int(offsets[t + 1])
            df = hi - lo
            if df_cap > 0 and df > df_cap:
                continue
            n = min(df, budget - used)
            out_doc[q, used:used + n] = postings_doc[lo:lo + n]
            out_imp[q, used:used + n] = postings_imp[lo:lo + n]
            used += n
    return out_doc, out_imp


# -- native batch analyzer -------------------------------------------------------

_UNI_MAX = 0x110000
_TABLE_VERSION = 1  # bump when analyzer.py's classification changes
_TABLES = None  # (wb_class uint8 [0x110000], lower_map uint32 [0x110000])
_LOWER_SENTINEL = np.uint32(0xFFFFFFFF)


def _analyzer_tables():
    """Unicode tables for the native analyzer, GENERATED from the Python
    classifier (``retrieval/analyzer.py::_wb_class``) so native and Python
    tokenization cannot drift. Cached on disk (~5.5 MB) because the
    generation walks all 1.1M codepoints (~2s)."""
    global _TABLES
    if _TABLES is not None:
        return _TABLES
    cache = _DIR / "uax29_tables.npz"
    if cache.exists():
        try:
            z = np.load(cache)
            if int(z["version"]) == _TABLE_VERSION:
                _TABLES = (np.ascontiguousarray(z["wb"], np.uint8),
                           np.ascontiguousarray(z["lower"], np.uint32))
                return _TABLES
        except Exception:
            pass
    from ..retrieval.analyzer import _wb_class

    wb = np.zeros(_UNI_MAX, np.uint8)
    lower = np.arange(_UNI_MAX, dtype=np.uint32)
    for cp in range(_UNI_MAX):
        ch = chr(cp)
        wb[cp] = _wb_class(ch)
        lc = ch.lower()
        if len(lc) != 1 or cp == 0x3A3:
            # multi-char lowering (e.g. İ) or context-sensitive (final
            # sigma): native flags the token; Python re-lowers it
            lower[cp] = _LOWER_SENTINEL
        else:
            lower[cp] = ord(lc)
    _TABLES = (wb, lower)
    try:
        np.savez_compressed(cache, version=_TABLE_VERSION, wb=wb,
                            lower=lower)
    except OSError:
        pass
    return _TABLES


def _load_analyzer() -> Optional[ctypes.CDLL]:
    global _LIB_ANALYZER
    if _LIB_ANALYZER is not None:
        return _LIB_ANALYZER
    if not build_analyzer_library() and not _SO_ANALYZER.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_ANALYZER))
    except OSError:
        return None
    lib.analyze_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.analyze_batch.restype = ctypes.c_int64
    _LIB_ANALYZER = lib
    return lib


def analyze_docs(docs, mode: str = "standard"):
    """Batch UAX#29 tokenization + lowercase in native code.

    Token-exact with ``retrieval/analyzer.py``'s ``standard_analyze``
    (``mode="cjk"``: ``cjk_analyze``'s Han-bigram variant) — the per-doc
    Python loop is the ingest bottleneck of collection-scale index builds.
    Returns a list of token lists, or None when the native library is
    unavailable (callers fall back to the Python analyzer).
    """
    lib = _load_analyzer()
    if lib is None:
        return None
    wb, lower = _analyzer_tables()
    enc = [d.encode("utf-8") for d in docs]
    offsets = np.zeros(len(enc) + 1, np.int64)
    np.cumsum([len(e) for e in enc], out=offsets[1:])
    blob = b"".join(enc)
    n_bytes = len(blob)
    # token bytes <= ~input bytes (lowercase can grow a cp by 1 UTF-8
    # byte); cjk bigrams re-emit each Han char once more; +1 NUL per token
    out_cap = 4 * n_bytes + 64
    tok_cap = 2 * n_bytes + 8
    out_text = np.empty(out_cap, np.uint8)
    tok_offsets = np.zeros(tok_cap + 1, np.int64)
    tok_doc = np.empty(tok_cap, np.int64)
    tok_flags = np.empty(tok_cap, np.uint8)
    out_len = ctypes.c_int64(0)
    n_tok = lib.analyze_batch(
        blob, n_bytes,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(enc),
        wb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lower.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        1 if mode == "cjk" else 0,
        out_text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_cap,
        tok_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tok_doc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        tok_flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tok_cap, ctypes.byref(out_len),
    )
    if n_tok < 0:
        return None  # capacity exceeded (shouldn't happen; bounds above)
    # bulk decode: every token is NUL-terminated, and NUL can never occur
    # inside a token (class OTHER breaks it) — one decode + one split
    # instead of a per-token Python loop
    toks = out_text[: out_len.value].tobytes().decode("utf-8").split("\x00")
    # re-lower the flagged tokens (multi-char / context-sensitive casing)
    for i in np.nonzero(tok_flags[:n_tok])[0]:
        toks[i] = toks[i].lower()
    # group by doc: tok_doc is non-decreasing
    counts = np.bincount(tok_doc[:n_tok], minlength=len(enc))
    out = []
    pos = 0
    for c in counts:
        out.append(toks[pos: pos + int(c)])
        pos += int(c)
    return out
