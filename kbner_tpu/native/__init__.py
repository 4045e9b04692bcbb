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


def build_library(force: bool = False) -> bool:
    """Compile libpostings.so with g++; returns True on success."""
    if _SO.exists() and not force:
        return True
    src = _DIR / "postings.cc"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_SO)],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists() and not build_library():
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
    _LIB = lib
    return lib


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
