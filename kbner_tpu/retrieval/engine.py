"""Sharded retrieval engine: HBM-resident index, mesh-parallel query fan-out.

The TPU-native replacement for the reference's Elasticsearch ``_msearch``
batched HTTP fan-out (``/root/reference/kb/generate_data.py:33-68``):

  - the padded impact arrays of one or more fields (text, title) live in
    device memory, document axis sharded over the mesh's 'data' axis,
  - a query batch is replicated to all shards; each shard scores its block
    with the Pallas BM25 kernel and computes a shard-local top-k,
  - shard-local top-k lists are all-gathered over ICI and merged on device
    (``shard_map`` + ``jax.lax.all_gather``) — the all-gather moves Q x k x 8
    bytes per shard, not scores for every document,
  - document texts stay on the host; ids come back and are materialized into
    result records matching the reference's retrieval file schema
    (``generate_data.py:137-144``: sentence/paragraph/title/score/url).

Multilinguality follows the reference: one engine per language index, and a
'mix' query fans out to all engines with results merged by score
(index wildcard ``*wiki_v1``, ``generate_data.py:21-24``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.bm25 import bm25_topk
from ..parallel.mesh import DATA_AXIS
from .index import BM25Index


@dataclasses.dataclass
class RetrievedDoc:
    doc_id: int
    score: float
    sentence: str = ""
    paragraph: str = ""
    title: str = ""
    url: str = ""


@dataclasses.dataclass
class DocStore:
    """Host-side document payloads, aligned with index doc ids."""

    sentences: List[str]
    paragraphs: Optional[List[str]] = None
    titles: Optional[List[str]] = None
    urls: Optional[List[str]] = None

    def materialize(self, doc_id: int, score: float) -> RetrievedDoc:
        def get(lst):
            return lst[doc_id] if lst is not None and doc_id < len(lst) else ""

        return RetrievedDoc(
            doc_id=doc_id,
            score=score,
            sentence=get(self.sentences),
            paragraph=get(self.paragraphs),
            title=get(self.titles),
            url=get(self.urls),
        )


def _pad_axis1(arr: np.ndarray, multiple: int, fill) -> np.ndarray:
    n = arr.shape[1]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = np.full((arr.shape[0], rem), fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=1)


def _pad_rows(arr: np.ndarray, multiple: int, fill) -> np.ndarray:
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = np.full((rem,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _quantize_codes(di: np.ndarray, bits: int,
                    scale: Optional[Tuple[float, float]] = None
                    ) -> Tuple[np.ndarray, float, float]:
    """Log-quantize impacts, optionally against a precomputed (lo, step)
    so sharded uploads share one dequantization scale."""
    from .index import log_quantize

    if scale is None:
        return log_quantize(di, bits=bits)
    lo, step = scale
    levels = (1 << bits) - 2
    codes = np.zeros(di.shape, np.uint16 if bits <= 16 else np.uint32)
    pos = di > 0
    # f64 log to match the native fused pack (postings.cc::pack_ragged)
    codes[pos] = np.clip(
        np.rint((np.log(di[pos].astype(np.float64)) - lo) / step), 0, levels
    ).astype(codes.dtype) + 1
    return codes, lo, step


def _pack_doc_rows_ragged(
    dt: np.ndarray,  # [N, Ld] left-packed term ids, pad -1
    di: np.ndarray,  # [N, Ld] impacts
    vocab_size: int,
    lanes: int = 128,
    scale: Optional[Tuple[float, float]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, float, float, int]:
    """RAGGED doc-major pass-2 rows: one int32 per real (doc, term) slot,
    ``(log_code << term_bits) | term_id``, segments packed into 128-lane
    rows with NO segment straddling a row boundary.

    The round-2 layout kept a dense ``[N, Ld]`` copy of the index whose
    padding (Ld = the 99.5th-percentile doc length) dominated device
    memory — 208 of 294 B/doc at the 4.19M-doc bench (VERDICT r2 #1).
    Here memory is ~4 B per REAL posting: docs are grouped by length
    (equal-length segments tile a row exactly, so the groups pack with
    only the per-row remainder as waste, ~5%) and every candidate's
    segment is fetched by ONE covering-row gather (two for docs longer
    than a row), preserving the row-gather cost model of the dense
    layout. Per-doc ``off``/``len`` arrays locate and mask the segment;
    neighbor docs sharing a row are masked out by the global-slot-index
    validity test in ``ops/bm25.py``.

    Returns (flat [NR, lanes] int32, off [N] int32, lens [N] uint8|int32,
    term_bits, lo, step, r2) where r2 = covering rows per gather.
    """
    N, Ld = dt.shape
    term_bits = max(int(np.ceil(np.log2(vocab_size + 2))), 1)
    code_bits = 32 - term_bits
    if code_bits < 8:
        raise ValueError(
            f"vocab {vocab_size} leaves {code_bits} impact bits; "
            "shard the vocabulary or extend the two-array layout")
    levels = (1 << code_bits) - 2
    term_lo = None
    if scale is not None and np.ndim(scale[0]) == 1:
        # PER-TERM scale (engine production path): codes store
        # ln(imp) - term_lo[t]; the base rides the query weight at search
        # time (w' = w * exp(term_lo[t]), see _pack_queries), so the
        # device decodes with lo=0 and the step only spans the widest
        # single term's impact range — ~4x finer than a global scale at
        # the same bit budget (a term's impacts vary only by tfNorm;
        # idf, the wide factor, is constant per term)
        term_lo, step = scale
        lo = 0.0
    elif scale is not None:
        lo, step = scale
    else:
        # log is monotone: the scale needs only the positive min/max,
        # not a full-collection log pass
        pos = di[di > 0]
        if len(pos):
            lo = float(np.log(float(pos.min())))
            hi = float(np.log(float(pos.max())))
            step = max((hi - lo) / max(levels, 1), 1e-12)
        else:
            lo, step = 0.0, 1.0

    valid = dt >= 0
    lens = valid.sum(axis=1).astype(np.int64)
    # place length groups in ascending-length order; within a group,
    # segments tile rows exactly (capacity lanes // L per row)
    off, nr = _place_length_groups(lens, lanes, max(Ld, 1))
    r2 = 1 if Ld <= lanes else (Ld + lanes - 1) // lanes
    if off.max(initial=0) + Ld >= 2**31:
        raise ValueError("ragged layout exceeds int32 offsets; shard more")

    flat = np.full(nr * lanes, -1, dtype=np.int32)
    from ..native import pack_ragged as native_pack_ragged

    if not native_pack_ragged(dt, di, off, term_bits, lo, step, levels,
                              flat, term_lo=term_lo):
        if term_lo is not None:
            codes = np.zeros(di.shape, np.uint32)
            p = (dt >= 0) & (di > 0)
            base = term_lo[np.maximum(dt, 0)].astype(np.float64)
            codes[p] = np.clip(
                np.rint((np.log(di[p].astype(np.float64)) - base[p])
                        / step), 0, levels).astype(np.uint32) + 1
        else:
            codes, _, _ = _quantize_codes(di, bits=code_bits,
                                          scale=(lo, step))
        packed = ((codes.astype(np.uint32) << term_bits)
                  | (dt.astype(np.uint32) & ((1 << term_bits) - 1))
                  ).view(np.int32)
        pos = off[:, None] + np.arange(Ld, dtype=np.int64)[None, :]
        flat[pos[valid]] = packed[valid]
    lens_dtype = np.uint8 if Ld < 256 else np.int32
    return (flat.reshape(nr, lanes), off.astype(np.int32),
            lens.astype(lens_dtype), term_bits, lo, step, r2)


def _place_length_groups(lens: np.ndarray, lanes: int, max_seg: int
                         ) -> Tuple[np.ndarray, int]:
    """Segment-packing shared by the row layouts: docs grouped by segment
    length in ascending order; equal-length segments tile ``lanes``-wide
    rows exactly (no segment straddles a row boundary). Returns
    (off [N] int64 slot offsets, total rows)."""
    N = len(lens)
    off = np.zeros(max(N, 1), dtype=np.int64)
    cursor = 0
    for L in np.unique(lens).tolist():
        idx = np.nonzero(lens == L)[0]
        if L == 0:
            continue
        if L <= lanes:
            c = lanes // L
            r = np.arange(len(idx), dtype=np.int64)
            off[idx] = cursor + (r // c) * lanes + (r % c) * L
            cursor += ((len(idx) + c - 1) // c) * lanes
        else:
            per = ((L + lanes - 1) // lanes) * lanes
            off[idx] = cursor + np.arange(len(idx), dtype=np.int64) * per
            cursor += len(idx) * per
    r2 = 1 if max_seg <= lanes else (max_seg + lanes - 1) // lanes
    return off, cursor // lanes + r2


DELTA16_GAP_BITS = 13          # slot = (gap13 << 3) | tf3
DELTA16_MAX_GAP = (1 << DELTA16_GAP_BITS) - 1  # 8191
DELTA16_TF_CAP = 7             # tf saturates (tfNorm ~flat past it)
DELTA16_CONT = np.uint16(DELTA16_MAX_GAP << 3)  # continuation: tf=0


def _nontiny_remap(df: np.ndarray, tiny_cap: int
                   ) -> Tuple[np.ndarray, int]:
    """Dense df-DESCENDING remap of the non-tiny (df > tiny_cap) terms:
    remap[orig] in [0, T') for non-tiny terms, -1 otherwise. Frequent
    terms get SMALL ids, so a document's sorted remapped ids cluster low
    and the within-doc gaps the delta16 rows store stay mostly under the
    13-bit field."""
    nont = df > tiny_cap
    Tp = int(nont.sum())
    remap = np.full(len(df), -1, np.int64)
    order = np.argsort(-df[nont], kind="stable")
    ids = np.empty(Tp, np.int64)
    ids[order] = np.arange(Tp)
    remap[nont] = ids
    return remap, Tp


def _pack_doc_rows_delta16(
    dt: np.ndarray,   # [N, L] left-packed term ids (tiny already dropped)
    di: np.ndarray,   # [N, L] f32 impacts
    remap: np.ndarray,  # [V] orig -> dense df-desc id, -1 = absent
    idf: np.ndarray,    # [V] f32 (original id space)
    norm: np.ndarray,   # [N] f32 per-doc k1*(1-b+b*dl/avgdl)
    lanes: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """DELTA-ENCODED 16-bit pass-2 rows (VERDICT r3 #1 — the equal-memory
    push): ~2 B per real posting instead of the 4 B packed-int32 slots.

    Per document, the surviving terms are sorted by their dense
    df-descending remapped id and stored as GAPS: one uint16 slot
    ``(gap13 << 3) | min(tf, 7)`` per posting, preceded by ``gap // 8191``
    continuation slots (tf = 0, gap field = 8191) when a gap overflows
    the field — real terms always have tf >= 1, so tf == 0 marks
    continuations unambiguously. The device reconstructs term ids with a
    masked prefix sum over the gathered covering rows and recomputes each
    matched impact EXACTLY as ``idf(t) * tf / (tf + norm_d)`` — idf rides
    the (remapped) query weights, ``norm_d`` comes from a 1-byte Lucene
    norm code per doc — so pass-2 scores are exact f32 BM25 for tf <= 7
    (finer than the 12-bit log codes this replaces; tf > 7 saturates,
    where tfNorm is within ~5% of flat anyway). Same covering-row gather
    cost model as the packed-int32 layout, at half the gather bytes.

    Lucene's delta-vint postings (~2 B/posting) are the memory bar
    (SURVEY §2.7); fixed 16-bit gap-coded slots are the TPU-streamable
    equivalent (no variable-width decode on the lane axis).

    Returns (flat [NR, lanes] uint16, off [N] int32 slot offsets,
    lens [N] uint8|int32 slot counts, r2 covering rows).
    """
    N, L = dt.shape
    from ..native import delta16_rows as native_delta16

    res = native_delta16(dt, di, remap.astype(np.int32), idf, norm)
    if res is not None:
        lens, emit = res
        max_seg = int(lens.max(initial=0))
        off, nr = _place_length_groups(lens, lanes, max(max_seg, 1))
        if off.max(initial=0) + max_seg >= 2**31:
            raise ValueError(
                "delta16 layout exceeds int32 offsets; shard more")
        flat = np.zeros(nr * lanes, dtype=np.uint16)
        emit(off, flat)
        r2 = 1 if max_seg <= lanes else (max_seg + lanes - 1) // lanes
        lens_dtype = np.uint8 if max_seg < 256 else np.int32
        return (flat.reshape(nr, lanes), off.astype(np.int32),
                lens.astype(lens_dtype), r2)

    valid = dt >= 0
    rm = np.where(valid, remap[np.maximum(dt, 0)], np.int64(2**62))
    if valid.any() and int(rm[valid].min()) < 0:
        raise ValueError("delta16 rows require tiny terms dropped first")
    order = np.argsort(rm, axis=1, kind="stable")
    rm_s = np.take_along_axis(rm, order, axis=1)
    di_s = np.take_along_axis(di, order, axis=1)
    orig_s = np.take_along_axis(dt, order, axis=1)
    v_s = rm_s < 2**62

    # exact tf back out of the impact: x = imp/idf = tf/(tf+norm)
    idf_s = idf[np.maximum(orig_s, 0)].astype(np.float64)
    x = np.where(v_s, di_s / np.maximum(idf_s, 1e-30), 0.0)
    x = np.clip(x, 0.0, 1.0 - 1e-9)
    tf = np.rint(norm[:, None] * x / (1.0 - x)).astype(np.int64)
    tf = np.clip(tf, 1, DELTA16_TF_CAP)

    prev = np.concatenate(
        [np.zeros((N, 1), np.int64), rm_s[:, :-1]], axis=1)
    gaps = np.where(v_s, rm_s - np.where(v_s, prev, 0), 0)
    # first valid slot's gap is the id itself; later prev is valid too
    n_cont = gaps // DELTA16_MAX_GAP
    rem = gaps - n_cont * DELTA16_MAX_GAP  # in [0, MAX_GAP)
    slots_per = np.where(v_s, 1 + n_cont, 0)
    lens = slots_per.sum(axis=1)
    max_seg = int(lens.max(initial=0))

    off, nr = _place_length_groups(lens, lanes, max(max_seg, 1))
    if off.max(initial=0) + max_seg >= 2**31:
        raise ValueError("delta16 layout exceeds int32 offsets; shard more")

    from ..native import pack_delta16 as native_pack_delta16

    flat = np.full(nr * lanes, 0, dtype=np.uint16)
    if not native_pack_delta16(rem, tf, n_cont, v_s, off, flat):
        # slot stream: per posting, n_cont continuations then the real
        # slot — built with one repeat + last-of-group test
        pv, jv = np.nonzero(v_s)
        reps = slots_per[pv, jv]
        tot = int(reps.sum())
        pidx = np.repeat(np.arange(len(pv)), reps)
        ends = np.cumsum(reps)
        is_real = np.arange(tot) == np.repeat(ends - 1, reps)
        vals = np.where(
            is_real,
            (rem[pv, jv][pidx].astype(np.uint32) << 3)
            | tf[pv, jv][pidx].astype(np.uint32),
            np.uint32(DELTA16_CONT)).astype(np.uint16)
        # slot position within its doc: global slot index minus the
        # doc's first slot's global index (slots are doc-major)
        doc_of_slot = pv[pidx]
        first_global = np.repeat(
            np.cumsum(lens) - lens, lens.astype(np.int64))
        slot_in_doc = np.arange(tot) - first_global
        flat[off[doc_of_slot] + slot_in_doc] = vals
    r2 = 1 if max_seg <= lanes else (max_seg + lanes - 1) // lanes
    lens_dtype = np.uint8 if max_seg < 256 else np.int32
    return (flat.reshape(nr, lanes), off.astype(np.int32),
            lens.astype(lens_dtype), r2)


def _term_scale_from_csr(index: BM25Index, code_bits: int
                         ) -> Tuple[np.ndarray, float]:
    """Per-term log bases + the global step for the per-term row
    quantization: from the impact-ordered CSR, a term's max impact is its
    first posting and its min its last — O(V), no full-collection pass."""
    offsets, _, p_imp, df = index.csr
    V = len(df)
    term_lo = np.zeros(V, np.float32)
    levels = (1 << code_bits) - 2
    if len(p_imp) == 0:
        return term_lo, 1.0
    has = df > 0
    mins = p_imp[np.maximum(offsets[1:] - 1, 0)]
    maxs = p_imp[np.minimum(offsets[:-1], len(p_imp) - 1)]
    lnmin = np.zeros(V)
    lnmax = np.zeros(V)
    np.log(mins, out=lnmin, where=has & (mins > 0))
    np.log(maxs, out=lnmax, where=has & (maxs > 0))
    term_lo[has] = lnmin[has].astype(np.float32)
    rng = float((lnmax - lnmin).max(initial=0.0))
    return term_lo, max(rng / max(levels, 1), 1e-12)


def _drop_tiny_slots(dt: np.ndarray, di: np.ndarray, df: np.ndarray,
                     tiny_cap: int) -> Tuple[np.ndarray, np.ndarray]:
    """Left-compacted copies of the padded doc arrays with slots of
    "tiny" terms (df <= tiny_cap) removed — those terms are scored
    exactly from their full pass-1 windows, so pass-2 rows need not
    carry them (compact-rows memory optimization)."""
    from ..native import compact_tiny as native_compact_tiny

    res = native_compact_tiny(dt, di, df, tiny_cap)
    if res is not None:
        return res
    keep = dt >= 0
    keep[keep] = df[dt[keep]] > tiny_cap
    new_len = keep.sum(axis=1)
    ld = max(int(new_len.max(initial=0)), 1)
    n = dt.shape[0]
    dt2 = np.full((n, ld), -1, dtype=dt.dtype)
    di2 = np.zeros((n, ld), dtype=di.dtype)
    rows = np.nonzero(keep)[0]
    cols = (np.cumsum(keep, axis=1) - 1)[keep]
    dt2[rows, cols] = dt[keep]
    di2[rows, cols] = di[keep]
    return dt2, di2


class RetrievalEngine:
    """Query execution over one language's index (text field + optional
    title field for entity-boosted queries)."""

    def __init__(
        self,
        text_index: BM25Index,
        store: Optional[DocStore] = None,
        title_index: Optional[BM25Index] = None,
        mesh: Optional[Mesh] = None,
        use_pallas: bool = True,
        block_d: int = 512,
        doc_chunk: Optional[int] = None,
        mode: str = "exhaustive",  # or "pruned" (two-pass MaxScore-style)
        rare_terms: int = 12,
        posting_budget: int = 4096,
        df_cap: Optional[int] = None,
        n_candidates: int = 512,
        compact_rows: bool = True,
        tiny_df_cap: int = 64,
        tiny_width: int = 0,
        tiny_pack: bool = True,
        tiny_f16: bool = True,
        row_layout: str = "auto",  # delta16 | packed32 | auto
        tiny_cols_floor: int = 0,
        d16_width_floor: int = 0,
        device: bool = True,
        topc_recall: float = 0.0,
        align_windows: bool = True,
        deep_terms: int = 0,
        deep_cap: int = 0,
    ):
        self.text_index = text_index
        self.title_index = title_index
        self.store = store
        self.mesh = mesh
        # device=False keeps the packed index arrays on the HOST (same
        # layouts, numpy) — the build-only mode for engines whose arrays a
        # :class:`MixEngine` will concatenate and upload ONCE; a second
        # per-engine device copy would double HBM. Search methods raise.
        self.device = device
        if not device and (mesh is not None or mode != "pruned"):
            raise ValueError(
                "device=False supports only the unsharded pruned engine")
        self.use_pallas = use_pallas
        self.block_d = block_d
        self.doc_chunk = doc_chunk
        self.mode = mode
        self.rare_terms = rare_terms
        self.posting_budget = posting_budget
        # default df cap: skip terms matching >5% of the collection in
        # pass 1 (they are exactly rescored in pass 2)
        self.df_cap = df_cap if df_cap is not None else max(
            256, text_index.n_docs // 20)
        self.n_candidates = n_candidates
        # > 0: pass-1 top-C candidate selection via approx_max_k at this
        # recall target (the exact top-C is a full variadic sort on TPU —
        # as expensive as the key sort; see ops/bm25.py::topc_recall)
        self.topc_recall = topc_recall
        self.n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        # row-boundary-aligned pass-1 windows: one fewer covering row per
        # term and a ~(1/(cap/128+1)) narrower key sort for ~4% more CSR
        # memory (index.py::csr_rows_packed). Unsharded engines only —
        # the per-shard CSR builder keeps the packed layout.
        self._csr_aligned = align_windows and mesh is None

        # pass-1 windows never read past this depth, so the device CSR is
        # built capped to it (full postings would be dead HBM weight)
        self.per_term_cap = max(1, self.posting_budget // self.rare_terms)
        # DEEP WINDOWS (recall knob): extend the ``deep_terms`` RAREST
        # selected terms' pass-1 windows to ``deep_cap`` postings. The
        # r5 miss diagnosis at 4.19M docs: ~91% of residual top-10
        # misses are docs carried by ONE mid-df selected term (median
        # df ~8k) at impact rank 1.4k median / 4.8k p90 — past any
        # uniform window, but reachable by deepening only the few
        # rarest (df-ascending selection order) windows. Costs sort
        # width (deep_terms*deep_cap extra keys) and CSR memory (the
        # CSR stores min(df, deep_cap) postings per term). Unsharded
        # pruned engines only.
        self.deep_terms = int(deep_terms)
        self.deep_cap = max(int(deep_cap), self.per_term_cap)
        if self.deep_terms:
            if mode != "pruned" or mesh is not None:
                raise ValueError(
                    "deep_terms>0 supports only the unsharded pruned "
                    "engine")
            if self.deep_terms > self.rare_terms:
                raise ValueError("deep_terms must be <= rare_terms")
        # COMPACT ROWS: "tiny" text terms (df <= tiny_cap) are scored
        # EXACTLY on the host — their full posting lists are gathered from
        # the f32 host CSR, deduplicated per query, and shipped as one
        # extra candidate block — so their slots leave BOTH the pass-2
        # rows and the device CSR. At wiki scale the Zipf tail is the
        # majority of postings, so this cuts device memory severalfold at
        # full f32 precision for those contributions. ``tiny_df_cap``
        # trades device memory against per-batch upload width (larger cap
        # = fewer device postings but more host-gathered docs per query);
        # df <= 128 keeps the upload block narrow while still dropping
        # the long tail. compact_rows=False keeps full rows (bit-exact
        # pass-2, used by strict score-parity tests).
        self.compact_rows = compact_rows and mode == "pruned"
        self.tiny_cap = (min(tiny_df_cap, self.per_term_cap, self.df_cap)
                         if self.compact_rows else 0)
        self.tiny_width = tiny_width
        self._want_tiny_pack = tiny_pack
        # f16 tiny-block scores (only when tiny_pack is off): the exact
        # sums ship as two float16 per int32 column instead of one f32
        # each — the tiny block is ~90% of the per-batch upload and the
        # tunnel is bandwidth-bound, so this cuts the dominant transfer
        # 25% at <= 2^-11 relative score error (vs the ~1e-4 margin the
        # recall metric already tolerates from impact quantization)
        self.tiny_f16 = tiny_f16
        # text-field pass-2 row layout: "delta16" = gap-coded uint16 slots
        # (~2 B/posting, exact tfNorm reconstruction — needs the index's
        # stored doc lengths + Lucene norm quantization), "packed32" =
        # (code << term_bits | term) int32 slots, "auto" = delta16 when
        # the index supports it
        if row_layout not in ("auto", "delta16", "packed32"):
            raise ValueError(f"unknown row_layout {row_layout!r}")
        d16_ok = (text_index.doc_dl is not None
                  and text_index.params.quantize_norms)
        if row_layout == "delta16" and not d16_ok:
            raise ValueError(
                "row_layout='delta16' needs an index built with stored "
                "doc lengths and quantize_norms=True")
        self._row_d16 = (mode == "pruned" and row_layout != "packed32"
                         and d16_ok)
        self._d16_remap: Optional[np.ndarray] = None
        # NEVER-SHRINK width floors: the packed-query widths (remapped
        # query block, tiny-exact block) bucket per batch, and a batch
        # that happens to come out NARROWER than its predecessors would
        # otherwise mint a fresh jit variant mid-stream (measured: one
        # surprise 5.3 s compile inside a timed 4.19M-doc serving loop).
        # Widths only ever grow, so variants are bounded by the handful
        # of growth steps and the steady state is ONE compiled closure.
        # The explicit floors pin the widths UP FRONT (serving knob: a
        # warmup batch narrower than live traffic would otherwise leave
        # a multi-second jit compile to land inside the serving loop the
        # first time a wider batch arrives).
        self._d16_w_floor = d16_width_floor
        self._t_cols_floor = tiny_cols_floor
        # tiny-block upload packing: one int32 per (doc, exact-sum) entry,
        # (log_code << docbits) | doc, when enough code bits remain. The
        # remote tunnel moves ~70 MB/s, so halving the block halves the
        # dominant upload. Scale set in _upload (needs the CSR stats).
        self._tiny_pack: Optional[Tuple[int]] = None  # (docbits,)
        self._device_fields: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._device_rows: Dict[str, Tuple[jnp.ndarray, ...]] = {}
        # per field: (term_bits, lo, step, r2) of the ragged pass-2 rows
        self._row_meta: Dict[str, Tuple[int, float, float, int]] = {}
        # per field: [V] f32 per-term log bases (folded into the query
        # weights at pack time; device decodes rows with lo=0)
        self._term_lo: Dict[str, np.ndarray] = {}
        self._csr_scale: Tuple[float, float] = (0.0, 1.0)
        self._device_csr_title = None
        self._csr_scale_title: Tuple[float, float] = (0.0, 1.0)
        self._shard_size = 0
        self._upload()

    # -- device residency -----------------------------------------------------

    def _upload(self) -> None:
        """Transpose to [Ld, N], pad the doc axis to shards x block, and put
        each field's arrays on device (sharded over 'data' when meshed)."""
        pad_to = self.n_shards * self.block_d
        fields = {"text": self.text_index}
        if self.title_index is not None:
            fields["title"] = self.title_index
        # All fields must share the padded N
        n_padded = 0
        for idx in fields.values():
            n_padded = max(n_padded, idx.doc_terms.shape[0])
        n_padded = ((n_padded + pad_to - 1) // pad_to) * pad_to
        self._shard_size = n_padded // self.n_shards
        self.n_padded = n_padded
        if self.compact_rows and self._want_tiny_pack:
            # 1-int32 tiny-block packing is viable when the doc id leaves
            # >=9 impact-code bits; the quantization SCALE is per batch
            # (computed in _pack_queries from the actual exact-sum range
            # and shipped with the upload), so only docbits is fixed
            # here. tiny_pack=False ships (doc, f32 exact) pairs instead
            # — 2x the tiny upload for lossless exact sums (~+0.1%
            # recall@10 at 4.19M docs; with the pipelined stream the
            # extra upload rides the worker thread off the critical path)
            docbits = max(int(np.ceil(np.log2(max(n_padded, 2)))), 1)
            if 32 - docbits >= 9:
                self._tiny_pack = (docbits,)

        for name, idx in fields.items():
            dt = _pad_rows(idx.doc_terms, 1, -1)
            dt = np.pad(dt, ((0, n_padded - dt.shape[0]), (0, 0)),
                        constant_values=-1)
            di = np.pad(idx.doc_impacts,
                        ((0, n_padded - idx.doc_impacts.shape[0]), (0, 0)))
            if self.mode == "pruned":
                # Pass-2 rows: RAGGED packed doc-major segments — ~4 B per
                # real posting instead of a dense [N, Ld] copy (the dense
                # padding was 208 of 294 B/doc at bench scale, VERDICT r2
                # #1); each candidate costs one covering-row gather (the
                # row gather dominates pass-2, ~50 ns/row on v5e).
                dt_rows, di_rows = dt, di
                if self.compact_rows and name == "text":
                    dt_rows, di_rows = _drop_tiny_slots(
                        dt, di, idx.csr[3], self.tiny_cap)
                d16 = self._row_d16 and name == "text"
                if d16:
                    # delta16 layout: dense df-desc remap + per-doc norm
                    # codes (host f32 norms drive the exact tf inversion)
                    from .index import long_to_int4
                    remap, _tp = _nontiny_remap(
                        idx.csr[3],
                        self.tiny_cap if self.compact_rows else 0)
                    self._d16_remap = remap
                    p = idx.params
                    dl = np.zeros(n_padded, np.int64)
                    dl[: len(idx.doc_dl)] = idx.doc_dl
                    norm = (p.k1 * (1.0 - p.b + p.b * dl / idx.avgdl)
                            ).astype(np.float32)
                    lut_max = int(dl.max(initial=0)) + 1
                    lut = np.fromiter(
                        (long_to_int4(i) for i in range(lut_max)),
                        np.uint8, count=lut_max)
                    normc = lut[dl]
                    self._d16_norm = (norm, normc)
                else:
                    idx_for_scale = (self.text_index if name == "text"
                                     else self.title_index)
                    code_bits = 32 - max(int(np.ceil(
                        np.log2(len(idx.vocab) + 2))), 1)
                    term_lo, t_step = _term_scale_from_csr(
                        idx_for_scale, code_bits)
                    self._term_lo[name] = term_lo
                if self.mesh is None:
                    put = jnp.asarray if self.device else np.asarray
                    if d16:
                        flat, off, lens, r2 = _pack_doc_rows_delta16(
                            dt_rows, di_rows, remap, idx.idf, norm)
                        self._row_meta[name] = (
                            "d16", float(idx.params.k1),
                            float(idx.params.b), float(idx.avgdl), r2)
                        self._device_rows[name] = (
                            put(flat), put(off), put(lens), put(normc))
                    else:
                        flat, off, lens, tb, lo, step, r2 = \
                            _pack_doc_rows_ragged(dt_rows, di_rows,
                                                  len(idx.vocab),
                                                  scale=(term_lo, t_step))
                        self._row_meta[name] = ("p32", tb, lo, step, r2)
                        self._device_rows[name] = (
                            put(flat), put(off), put(lens))
                    # row-blocked impact-ordered PACKED CSR postings
                    # resident in HBM ((code8 << 24) | doc per int32),
                    # CAPPED at the pass-1 window depth: per-query traffic
                    # is just the [Q, M] rare-term ids; windows are single
                    # 128-lane row gathers. The title field gets its own
                    # CSR so entity-boosted queries can reach docs through
                    # the title alone (bool.should)
                    idx_obj = (self.text_index if name == "text"
                               else self.title_index)
                    # compact mode: the device never looks up tiny text
                    # terms (host-gathered exact block covers them), so
                    # their postings leave the device CSR entirely
                    off32, packed, clo, cstep = idx_obj.csr_rows_packed(
                        cap=(self.deep_cap
                             if self.deep_terms and name == "text"
                             else self.per_term_cap),
                        min_df=(self.tiny_cap if name == "text" else 0),
                        align_windows=self._csr_aligned)
                    if name == "text":
                        self._csr_scale = (clo, cstep)
                        self._device_csr = (put(off32), put(packed))
                    else:
                        self._csr_scale_title = (clo, cstep)
                        self._device_csr_title = (put(off32), put(packed))
                else:
                    # sharded pruned: rows per shard stacked [S, NR, lanes]
                    # over 'data'; scales/remaps come from the FULL index
                    # so every shard encodes consistently and the jitted
                    # closure sees one set of constants
                    S, ss = self.n_shards, self._shard_size
                    sh2 = NamedSharding(self.mesh, P(DATA_AXIS, None))
                    sh3 = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
                    if d16:
                        parts = [
                            _pack_doc_rows_delta16(
                                dt_rows[s * ss:(s + 1) * ss],
                                di_rows[s * ss:(s + 1) * ss],
                                remap, idx.idf, norm[s * ss:(s + 1) * ss])
                            for s in range(S)
                        ]
                        r2 = max(p[3] for p in parts)
                        self._row_meta[name] = (
                            "d16", float(idx.params.k1),
                            float(idx.params.b), float(idx.avgdl), r2)
                        # pad every shard to nr_max + r2 guard rows so the
                        # shared jitted gather's covering reads stay in
                        # bounds on shards with a smaller local r2
                        nr_max = max(p[0].shape[0] for p in parts) + r2
                        flat = np.zeros((S, nr_max, parts[0][0].shape[1]),
                                        np.uint16)
                        for s, p in enumerate(parts):
                            flat[s, :p[0].shape[0]] = p[0]
                        off = np.stack([p[1] for p in parts])
                        lens = np.stack(
                            [p[2].astype(np.int32) for p in parts])
                        self._device_rows[name] = (
                            jax.device_put(flat, sh3),
                            jax.device_put(off, sh2),
                            jax.device_put(lens, sh2),
                            jax.device_put(normc.reshape(S, ss), sh2))
                    else:
                        parts = [
                            _pack_doc_rows_ragged(
                                dt_rows[s * ss:(s + 1) * ss],
                                di_rows[s * ss:(s + 1) * ss],
                                len(idx.vocab), scale=(term_lo, t_step))
                            for s in range(S)
                        ]
                        tb, r2 = parts[0][3], parts[0][6]
                        self._row_meta[name] = ("p32", tb, 0.0, t_step, r2)
                        nr_max = max(p[0].shape[0] for p in parts)
                        flat = np.full(
                            (S, nr_max, parts[0][0].shape[1]), -1,
                            np.int32)
                        for s, p in enumerate(parts):
                            flat[s, :p[0].shape[0]] = p[0]
                        off = np.stack([p[1] for p in parts])
                        lens = np.stack([p[2] for p in parts])
                        self._device_rows[name] = (
                            jax.device_put(flat, sh3),
                            jax.device_put(off, sh2),
                            jax.device_put(lens, sh2))
                    idx_obj = (self.text_index if name == "text"
                               else self.title_index)
                    csr, scale = self._build_shard_csr(dt, di, idx_obj)
                    if name == "text":
                        self._device_csr = csr
                        self._csr_scale = scale
                    else:
                        self._device_csr_title = csr
                        self._csr_scale_title = scale
                continue
            dtt = np.ascontiguousarray(dt.T)  # [Ld, N]
            dit = np.ascontiguousarray(di.T)
            if self.mesh is not None:
                sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
                dtt = jax.device_put(dtt, sharding)
                dit = jax.device_put(dit, sharding)
            else:
                dtt = jnp.asarray(dtt)
                dit = jnp.asarray(dit)
            self._device_fields[name] = (dtt, dit)

    def _build_shard_csr(self, dt_padded: np.ndarray, di_padded: np.ndarray,
                         index: Optional[BM25Index] = None):
        """Per-shard local row-blocked PACKED CSR postings, stacked
        [S, ...] and sharded over 'data'. Impact-ordered within each term
        (csr_rows semantics); one quantization scale shared across shards
        so the jitted closure sees one (lo, step) pair; padding rows carry
        -1 and never enter any window. Returns ((offsets, packed),
        (lo, step))."""
        from .index import log_quantize, pack_postings

        S, ss = self.n_shards, self._shard_size
        V = len((index or self.text_index).vocab)
        lanes, guard = 128, 32
        cap = self.per_term_cap
        if ss >= 0xFFFFFF:
            raise ValueError(f"shard size {ss} needs > 24-bit doc ids")
        # global quantization scale over every impact (shards share it)
        _, lo, step = log_quantize(
            di_padded[dt_padded >= 0].astype(np.float32), bits=8)
        offs, pks = [], []
        # compact mode: drop GLOBAL-df-tiny text terms from every shard's
        # CSR — the host exact block covers them, the device never looks
        # them up (mirrors the unsharded min_df drop)
        gdf = None
        if (self.compact_rows and index is not None
                and index is self.text_index and self.tiny_cap > 0):
            gdf = index.csr[3]
        for s in range(S):
            sl_t = dt_padded[s * ss:(s + 1) * ss]
            sl_i = di_padded[s * ss:(s + 1) * ss]
            valid = sl_t >= 0
            if gdf is not None:
                valid &= np.where(sl_t >= 0,
                                  gdf[np.maximum(sl_t, 0)] > self.tiny_cap,
                                  False)
            terms = sl_t[valid]
            docs = np.nonzero(valid)[0].astype(np.int32)
            imps = sl_i[valid].astype(np.float32)
            order = np.lexsort((-imps, terms))
            terms_s = terms[order]
            df = np.bincount(terms_s, minlength=V)
            # cap each term's window at the pass-1 depth (postings past
            # it are unreachable — same capping as the unsharded CSR)
            full_off = np.concatenate([[0], np.cumsum(df)])
            pos = np.arange(len(terms_s)) - np.repeat(full_off[:-1], df)
            keep = pos < cap
            order = order[keep]
            df = np.minimum(df, cap)
            off = np.zeros(V + 1, dtype=np.int32)
            np.cumsum(df, out=off[1:])
            offs.append(off)
            pk, _, _ = pack_postings(
                docs[order], imps[order], lanes=lanes, guard_rows=0,
                scale=(lo, step))
            pks.append(pk.ravel())
        nnz = max((len(p) for p in pks), default=1)
        nr = (nnz + lanes - 1) // lanes + guard
        packed = np.full((S, nr * lanes), -1, np.int32)
        for s in range(S):
            packed[s, : len(pks[s])] = pks[s]
        sh2 = NamedSharding(self.mesh, P(DATA_AXIS, None))
        sh3 = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        return (
            jax.device_put(np.stack(offs), sh2),
            jax.device_put(packed.reshape(S, nr, lanes), sh3),
        ), (lo, step)

    # -- search ---------------------------------------------------------------

    def _topk_fn(self, k: int):
        # cache the jitted closure per k: a fresh function identity per call
        # would defeat jax.jit's compile cache and recompile every search
        cached = getattr(self, "_topk_cache", None)
        if cached is None:
            cached = self._topk_cache = {}
        if k in cached:
            return cached[k]
        fn = self._build_topk_fn(k)
        cached[k] = fn
        return fn

    def _build_topk_fn(self, k: int):
        use_pallas = self.use_pallas and jax.default_backend() == "tpu"
        doc_chunk = self.doc_chunk
        block_d = self.block_d

        if self.mesh is None:
            @jax.jit
            def run(fields):
                return bm25_topk(fields, k=k, doc_chunk=doc_chunk,
                                 use_pallas=use_pallas, block_d=block_d)

            return run

        mesh = self.mesh
        shard_size = self._shard_size

        def shard_fn(fields):
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            local_scores, local_ids = bm25_topk(
                fields, k=k, doc_chunk=doc_chunk, use_pallas=use_pallas,
                block_d=block_d, id_offset=shard_idx * shard_size)
            # [n_shards, Q, k] on every device after all-gather over ICI
            all_scores = jax.lax.all_gather(local_scores, DATA_AXIS)
            all_ids = jax.lax.all_gather(local_ids, DATA_AXIS)
            s = jnp.swapaxes(all_scores, 0, 1).reshape(
                local_scores.shape[0], -1)
            i = jnp.swapaxes(all_ids, 0, 1).reshape(local_ids.shape[0], -1)
            top_scores, idx = jax.lax.top_k(s, k)
            top_ids = jnp.take_along_axis(i, idx, axis=1)
            return top_scores, top_ids

        field_spec = (P(), P(), P(None, DATA_AXIS), P(None, DATA_AXIS))

        @jax.jit
        def run(fields):
            return jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(tuple(field_spec for _ in fields),),
                out_specs=(P(), P()),
                check_vma=False,
            )(fields)

        return run

    def _select_rare_terms(self, q_terms: np.ndarray,
                           index: Optional[BM25Index] = None,
                           df_cap: Optional[int] = None,
                           df_floor: int = 0) -> np.ndarray:
        """Per query: the ``rare_terms`` lowest-df in-vocab terms with
        df_floor < df <= df_cap (MaxScore-style pass-1 term selection).
        In compact-rows mode ``df_floor`` excludes the tiny terms — their
        full contributions arrive via the host-gathered exact block, so a
        window would double-count them in the ranking partial."""
        index = index or self.text_index
        df = index.csr[3]
        cap = df_cap if df_cap is not None else self.df_cap
        Q, Lq = q_terms.shape
        M = self.rare_terms
        term_df = np.where(
            q_terms >= 0, df[np.maximum(q_terms, 0)], np.iinfo(np.int64).max)
        term_df = np.where((term_df <= cap) & (term_df > df_floor), term_df,
                           np.iinfo(np.int64).max)
        order = np.argsort(term_df, axis=1, kind="stable")[:, :M]
        rare = np.take_along_axis(q_terms, order, axis=1).astype(np.int32)
        picked_df = np.take_along_axis(term_df, order, axis=1)
        rare[picked_df == np.iinfo(np.int64).max] = -1
        return rare

    def _gather_tiny_exact(self, q_terms: np.ndarray, q_weights: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side EXACT scoring block for tiny terms (df <= tiny_cap):
        per query, every posting of every tiny query term, deduplicated by
        doc with impact sums and weighted (exact) sums.

        Compact rows removed tiny terms from the device's pass-2 rows;
        their full posting lists are small by definition, so the host CSR
        (full f32 impacts — no 8-bit loss) gathers and pre-merges them in
        one vectorized pass. Returns (doc [Q, T], imp [Q, T], exact
        [Q, T]) with -1/0 padding; T adapts to the batch (multiple of
        128, bounding jit variants).
        """
        offsets, p_doc, p_imp, df = self.text_index.csr
        Q, Lq = q_terms.shape
        safe = np.maximum(q_terms, 0)
        is_tiny = (q_terms >= 0) & (df[safe] <= self.tiny_cap)

        from ..native import gather_tiny_exact as native_gather

        res = native_gather(offsets, p_doc, p_imp, q_terms, q_weights,
                            is_tiny, self.text_index.n_docs)
        if res is not None:
            return res

        # vectorized NumPy fallback: one flat gather of every query's tiny
        # windows, then a single sort-free groupby over (query, doc) keys
        qidx, tpos = np.nonzero(is_tiny)
        if len(qidx) == 0:
            z = np.zeros((Q, 0), np.float32)
            return np.full((Q, 0), -1, np.int32), z, z
        terms = q_terms[qidx, tpos].astype(np.int64)
        ws = q_weights[qidx, tpos].astype(np.float32)
        dfs = df[terms]
        total = int(dfs.sum())
        cum = np.cumsum(dfs) - dfs
        flat = (np.repeat(offsets[terms], dfs)
                + (np.arange(total) - np.repeat(cum, dfs)))
        docs = p_doc[flat].astype(np.int64)
        imps = p_imp[flat]
        qs = np.repeat(qidx.astype(np.int64), dfs)
        wrep = np.repeat(ws, dfs)
        key = qs * self.text_index.n_docs + docs
        uniq, inv = np.unique(key, return_inverse=True)
        s_imp = np.bincount(inv, weights=imps).astype(np.float32)
        s_ex = np.bincount(inv, weights=imps * wrep).astype(np.float32)
        uq = (uniq // self.text_index.n_docs).astype(np.int64)
        ud = (uniq % self.text_index.n_docs).astype(np.int32)
        counts = np.bincount(uq, minlength=Q)
        T = ((int(counts.max(initial=0)) + 127) // 128) * 128
        pos = np.arange(len(uniq)) - np.repeat(
            np.cumsum(counts) - counts, counts)
        out_doc = np.full((Q, T), -1, np.int32)
        out_imp = np.zeros((Q, T), np.float32)
        out_ex = np.zeros((Q, T), np.float32)
        out_doc[uq, pos] = ud
        out_imp[uq, pos] = s_imp
        out_ex[uq, pos] = s_ex
        return out_doc, out_imp, out_ex

    def _slice_tiny_per_shard(self, t_doc: np.ndarray, t_ex: np.ndarray
                              ) -> Tuple[Optional[np.ndarray], int]:
        """Sharded compact-rows path: slice the host-gathered tiny-exact
        block PER SHARD on the host — [S, Q, 2*Tb] with shard-LOCAL doc
        ids — instead of broadcasting the full global [Q, T] block to
        every shard (which the old path filtered device-side,
        engine.py r3; upload grew with shard count). Layout per shard:
        ``Tb`` local doc-id columns (-1 pad) then ``Tb`` bitcast-f32
        NEGATED exact sums. Returns (block, Tb)."""
        S, ss = self.n_shards, self._shard_size
        Q, T = t_doc.shape
        if T == 0:
            return None, 0
        m = t_doc >= 0
        if not m.any():
            return None, 0
        qidx = np.broadcast_to(np.arange(Q)[:, None], t_doc.shape)
        key = (t_doc[m] // ss) * Q + qidx[m]
        counts = np.bincount(key, minlength=S * Q)
        # bucket the per-(shard, query) max width to bound jit variants
        Tb, width = int(counts.max(initial=0)), 128
        while width < Tb:
            width *= 2
        Tb = width
        order = np.argsort(key, kind="stable")
        ksort = key[order]
        run_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(len(ksort)) - run_off[ksort]
        out_doc = np.full((S, Q, Tb), -1, np.int32)
        out_ex = np.zeros((S, Q, Tb), np.float32)
        s_i, q_i = ksort // Q, ksort % Q
        out_doc[s_i, q_i, pos] = (t_doc[m][order] - s_i * ss).astype(
            np.int32)
        out_ex[s_i, q_i, pos] = t_ex[m][order]
        block = np.concatenate([out_doc, (-out_ex).view(np.int32)], axis=2)
        return block, Tb

    def _pack_queries(self, q_terms, q_weights, extra_fields
                      ) -> Tuple[np.ndarray, Tuple[int, ...], int,
                                 Optional[np.ndarray]]:
        """ONE host->device array per query batch: [Q, blocks] int32
        carrying the rare-term ids, the host-gathered tiny-exact block
        (compact-rows mode), then each field's term ids and float-bitcast
        weights. Under the remote-execution tunnel every transfer costs a
        ~30 ms round trip, which dominated the pruned path (measured: a
        no-op dispatch is as expensive as the whole device-side search);
        packing makes it a single upload. Returns (packed, per-field
        query lengths, tiny-block width, per-shard tiny block or None —
        the sharded engine ships the tiny block as a SEPARATE
        'data'-sharded operand, see :meth:`_slice_tiny_per_shard`)."""
        df_floor = self.tiny_cap if self.compact_rows else 0
        rare = self._select_rare_terms(q_terms, df_floor=df_floor)
        segs = [rare.astype(np.int32)]
        if extra_fields and self._device_csr_title is not None:
            # a second rare block drives title-CSR candidate generation:
            # ES bool.should reaches a doc through ANY field, so a doc
            # matching only the entity's title terms must still become a
            # candidate (title rows are never compacted)
            tcap = max(256, self.title_index.n_docs // 20)
            segs.append(self._select_rare_terms(
                extra_fields[0][0], index=self.title_index, df_cap=tcap))
        t_cols = 0
        tiny_sharded = None
        if self.compact_rows:
            t_doc, t_ex = self._tiny_block(q_terms, q_weights)
            if self.mesh is not None and self.n_shards > 1:
                tiny_sharded, t_cols = self._slice_tiny_per_shard(
                    t_doc, t_ex)
                tq, tw, tl = self._text_query_block(q_terms, q_weights)
                segs += [tq, tw]
                lqs = [tl]
                for (ft, fw) in extra_fields:
                    segs.append(np.ascontiguousarray(ft, np.int32))
                    segs.append(self._fold_weights(
                        ft, fw, "title").view(np.int32))
                    lqs.append(ft.shape[1])
                return (np.concatenate(segs, axis=1), tuple(lqs), t_cols,
                        tiny_sharded)
            # Only (doc, NEGATED weighted sum) ship: |value| serves as the
            # tiny block's ranking partial (weights are term
            # multiplicities, ~always 1 for text), the sign marks it as a
            # pass-1-exact contribution for the device's 2-operand dedup
            # sort (ops/bm25.py exact_by_sign). Bucket the block width to
            # powers of two: a fresh width per batch would recompile the
            # jitted search every call.
            t_cols = t_doc.shape[1]
            if t_cols:
                bucket = 256
                while bucket < t_cols:
                    bucket *= 2
                bucket = max(bucket, self._t_cols_floor)
                self._t_cols_floor = max(self._t_cols_floor, bucket)
                pad = bucket - t_cols
                t_doc = np.pad(t_doc, ((0, 0), (0, pad)),
                               constant_values=-1)
                t_ex = np.pad(t_ex, ((0, 0), (0, pad)))
                t_cols = bucket
            if t_cols and self._tiny_pack is not None:
                # ONE int32 per entry: (log_code << docbits) | doc;
                # pads encode as code 0 + all-ones doc (beyond n_real).
                # The quantization scale is PER BATCH, computed from the
                # actual exact-sum range and shipped as two bitcast-f32
                # columns after the block — a batch-tight range cuts the
                # log step severalfold vs an engine-wide worst-case scale
                # (measured +0.3% recall@10 at 4.19M docs), and carrying
                # it in the upload keeps it out of the jit constants (no
                # recompile per batch).
                docbits = self._tiny_pack[0]
                codebits = 32 - docbits
                levels = (1 << codebits) - 2
                p = t_ex > 0
                if p.any():
                    lo = float(np.log(float(t_ex[p].min())))
                    hi = float(np.log(float(t_ex[p].max())))
                    step = max((hi - lo) / max(levels, 1), 1e-12)
                else:
                    lo, step = 0.0, 1.0
                code = np.zeros(t_ex.shape, np.uint32)
                code[p] = np.clip(
                    np.rint((np.log(t_ex[p]) - lo) / step),
                    0, levels).astype(np.uint32) + 1
                docmask = (1 << docbits) - 1
                enc = (code << docbits) | np.where(
                    t_doc >= 0, t_doc, docmask).astype(np.uint32)
                scale = np.broadcast_to(
                    np.array([[lo, step]], np.float32),
                    (t_doc.shape[0], 2))
                segs += [enc.view(np.int32),
                         np.ascontiguousarray(scale).view(np.int32)]
            elif t_cols and self.tiny_f16:
                # two f16 exact sums per int32 column (t_cols is a
                # power-of-two bucket >= 256, always even)
                ex16 = np.ascontiguousarray(
                    t_ex.astype(np.float16)).view(np.uint16)
                pairs = ex16.reshape(
                    t_ex.shape[0], t_cols // 2, 2).astype(np.uint32)
                enc = np.ascontiguousarray(
                    pairs[:, :, 0] | (pairs[:, :, 1] << 16))
                segs += [t_doc, enc.view(np.int32)]
            elif t_cols:
                segs += [t_doc, (-t_ex).view(np.int32)]
        tq, tw, tl = self._text_query_block(q_terms, q_weights)
        segs += [tq, tw]
        lqs = [tl]
        for (ft, fw) in extra_fields:
            segs.append(np.ascontiguousarray(ft, np.int32))
            segs.append(self._fold_weights(ft, fw, "title").view(np.int32))
            lqs.append(ft.shape[1])
        return np.concatenate(segs, axis=1), tuple(lqs), t_cols, None

    def _tiny_block(self, q_terms: np.ndarray, q_weights: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-gathered tiny-exact block, capped at ``tiny_width``
        entries per query (keeping the LARGEST exact sums: the block pads
        to the batch-max width — ~2.7x the median at wiki scale — so a
        cap cuts the dominant upload; a dropped doc loses at most the
        tiny_width-th largest tiny sum of its query from its score — it
        still pools via the rare windows)."""
        t_doc, _, t_ex = self._gather_tiny_exact(q_terms, q_weights)
        if self.tiny_width and t_doc.shape[1] > self.tiny_width:
            W = self.tiny_width
            idx = np.argpartition(-t_ex, W - 1, axis=1)[:, :W]
            t_doc = np.take_along_axis(t_doc, idx, axis=1)
            t_ex = np.take_along_axis(t_ex, idx, axis=1)
        return t_doc, t_ex

    def _remap_queries_d16(self, qt: np.ndarray, qw: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """Delta16 pass-2 query block: terms remapped into the dense
        df-descending row id space with idf FOLDED INTO THE WEIGHTS (the
        rows store only tf — matched contributions are
        ``w * idf * tf/(tf+norm)``), then LEFT-PACKED to drop tiny/OOV
        slots (their contributions arrive via the host-exact block /
        never match) and bucketed to a power-of-two width — on wiki
        sentences roughly half the distinct query terms are tiny, so the
        compaction halves the pass-2 compare loop."""
        Q, L = qt.shape
        safe = np.maximum(qt, 0)
        q2 = np.where(qt >= 0, self._d16_remap[safe], -1)
        w2 = (qw * self.text_index.idf[safe]).astype(np.float32)
        valid = q2 >= 0
        cnt = valid.sum(axis=1)
        W = 8
        while W < int(cnt.max(initial=1)):
            W *= 2
        W = min(W, L)
        W = max(W, min(self._d16_w_floor, L))
        self._d16_w_floor = max(self._d16_w_floor, W)
        out_t = np.full((Q, W), -1, np.int32)
        out_w = np.zeros((Q, W), np.float32)
        rows, _ = np.nonzero(valid)
        pos = (np.cumsum(valid, axis=1) - 1)[valid]
        out_t[rows, pos] = q2[valid]
        out_w[rows, pos] = w2[valid]
        return out_t, out_w

    def _text_query_block(self, qt: np.ndarray, qw: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray, int]:
        """The text field's (term-id, weight) segment of the packed query
        upload, in the layout the engine's pass-2 rows expect."""
        if self._row_d16:
            qt2, qw2 = self._remap_queries_d16(qt, qw)
            return (np.ascontiguousarray(qt2, np.int32),
                    np.ascontiguousarray(qw2).view(np.int32), qt2.shape[1])
        return (np.ascontiguousarray(qt, np.int32),
                self._fold_weights(qt, qw, "text").view(np.int32),
                qt.shape[1])

    def _fold_weights(self, qt: np.ndarray, qw: np.ndarray,
                      field: str) -> np.ndarray:
        """Fold the per-term row-quantization base into the query weight:
        matched pass-2 slots decode as exp((code-1)*step), so the true
        contribution w*imp = (w*exp(term_lo[t])) * exp((code-1)*step).
        Negative (pad/OOV) term ids never match a row slot, so their
        weight value is irrelevant."""
        tl = self._term_lo.get(field)
        if tl is None:
            return np.ascontiguousarray(qw, np.float32)
        safe = np.maximum(qt, 0)
        return np.ascontiguousarray(
            qw * np.exp(tl[safe]), np.float32)

    @staticmethod
    def unpack_result(out: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[Q, 2k] int32 device result -> (scores [Q, k] f32, ids [Q, k])."""
        out = np.asarray(out)
        k = out.shape[1] // 2
        return out[:, k:].copy().view(np.float32), out[:, :k]

    def _search_pruned_device(self, q_terms, q_weights, k,
                              title_terms, title_weights):
        """Pruned search returning the packed [Q, 2k] DEVICE array (ids,
        then bitcast scores) — one upload, one dispatch; callers pull via
        :meth:`unpack_result` (or pipeline batches before pulling)."""
        if not self.device:
            raise ValueError(
                "engine built with device=False (host arrays only) — "
                "search through the owning MixEngine")
        extra = []
        if title_terms is not None:
            if "title" not in self._device_rows:
                raise ValueError("engine built without a title index")
            extra.append((title_terms, title_weights))
        packed, lqs, t_cols, tiny = self._pack_queries(
            q_terms, q_weights, extra)
        return self._dispatch_packed(jnp.asarray(packed), lqs, t_cols, k,
                                     bool(extra),
                                     tiny_dev=self._put_tiny(tiny))

    def _put_tiny(self, tiny: Optional[np.ndarray]):
        if tiny is None:
            return None
        return jax.device_put(
            tiny, NamedSharding(self.mesh, P(DATA_AXIS, None, None)))

    def _dispatch_packed(self, packed_dev, lqs, t_cols, k: int,
                         with_title: bool, tiny_dev=None):
        sharded_tiny = tiny_dev is not None
        run = self._pruned_topk_fn(k, lqs, self.per_term_cap, t_cols,
                                   sharded_tiny=sharded_tiny)
        csr_arrays = list(self._device_csr)
        if with_title and self._device_csr_title is not None:
            csr_arrays += list(self._device_csr_title)
        row_arrays = [a for name in (["text"]
                                     + (["title"] if with_title else []))
                      for a in self._device_rows[name]]
        if sharded_tiny:
            return run(packed_dev, tiny_dev, *csr_arrays, *row_arrays)
        return run(packed_dev, *csr_arrays, *row_arrays)

    def _search_pruned(
        self, q_terms, q_weights, k, title_terms, title_weights,
    ) -> Tuple[np.ndarray, np.ndarray]:
        out = self._search_pruned_device(
            q_terms, q_weights, k, title_terms, title_weights)
        return self.unpack_result(out)

    def search_stream(self, batches, k: int = 10, workers: int = 3,
                      depth: int = 2, max_query_terms: int = 64):
        """Fully pipelined pruned search over an iterable of
        ``(q_terms, q_weights)`` batches, yielding ``(scores, ids)`` per
        batch in order.

        Three stages overlap: a worker thread packs batch i+1 on the
        host AND starts its host->device transfer while the device runs
        batch i and the caller's thread pulls batch i-1's result. On a
        remote-tunneled device the transfer (fixed round trip + payload)
        is the single largest per-batch cost — overlapping it with
        compute is worth ~1.5x throughput at wiki-scale settings. This is
        the serving loop's shape (cli serve / bench pipeline).

        A batch may be ``(q_terms, q_weights)`` arrays OR a list of raw
        query strings — strings are analyzed + encoded INSIDE the prep
        workers, so the text path overlaps its host encode with device
        compute too (encoding on the caller's thread serialized with
        result pulls and cost ~15% of stream throughput at r5 rates).
        """
        from concurrent.futures import ThreadPoolExecutor

        if self.mode != "pruned":
            for b in batches:
                if b and isinstance(b[0], str):
                    b = self.text_index.encode_queries(
                        list(b), max_query_terms=max_query_terms)
                yield self.search_encoded(b[0], b[1], k=k)
            return

        def prep(b):
            if b and isinstance(b[0], str):
                b = self.text_index.encode_queries(
                    list(b), max_query_terms=max_query_terms)
            qt, qw = b
            packed, lqs, t_cols, tiny = self._pack_queries(qt, qw, ())
            dev = jnp.asarray(packed)  # transfer starts on the worker
            return dev, lqs, t_cols, self._put_tiny(tiny)

        from collections import deque

        it = iter(batches)
        workers = max(workers, 1)
        depth = max(depth, 1)  # dispatched-but-unpulled device batches
        # pulls ride their OWN pool: a result pull is one tunnel round
        # trip (~30-70 ms) of pure waiting, and pulling on the caller's
        # thread serialized the whole stream behind it (r5 profile: the
        # device runs a 256-query batch in ~22 ms while one pull costs
        # ~50 ms — the caller thread was the binder, not the chip).
        # Overlapping depth+1 pulls keeps the yield order while the
        # round trips run concurrently.
        with ThreadPoolExecutor(max_workers=workers) as ex, \
                ThreadPoolExecutor(max_workers=depth + 1) as pull_ex:
            futs = []
            for b in it:  # prefill to pipeline depth
                futs.append(ex.submit(prep, b))
                if len(futs) >= workers:
                    break
            if not futs:
                return
            pending: deque = deque()

            def dispatch_one():
                dev, lqs, t_cols, tiny = futs.pop(0).result()
                out = self._dispatch_packed(
                    dev, lqs, t_cols, k, False, tiny_dev=tiny)
                pending.append(pull_ex.submit(self.unpack_result, out))

            for nxt in it:
                futs.append(ex.submit(prep, nxt))
                dispatch_one()
                if len(pending) > depth:
                    yield pending.popleft().result()
            while futs:
                dispatch_one()
                if len(pending) > depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def _pruned_topk_fn(self, k: int, lqs: Tuple[int, ...],
                        per_term_cap: int, t_cols: int = 0,
                        sharded_tiny: bool = False):
        """Cached jitted closure for pruned search over a PACKED query
        array (see :meth:`_pack_queries`) — a fresh jit per call would
        recompile every query batch, and separate per-array transfers
        would each pay the tunnel round trip. ``t_cols`` is the width of
        the host-gathered tiny-exact block (0 when absent);
        ``sharded_tiny`` means the tiny block arrives as a SEPARATE
        'data'-sharded [S, Q, 2*t_cols] operand with shard-local doc ids
        (:meth:`_slice_tiny_per_shard`) instead of inside ``packed``."""
        cached = getattr(self, "_pruned_cache", None)
        if cached is None:
            cached = self._pruned_cache = {}
        M = self.rare_terms
        key = (k, lqs, per_term_cap, t_cols, sharded_tiny)
        if key in cached:
            return cached[key]

        mesh = self.mesh
        n_cand = self.n_candidates
        topc_recall = self.topc_recall
        deep_terms, deep_cap = self.deep_terms, self.deep_cap
        with_exact = self.compact_rows
        tiny_pack = self._tiny_pack
        tiny_f16 = self.tiny_f16
        n_real = self.text_index.n_docs
        csr_lo, csr_step = self._csr_scale
        use_pal = self.use_pallas
        csr_aligned = self._csr_aligned
        field_names = ["text", "title"][: len(lqs)]
        row_meta = [self._row_meta[n] for n in field_names]
        r2s = tuple(m[4] for m in row_meta)
        arity = [4 if m[0] == "d16" else 3 for m in row_meta]
        # entity-boosted queries pool candidates from the title CSR too
        # (bool.should reaches a doc through ANY field); the packed query
        # then carries TWO rare blocks, and a doc can appear once per
        # rare term of each
        with_title_csr = (len(lqs) > 1
                          and self._device_csr_title is not None)
        n_rare_blocks = 2 if with_title_csr else 1
        # dups per doc <= one per rare-block window + 1 for the (already
        # host-deduplicated) tiny-exact block entry
        m_dup = M * n_rare_blocks + (1 if t_cols else 0)
        tcsr_lo, tcsr_step = self._csr_scale_title

        from ..ops.bm25 import (bm25_pruned_topk_packed,
                                gather_pruned_candidate_keys)

        def unpack_queries(packed, row_arrays, parse_tiny=True):
            rares = [packed[:, i * M:(i + 1) * M]
                     for i in range(n_rare_blocks)]
            pos = M * n_rare_blocks
            tiny = None
            if not parse_tiny:
                pass  # tiny rides a separate sharded operand
            elif t_cols and tiny_pack is not None:
                docbits = tiny_pack[0]
                enc = packed[:, pos: pos + t_cols]
                # per-batch scale rides in two bitcast-f32 columns
                scale = jax.lax.bitcast_convert_type(
                    packed[0, pos + t_cols: pos + t_cols + 2], jnp.float32)
                t_lo, t_step = scale[0], scale[1]
                d = enc & ((1 << docbits) - 1)
                code = jax.lax.shift_right_logical(
                    enc, docbits).astype(jnp.float32)
                ex = jnp.where(
                    code > 0, jnp.exp(t_lo + (code - 1.0) * t_step), 0.0)
                tiny = (jnp.where(ex > 0, d, -1), ex)
                pos += t_cols + 2
            elif t_cols and tiny_f16:
                t_doc = packed[:, pos: pos + t_cols]
                u = packed[:, pos + t_cols: pos + t_cols + t_cols // 2]
                lo = jax.lax.convert_element_type(u & 0xFFFF, jnp.uint16)
                hi = jax.lax.convert_element_type(
                    jax.lax.shift_right_logical(u, 16) & 0xFFFF,
                    jnp.uint16)
                ex = jnp.stack([
                    jax.lax.bitcast_convert_type(lo, jnp.float16),
                    jax.lax.bitcast_convert_type(hi, jnp.float16),
                ], axis=-1).reshape(u.shape[0], t_cols).astype(jnp.float32)
                tiny = (t_doc, ex)
                pos += t_cols + t_cols // 2
            elif t_cols:
                t_doc = packed[:, pos: pos + t_cols]
                t_ex = -jax.lax.bitcast_convert_type(
                    packed[:, pos + t_cols: pos + 2 * t_cols], jnp.float32)
                tiny = (t_doc, t_ex)
                pos += 2 * t_cols
            fields = []
            a0 = 0
            for f, lq in enumerate(lqs):
                qt = packed[:, pos: pos + lq]
                qw = jax.lax.bitcast_convert_type(
                    packed[:, pos + lq: pos + 2 * lq], jnp.float32)
                pos += 2 * lq
                meta = row_meta[f]
                if meta[0] == "d16":
                    _, k1, b, avgdl, _ = meta
                    flat, off, lens, normc = row_arrays[a0: a0 + 4]
                    fields.append((qt, qw, flat, off, lens, normc,
                                   k1, b, avgdl))
                else:
                    _, tb, lo, step, _ = meta
                    flat, off, lens = row_arrays[a0: a0 + 3]
                    fields.append((qt, qw, flat, off, lens, tb, lo, step))
                a0 += arity[f]
            return rares, tiny, tuple(fields)

        def pooled_topk(rares, tiny, csrs, fields, n_docs):
            # every pass-1 candidate becomes ONE uint32 sort key
            # (doc << 8 | code8) on the TEXT CSR's log scale — a
            # single-operand dedup sort is ~1.5x cheaper than the old
            # (doc, f32) two-operand network. Title windows re-encode
            # onto the text scale; codes only RANK (scores come from
            # pass 2 + the f32 tiny match inside the kernel).
            # one RANKING scale for every key: the text scale widened by
            # ln(64) of headroom so pre-summed tiny contributions (which
            # exceed any single impact) don't clip to the top code and
            # lose their ordering against multi-term window docs
            rank_lo = csr_lo
            rank_step = csr_step + float(np.log(64.0)) / 254.0
            key_blocks = []
            for bi, (rare, (off, pk, lo, step)) in enumerate(
                    zip(rares, csrs)):
                if bi == 0 and deep_terms:
                    # deep windows for the rarest selected terms
                    # (selection is df-ascending, so columns [:D] are
                    # the rarest); the text CSR is built at deep_cap
                    key_blocks.append(gather_pruned_candidate_keys(
                        rare[:, :deep_terms], off, pk, deep_cap,
                        reencode=True, lo_src=lo, step_src=step,
                        lo_dst=rank_lo, step_dst=rank_step,
                        aligned=csr_aligned))
                    rare = rare[:, deep_terms:]
                key_blocks.append(gather_pruned_candidate_keys(
                    rare, off, pk, per_term_cap,
                    reencode=True, lo_src=lo, step_src=step,
                    lo_dst=rank_lo, step_dst=rank_step,
                    aligned=csr_aligned))
            t_doc = t_ex = None
            if tiny is not None:
                t_doc, t_ex = tiny
                # quantize the f32 tiny sums onto the ranking scale
                # (ranking only; the kernel adds the exact f32 values to
                # pass 2)
                code = jnp.clip(jnp.round(
                    (jnp.log(jnp.maximum(t_ex, 1e-30)) - rank_lo)
                    / rank_step) + 1.0, 1.0, 255.0).astype(jnp.uint32)
                ok = (t_doc >= 0) & (t_ex > 0)
                tkeys = jnp.where(
                    ok, (t_doc.astype(jnp.uint32) << 8) | code,
                    jnp.uint32(0xFFFFFFFF))
                key_blocks.append(tkeys)
            return bm25_pruned_topk_packed(
                jnp.concatenate(key_blocks, axis=1),
                fields, n_real_docs=n_docs, k=k, n_candidates=n_cand,
                max_dup_shifts=m_dup, imp_lo=rank_lo, imp_step=rank_step,
                tiny_doc=t_doc, tiny_ex=t_ex,
                use_pallas=use_pal, ragged_rows=r2s,
                topc_recall=topc_recall)

        def pack_result(scores, ids):
            return jnp.concatenate(
                [ids, jax.lax.bitcast_convert_type(scores, jnp.int32)],
                axis=1)

        if mesh is None:
            @jax.jit
            def run(packed, *arrays):
                n_csr = 2 * n_rare_blocks
                csr_flat, row_arrays = arrays[:n_csr], arrays[n_csr:]
                csrs = [(csr_flat[0], csr_flat[1], csr_lo, csr_step)]
                if with_title_csr:
                    csrs.append(
                        (csr_flat[2], csr_flat[3], tcsr_lo, tcsr_step))
                rares, tiny, fields = unpack_queries(packed, row_arrays)
                scores, ids = pooled_topk(rares, tiny, csrs, fields, n_real)
                return pack_result(scores, ids)

            cached[key] = run
            return run

        shard_size = self._shard_size

        def shard_fn(packed, *arrays):
            if sharded_tiny:
                tiny_blk, arrays = arrays[0], arrays[1:]
            n_csr = 2 * n_rare_blocks
            csr_flat, row_arrays = arrays[:n_csr], arrays[n_csr:]
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            local_rows = tuple(r[0] for r in row_arrays)
            csrs = [(csr_flat[0][0], csr_flat[1][0], csr_lo, csr_step)]
            if with_title_csr:
                csrs.append(
                    (csr_flat[2][0], csr_flat[3][0], tcsr_lo, tcsr_step))
            rares, tiny, fields = unpack_queries(
                packed, local_rows, parse_tiny=not sharded_tiny)
            if sharded_tiny:
                # host pre-sliced this shard's tiny entries (local doc
                # ids, -1 pad): Tb doc columns then Tb bitcast NEGATED
                # f32 exact sums — no device-side global->local filter
                blk = tiny_blk[0]  # [Q, 2*t_cols]
                t_doc = blk[:, :t_cols]
                t_ex = -jax.lax.bitcast_convert_type(
                    blk[:, t_cols: 2 * t_cols], jnp.float32)
                tiny = (t_doc, jnp.where(t_doc >= 0, t_ex, 0.0))
            s_scores, s_ids = pooled_topk(rares, tiny, csrs, fields,
                                          shard_size)
            s_ids = jnp.where(
                s_ids >= 0, s_ids + shard_idx * shard_size, -1)
            all_scores = jax.lax.all_gather(s_scores, DATA_AXIS)
            all_ids = jax.lax.all_gather(s_ids, DATA_AXIS)
            s = jnp.swapaxes(all_scores, 0, 1).reshape(s_scores.shape[0], -1)
            i = jnp.swapaxes(all_ids, 0, 1).reshape(s_ids.shape[0], -1)
            top_scores, idx = jax.lax.top_k(s, k)
            top_ids = jnp.take_along_axis(i, idx, axis=1)
            return pack_result(top_scores, top_ids)

        csr_spec = (P(DATA_AXIS, None), P(DATA_AXIS, None, None)
                    ) * n_rare_blocks
        # per field: flat rows [S, NR, lanes], off [S, ss], lens [S, ss]
        # (+ norm codes [S, ss] for the delta16 layout)
        row_spec = tuple(
            spec
            for a in arity
            for spec in ((P(DATA_AXIS, None, None), P(DATA_AXIS, None),
                          P(DATA_AXIS, None))
                         + ((P(DATA_AXIS, None),) if a == 4 else ())))
        tiny_spec = ((P(DATA_AXIS, None, None),) if sharded_tiny else ())
        run = jax.jit(jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(),) + tiny_spec + csr_spec + row_spec,
            out_specs=P(),
            check_vma=False,
        ))
        cached[key] = run
        return run

    def search_encoded(
        self,
        q_terms: np.ndarray,
        q_weights: np.ndarray,
        k: int = 10,
        title_terms: Optional[np.ndarray] = None,
        title_weights: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k over pre-encoded queries. Returns (scores, ids) [Q, k]."""
        if self.mode == "pruned":
            return self._search_pruned(
                q_terms, q_weights, k, title_terms, title_weights)
        fields = [(
            jnp.asarray(q_terms), jnp.asarray(q_weights),
            *self._device_fields["text"],
        )]
        if title_terms is not None:
            if "title" not in self._device_fields:
                raise ValueError("engine built without a title index")
            fields.append((
                jnp.asarray(title_terms), jnp.asarray(title_weights),
                *self._device_fields["title"],
            ))
        run = self._topk_fn(k)
        scores, ids = run(tuple(fields))
        return np.asarray(scores), np.asarray(ids)

    def search(
        self,
        queries: Sequence[str],
        k: int = 10,
        entity_queries: Optional[Sequence[Sequence[str]]] = None,
        title_boost: float = 2.0,
        max_query_terms: int = 64,
    ) -> List[List[RetrievedDoc]]:
        """BM25 sentence retrieval, optionally entity-boosted (v4).

        ``entity_queries[i]`` is a list of entity surface forms for query i;
        their terms hit the title field with ``boost`` (ES bool.should with
        match(title=entity, boost=2.0), generate_data.py:52-55).
        """
        q_terms, q_weights = self.text_index.encode_queries(
            list(queries), max_query_terms=max_query_terms)
        t_terms = t_weights = None
        if entity_queries is not None:
            if self.title_index is None:
                raise ValueError("entity queries need a title index")
            joined = [" ".join(ents) for ents in entity_queries]
            t_terms, t_weights = self.title_index.encode_queries(
                joined, max_query_terms=max_query_terms,
                boosts=[title_boost] * len(joined))
        scores, ids = self.search_encoded(
            q_terms, q_weights, k=k, title_terms=t_terms,
            title_weights=t_weights)
        return self._materialize(scores, ids)

    def _materialize(self, scores: np.ndarray, ids: np.ndarray
                     ) -> List[List[RetrievedDoc]]:
        results: List[List[RetrievedDoc]] = []
        n_real = self.text_index.n_docs
        for qi in range(ids.shape[0]):
            row = []
            for r in range(ids.shape[1]):
                d, s = int(ids[qi, r]), float(scores[qi, r])
                if d < 0 or d >= n_real or s <= 0.0:
                    continue
                if self.store is not None:
                    row.append(self.store.materialize(d, s))
                else:
                    row.append(RetrievedDoc(doc_id=d, score=s))
            results.append(row)
        return results

    def search_texts_stream(self, queries: Sequence[str], k: int = 10,
                            batch_size: int = 1024,
                            max_query_terms: int = 64,
                            ) -> List[List[RetrievedDoc]]:
        """Text-query retrieval through the pipelined stream: raw-string
        chunks go straight to :meth:`search_stream`, which analyzes +
        encodes them on its prep workers — overlapped with device
        compute (pruned mode; other modes fall back to batchwise)."""
        batches = [list(queries[i:i + batch_size])
                   for i in range(0, len(queries), batch_size)]
        out: List[List[RetrievedDoc]] = []
        for scores, ids in self.search_stream(
                batches, k=k, max_query_terms=max_query_terms):
            out.extend(self._materialize(scores, ids))
        return out


def langwiki_search(
    engines: Dict[str, RetrievalEngine],
    queries: Sequence[str],
    langs: Sequence[str],
    k: int = 10,
) -> List[List[RetrievedDoc]]:
    """Language-routed querying: each query goes to its own language's
    index (the reference's ``langwiki`` setting for multilingual training —
    monolingual indices, per-sentence language routing). Queries whose
    language has no engine get empty results."""
    by_lang: Dict[str, List[int]] = {}
    for i, lang in enumerate(langs):
        by_lang.setdefault(lang, []).append(i)
    out: List[List[RetrievedDoc]] = [[] for _ in queries]
    for lang, idxs in by_lang.items():
        eng = engines.get(lang)
        if eng is None:
            continue
        results = eng.search([queries[i] for i in idxs], k=k)
        for i, res in zip(idxs, results):
            out[i] = res
    return out


def mix_search(
    engines: Dict[str, RetrievalEngine],
    queries: Sequence[str],
    k: int = 10,
    entity_queries: Optional[Sequence[Sequence[str]]] = None,
    title_boost: float = 2.0,
    max_query_terms: int = 64,
) -> List[List[Tuple[str, RetrievedDoc]]]:
    """MIX-track fan-out: query every language engine, merge by score
    (the reference's wildcard ``*wiki_v1`` msearch — ONE fan-out request,
    generate_data.py:21-24). ``entity_queries`` adds the v4 title-boosted
    clauses on every engine that carries a title index.

    The fan-out is PIPELINED, not serial: every engine's query batch is
    encoded, uploaded, and dispatched first, and only then are results
    pulled — so the device works through all languages back-to-back
    instead of paying a full dispatch+pull round trip per language
    (11 sequential round trips at the MIX track's 11 engines; the pull is
    the round-trip-dominated step under the remote tunnel)."""
    dispatched: List[Tuple[str, RetrievalEngine, str, object]] = []
    for lang, eng in engines.items():
        q_terms, q_weights = eng.text_index.encode_queries(
            list(queries), max_query_terms=max_query_terms)
        t_terms = t_weights = None
        if entity_queries is not None and eng.title_index is not None:
            joined = [" ".join(ents) for ents in entity_queries]
            t_terms, t_weights = eng.title_index.encode_queries(
                joined, max_query_terms=max_query_terms,
                boosts=[title_boost] * len(joined))
        if eng.mode == "pruned":
            # dispatch without pulling: the device array is the handle
            out = eng._search_pruned_device(
                q_terms, q_weights, k, t_terms, t_weights)
            dispatched.append((lang, eng, "device", out))
        else:
            out = eng.search_encoded(
                q_terms, q_weights, k=k, title_terms=t_terms,
                title_weights=t_weights)
            dispatched.append((lang, eng, "host", out))
    per_engine: Dict[str, List[List[RetrievedDoc]]] = {}
    for lang, eng, kind, out in dispatched:
        scores, ids = (eng.unpack_result(out) if kind == "device" else out)
        per_engine[lang] = eng._materialize(scores, ids)
    merged: List[List[Tuple[str, RetrievedDoc]]] = []
    for qi in range(len(queries)):
        rows = [
            (lang, doc)
            for lang, res in per_engine.items()
            for doc in res[qi]
        ]
        rows.sort(key=lambda x: -x[1].score)
        merged.append(rows[:k])
    return merged


class MixEngine:
    """Single-dispatch multi-index MIX-track engine (the reference's
    wildcard ``*wiki_v1`` search: ONE ``_msearch`` fans out over all 11
    language indices, ``kb/generate_data.py:21-24``).

    :func:`mix_search`'s per-engine Python loop pays one jit compile, one
    host->device upload, and one result pull PER LANGUAGE per batch —
    measured on the v5e tunnel, the M transfers are ~75% of the steady
    state and each language's closure compiles separately (minutes each
    at wiki scale; a batch minting a fresh width variant recompiles
    inside the serving loop). Here the M language indices live
    CONCATENATED in one device structure with a doc -> (lang, local id)
    map:

      - pass-2 delta16 rows, slot offsets, lens, and norm codes concat
        along the doc axis (offsets rebased to global slots),
      - packed pass-1 CSRs concat along the row axis (per-language
        offset tables rebased to global elements, stacked behind
        per-language vocabulary bases),
      - per-language scalars (avgdl, quantization scale, doc/vocab
        bases, n_docs) ride as [M]-arrays,

    and ONE jitted closure runs ``lax.scan`` over the language axis —
    each step the same two-pass pruned search as
    :class:`RetrievalEngine`, language-local through pass 1 and globally
    indexed in pass 2 (``rescore_id_offset``) — then merges the
    per-language top-k on device. One compile (size independent of M),
    one [M, Q, W] upload, one dispatch, one [Q, 2k] pull per batch.

    Memory is the SUM of the per-language packed indices (concatenation,
    not pad-to-max): M=11 monolingual indices cost the same ~41 B/doc as
    the flagship single-index layout. Build the per-language engines
    with ``device=False`` so their arrays stay on the host until this
    class uploads the concatenated structure once.
    """

    def __init__(self, engines: Dict[str, RetrievalEngine],
                 n_candidates: int = 512,
                 d16_width_floor: int = 64,
                 tiny_cols_floor: int = 512,
                 topc_recall: float = 0.0):
        if not engines:
            raise ValueError("MixEngine needs at least one engine")
        self.langs = list(engines)
        self.engines = engines
        e0 = engines[self.langs[0]]
        for lang, e in engines.items():
            if e.mode != "pruned" or not e._row_d16 or not e.compact_rows:
                raise ValueError(
                    f"engine {lang!r}: MixEngine needs pruned mode with "
                    "delta16 rows and compact_rows")
            if e.mesh is not None:
                raise ValueError(
                    f"engine {lang!r}: MixEngine concatenates unsharded "
                    "engines (shard the mix group over languages instead)")
            if (e.rare_terms, e.per_term_cap) != (
                    e0.rare_terms, e0.per_term_cap):
                raise ValueError("engines must share pass-1 knobs "
                                 "(rare_terms, posting budget)")
            p, p0 = e.text_index.params, e0.text_index.params
            if (p.k1, p.b) != (p0.k1, p0.b):
                raise ValueError("engines must share BM25 params")
            if e._csr_aligned != e0._csr_aligned:
                raise ValueError("engines must share align_windows")
            # one W variant per batch width: remapped query blocks of
            # every language must come out equally wide
            e._d16_w_floor = max(e._d16_w_floor, d16_width_floor)
        self.rare_terms = e0.rare_terms
        self.per_term_cap = e0.per_term_cap
        self.n_candidates = n_candidates
        self.topc_recall = topc_recall
        self.use_pallas = e0.use_pallas
        self._csr_aligned = e0._csr_aligned
        self._k1 = float(e0.text_index.params.k1)
        self._b = float(e0.text_index.params.b)
        self._w_floor = d16_width_floor
        self._t_cols_floor = tiny_cols_floor
        self._r2 = max(e._row_meta["text"][4] for e in engines.values())
        self._mix_cache: Dict[Tuple, object] = {}

        flats, offs, lenss, normcs, csr_offs, csr_pks = \
            [], [], [], [], [], []
        doc_base, vocab_base, f32s, i32s = [], [], [], []
        rows = elems = docs = ventries = 0
        lens_u8 = True
        for lang in self.langs:
            e = engines[lang]
            flat, off, lens, normc = (
                np.asarray(a) for a in e._device_rows["text"])
            co, cp = (np.asarray(a) for a in e._device_csr)
            doc_base.append(docs)
            vocab_base.append(ventries)
            flats.append(flat)
            offs.append(off.astype(np.int64) + rows * flat.shape[1])
            lenss.append(lens)
            lens_u8 &= lens.dtype == np.uint8
            normcs.append(normc)
            csr_offs.append(co.astype(np.int64) + elems)
            csr_pks.append(cp)
            rows += flat.shape[0]
            elems += cp.shape[0] * cp.shape[1]
            docs += off.shape[0]
            ventries += co.shape[0]
            lo, step = e._csr_scale
            f32s.append((float(e.text_index.avgdl), lo, step))
            i32s.append((e.text_index.n_docs, doc_base[-1],
                         vocab_base[-1]))
        if max(offs[-1].max(initial=0), csr_offs[-1].max(initial=0)) \
                >= 2**31:
            raise ValueError("concatenated mix layout exceeds int32 "
                             "offsets; shard the mix group")
        self._doc_base = np.asarray(doc_base, np.int64)
        ldt = np.uint8 if lens_u8 else np.int32
        self._dev = tuple(jnp.asarray(a) for a in (
            np.concatenate(flats, axis=0),
            np.concatenate(offs).astype(np.int32),
            np.concatenate([ln.astype(ldt) for ln in lenss]),
            np.concatenate(normcs),
            np.concatenate(csr_offs).astype(np.int32),
            np.concatenate(csr_pks, axis=0),
            np.asarray(f32s, np.float32),
            np.asarray(i32s, np.int32),
        ))

    # -- query packing ---------------------------------------------------------

    def pack_batch(self, queries: Sequence[str],
                   max_query_terms: int = 64
                   ) -> Tuple[np.ndarray, int, int, int]:
        """All M languages' query encodings as ONE [M, Q, WTOT] int32
        host array (layout per language: rare ids | tiny doc ids | f16
        tiny-exact pairs | remapped d16 ids | bitcast idf-folded
        weights). Q pads to a multiple of 8 (Pallas rescore tiling).
        Returns (packed, n_queries, W, t_cols)."""
        n_q = len(queries)
        queries = list(queries)
        if self.use_pallas and n_q % 8:
            queries += [""] * (-n_q % 8)
        per = []
        t_max, w_max = 1, self._w_floor
        for lang in self.langs:
            e = self.engines[lang]
            qt, qw = e.text_index.encode_queries(
                queries, max_query_terms=max_query_terms)
            rare = e._select_rare_terms(qt, df_floor=e.tiny_cap)
            t_doc, t_ex = e._tiny_block(qt, qw)
            qt2, qw2 = e._remap_queries_d16(qt, qw)
            per.append((rare, t_doc, t_ex, qt2, qw2))
            t_max = max(t_max, t_doc.shape[1])
            w_max = max(w_max, qt2.shape[1])
        t_cols = 256
        while t_cols < t_max:
            t_cols *= 2
        t_cols = max(t_cols, self._t_cols_floor)
        self._t_cols_floor = t_cols  # never-shrink: bound jit variants
        Q = len(queries)
        RM = self.rare_terms
        wtot = RM + t_cols + t_cols // 2 + 2 * w_max
        packed = np.empty((len(self.langs), Q, wtot), np.int32)
        for li, (rare, t_doc, t_ex, qt2, qw2) in enumerate(per):
            td = np.full((Q, t_cols), -1, np.int32)
            td[:, : t_doc.shape[1]] = t_doc
            te = np.zeros((Q, t_cols), np.float32)
            te[:, : t_ex.shape[1]] = t_ex
            ex16 = np.ascontiguousarray(
                te.astype(np.float16)).view(np.uint16)
            pairs = ex16.reshape(Q, t_cols // 2, 2).astype(np.uint32)
            q2 = np.full((Q, w_max), -1, np.int32)
            q2[:, : qt2.shape[1]] = qt2
            w2 = np.zeros((Q, w_max), np.float32)
            w2[:, : qw2.shape[1]] = qw2
            row = packed[li]
            row[:, :RM] = rare
            pos = RM
            row[:, pos: pos + t_cols] = td
            pos += t_cols
            row[:, pos: pos + t_cols // 2] = (
                pairs[:, :, 0] | (pairs[:, :, 1] << 16)).view(np.int32)
            pos += t_cols // 2
            row[:, pos: pos + w_max] = q2
            pos += w_max
            row[:, pos: pos + w_max] = w2.view(np.int32)
        return packed, n_q, w_max, t_cols

    # -- device search ---------------------------------------------------------

    def _mix_fn(self, k: int, W: int, t_cols: int):
        key = (k, W, t_cols)
        if key in self._mix_cache:
            return self._mix_cache[key]
        RM = self.rare_terms
        cap = self.per_term_cap
        r2 = self._r2
        n_cand = self.n_candidates
        topc_recall = self.topc_recall
        use_pal = self.use_pallas
        csr_aligned = self._csr_aligned
        k1, b = self._k1, self._b
        ln64 = float(np.log(64.0)) / 254.0
        M = len(self.langs)

        from ..ops.bm25 import (bm25_pruned_topk_packed,
                                gather_pruned_candidate_keys)

        @jax.jit
        def run(packed, flat_all, off_all, lens_all, normc_all,
                csr_off, csr_pk, f32s, i32s):
            def body(carry, xs):
                pq, fs, is_ = xs
                avgdl, lo, step = fs[0], fs[1], fs[2]
                n_real, doc_b, voc_b = is_[0], is_[1], is_[2]
                rare = pq[:, :RM]
                pos = RM
                t_doc = pq[:, pos: pos + t_cols]
                pos += t_cols
                u = pq[:, pos: pos + t_cols // 2]
                pos += t_cols // 2
                qt = pq[:, pos: pos + W]
                qw = jax.lax.bitcast_convert_type(
                    pq[:, pos + W: pos + 2 * W], jnp.float32)
                lo16 = jax.lax.convert_element_type(u & 0xFFFF, jnp.uint16)
                hi16 = jax.lax.convert_element_type(
                    jax.lax.shift_right_logical(u, 16) & 0xFFFF,
                    jnp.uint16)
                ex = jnp.stack([
                    jax.lax.bitcast_convert_type(lo16, jnp.float16),
                    jax.lax.bitcast_convert_type(hi16, jnp.float16),
                ], axis=-1).reshape(u.shape[0], t_cols).astype(jnp.float32)
                ex = jnp.where(t_doc >= 0, ex, 0.0)
                rank_lo = lo
                rank_step = step + ln64
                rare_g = jnp.where(rare >= 0, rare + voc_b, -1)
                keys = gather_pruned_candidate_keys(
                    rare_g, csr_off, csr_pk, cap,
                    reencode=True, lo_src=lo, step_src=step,
                    lo_dst=rank_lo, step_dst=rank_step,
                    aligned=csr_aligned)
                code = jnp.clip(jnp.round(
                    (jnp.log(jnp.maximum(ex, 1e-30)) - rank_lo)
                    / rank_step) + 1.0, 1.0, 255.0).astype(jnp.uint32)
                ok = (t_doc >= 0) & (ex > 0)
                tkeys = jnp.where(
                    ok, (t_doc.astype(jnp.uint32) << 8) | code,
                    jnp.uint32(0xFFFFFFFF))
                fields = ((qt, qw, flat_all, off_all, lens_all,
                           normc_all, k1, b, avgdl),)
                scores, ids = bm25_pruned_topk_packed(
                    jnp.concatenate([keys, tkeys], axis=1),
                    fields, n_real_docs=n_real, k=k,
                    n_candidates=n_cand, max_dup_shifts=RM + 1,
                    imp_lo=rank_lo, imp_step=rank_step,
                    tiny_doc=t_doc, tiny_ex=ex, use_pallas=use_pal,
                    ragged_rows=(r2,), rescore_id_offset=doc_b,
                    topc_recall=topc_recall)
                return carry, (scores, ids)

            _, (scores, ids) = jax.lax.scan(
                body, None, (packed, f32s, i32s))
            Q = packed.shape[1]
            s = jnp.swapaxes(scores, 0, 1).reshape(Q, M * k)
            i = jnp.swapaxes(ids, 0, 1).reshape(Q, M * k)
            ts, idx = jax.lax.top_k(s, k)
            ti = jnp.take_along_axis(i, idx, axis=1)
            return jnp.concatenate(
                [ti, jax.lax.bitcast_convert_type(ts, jnp.int32)], axis=1)

        self._mix_cache[key] = run
        return run

    def _dispatch(self, packed_dev, k: int, W: int, t_cols: int):
        run = self._mix_fn(k, W, t_cols)
        return run(packed_dev, *self._dev)

    # -- public API ------------------------------------------------------------

    def search_texts(self, queries: Sequence[str], k: int = 10,
                     max_query_terms: int = 64
                     ) -> List[List[Tuple[str, RetrievedDoc]]]:
        """MIX retrieval of raw-string queries: one upload, one dispatch,
        one pull; results merged across languages by score (the wildcard
        msearch's semantics)."""
        packed, n_q, W, t_cols = self.pack_batch(
            queries, max_query_terms=max_query_terms)
        out = self._dispatch(jnp.asarray(packed), k, W, t_cols)
        scores, ids = RetrievalEngine.unpack_result(out)
        return self._materialize(scores[:n_q], ids[:n_q])

    def search_texts_stream(self, query_batches, k: int = 10,
                            workers: int = 3, depth: int = 2,
                            max_query_terms: int = 64):
        """Pipelined MIX serving: worker threads pack batch i+1 and start
        its upload while the device runs batch i and the caller pulls
        batch i-1 (same stage overlap as
        :meth:`RetrievalEngine.search_stream`, one transfer per batch for
        ALL languages). Yields merged per-batch results in order."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def prep(qs):
            packed, n_q, W, t_cols = self.pack_batch(
                qs, max_query_terms=max_query_terms)
            return jnp.asarray(packed), n_q, W, t_cols

        it = iter(query_batches)
        workers = max(workers, 1)
        depth = max(depth, 1)
        # pulls overlap on their own pool (see
        # RetrievalEngine.search_stream: one pull is a ~30-70 ms tunnel
        # round trip; on the caller's thread it was the stream's binder)
        with ThreadPoolExecutor(max_workers=workers) as ex, \
                ThreadPoolExecutor(max_workers=depth + 1) as pull_ex:
            futs = []
            for qs in it:
                futs.append(ex.submit(prep, qs))
                if len(futs) >= workers:
                    break
            if not futs:
                return
            pending: deque = deque()

            def pull_one(out, n_q):
                scores, ids = RetrievalEngine.unpack_result(out)
                return self._materialize(scores[:n_q], ids[:n_q])

            def flush(f):
                dev, n_q, W, t_cols = f.result()
                out = self._dispatch(dev, k, W, t_cols)
                pending.append(pull_ex.submit(pull_one, out, n_q))

            for nxt in it:
                futs.append(ex.submit(prep, nxt))
                flush(futs.pop(0))
                if len(pending) > depth:
                    yield pending.popleft().result()
            while futs:
                flush(futs.pop(0))
                if len(pending) > depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def _materialize(self, scores: np.ndarray, ids: np.ndarray
                     ) -> List[List[Tuple[str, RetrievedDoc]]]:
        """Global ids -> (lang, RetrievedDoc) via the doc-base map."""
        out: List[List[Tuple[str, RetrievedDoc]]] = []
        for qi in range(ids.shape[0]):
            row = []
            for r in range(ids.shape[1]):
                g, s = int(ids[qi, r]), float(scores[qi, r])
                if g < 0 or s <= 0.0:
                    continue
                li = int(np.searchsorted(
                    self._doc_base, g, side="right")) - 1
                lang = self.langs[li]
                eng = self.engines[lang]
                d = g - int(self._doc_base[li])
                if d >= eng.text_index.n_docs:
                    continue
                if eng.store is not None:
                    row.append((lang, eng.store.materialize(d, s)))
                else:
                    row.append((lang, RetrievedDoc(doc_id=d, score=s)))
            out.append(row)
        return out
