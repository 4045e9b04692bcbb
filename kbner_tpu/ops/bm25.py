"""BM25 scoring kernels: blockwise match-and-accumulate with fused top-k.

The device-side replacement for Lucene's term-at-a-time scorer inside
Elasticsearch (reached over HTTP at ``kb/generate_data.py:33-68``). Classic
posting-list traversal is gather/scatter-shaped and TPU-hostile; instead the
index is laid out as dense padded per-document (term-id, impact) slots
(see ``retrieval/index.py``) and scoring is an exhaustive, perfectly regular
compare-multiply-reduce over document blocks:

  score[q, d] = sum_j sum_l impacts[d, j] * w[q, l] * (terms[d, j] == qt[q, l])

This is exact BM25 (100% recall parity by construction). Doc arrays are kept
transposed ([Ld, N]) so the document axis lies on the 128-lane dimension.

Multi-field queries (ES ``bool.should`` with ``match(text=...)`` plus
``match(title=entity, boost=2.0)``, ``generate_data.py:52-55``) are score
sums over fields; ``bm25_topk`` takes a tuple of per-field operands and adds
their scores before the top-k.

Two implementations with identical semantics:
  * :func:`bm25_score_block_xla` — pure jnp equality-einsum (CPU tests and
    XLA-autofused baseline),
  * :func:`bm25_score_block_pallas` — Pallas kernel blocking Q x N over the
    grid, keeping the [BQ, Ld, BD] match tile in VMEM (interpret mode on CPU).

``bm25_topk`` chunks the document axis with lax.scan and keeps a running
top-k, so the full [Q, N] score matrix is never materialized in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One field's operands: (q_terms [Q,Lq] i32, q_weights [Q,Lq] f32,
#                        doc_terms_t [Ld,N] i32, doc_impacts_t [Ld,N] f32)
FieldOperands = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def bm25_score_block_xla(
    q_terms: jnp.ndarray,
    q_weights: jnp.ndarray,
    doc_terms_t: jnp.ndarray,
    doc_impacts_t: jnp.ndarray,
) -> jnp.ndarray:  # [Q, D]
    match = (
        q_terms[:, :, None, None] == doc_terms_t[None, None, :, :]
    )  # [Q, Lq, Ld, D]
    contrib = jnp.where(
        match, (q_weights[:, :, None, None] * doc_impacts_t[None, None]), 0.0)
    return contrib.sum(axis=(1, 2))


def _bm25_kernel(qt_ref, qw_ref, dt_ref, di_ref, out_ref):
    """One (BQ, BD) output tile. Statically unrolled over query-term slots
    (Lq is a small compile-time constant; Mosaic rejects dynamic lane-dim
    slices inside fori_loop); each step does a [BQ, Ld, BD] equality-compare
    + weighted reduce on the VPU."""
    lq = qt_ref.shape[1]
    dt = dt_ref[:, :]  # [Ld, BD]
    di = di_ref[:, :]  # [Ld, BD]

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for l in range(lq):
        t = qt_ref[:, l:l + 1]  # [BQ, 1]
        w = qw_ref[:, l:l + 1]  # [BQ, 1]
        match = dt[None, :, :] == t[:, :, None]  # [BQ, Ld, BD]
        contrib = jnp.sum(
            jnp.where(match, di[None, :, :], 0.0), axis=1)  # [BQ, BD]
        acc = acc + w * contrib
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("block_q", "block_d"))
def bm25_score_block_pallas(
    q_terms: jnp.ndarray,
    q_weights: jnp.ndarray,
    doc_terms_t: jnp.ndarray,
    doc_impacts_t: jnp.ndarray,
    block_q: int = 64,
    block_d: int = 512,
) -> jnp.ndarray:
    Q, Lq = q_terms.shape
    Ld, D = doc_terms_t.shape
    block_q = min(block_q, Q)
    # The kernel's [BQ, Ld, BD] match tile must fit VMEM (~16 MB/core);
    # budget ~6 MB for it and shrink block_d accordingly.
    vmem_budget = 6 * 1024 * 1024
    max_bd = max(128, (vmem_budget // (4 * block_q * max(Ld, 1))) // 128 * 128)
    block_d = min(block_d, max_bd, D)
    # after the VMEM shrink the block may no longer divide D; step down
    # by 128-lane multiples until it does (large D is 128-padded; tiny
    # CPU-test shapes keep block_d = D)
    if D >= 128:
        block_d = max(block_d // 128 * 128, 128)
        while block_d > 128 and D % block_d:
            block_d -= 128
    if Q % block_q != 0 or D % block_d != 0:
        raise ValueError(f"Q={Q} and D={D} must be multiples of the blocks "
                         f"({block_q}, {block_d}); pad upstream.")
    grid = (Q // block_q, D // block_d)
    return pl.pallas_call(
        _bm25_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, Lq), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, Lq), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ld, block_d), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ld, block_d), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, block_d), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * Q * Lq * Ld * D, bytes_accessed=Q * D * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(q_terms, q_weights, doc_terms_t, doc_impacts_t)


def _rescore_kernel(scale_ref, qt_ref, qw_ref, dt_ref, dc_ref, out_ref):
    """One (BQ, BC) rescore tile: candidates' transposed rows in VMEM,
    statically unrolled over query-term slots (same shape discipline as
    :func:`_bm25_kernel`, with a leading per-query dim because every query
    has its own gathered candidate rows). ``scale_ref`` carries the
    (lo, step) dequantization scale in SMEM (traced, not compile-time)."""
    lq = qt_ref.shape[1]
    lo, step = scale_ref[0], scale_ref[1]
    dt = dt_ref[:, :, :]  # [BQ, Ld, BC] int32 term ids
    code = dc_ref[:, :, :].astype(jnp.float32)  # int32 16-bit log codes
    di = jnp.where(code > 0, jnp.exp(lo + (code - 1.0) * step), 0.0)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for l in range(lq):
        t = qt_ref[:, l:l + 1]  # [BQ, 1]
        w = qw_ref[:, l:l + 1]  # [BQ, 1]
        match = dt == t[:, :, None]  # [BQ, Ld, BC]
        acc = acc + w * jnp.sum(
            jnp.where(match, di, 0.0), axis=1)  # [BQ, BC]
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("block_q", "block_c"))
def bm25_rescore_pallas(
    q_terms: jnp.ndarray,  # [Q, Lq] int32
    q_weights: jnp.ndarray,  # [Q, Lq] float32
    dt_t: jnp.ndarray,  # [Q, Ld, C] int32 gathered candidate term rows
    dc_t: jnp.ndarray,  # [Q, Ld, C] int32 16-bit log impact codes
    lo: float | jnp.ndarray,
    step: float | jnp.ndarray,
    block_q: int = 8,
    block_c: int = 512,
) -> jnp.ndarray:  # [Q, C]
    """Pass-2 candidate rescoring as a Pallas kernel.

    The XLA broadcast-compare formulation materializes a [Q, C, Ld]
    intermediate per query-term slot (~20x off memory speed-of-light at
    wiki scale — measured 100 ms of a 178 ms search at 1M docs); here each
    grid step keeps one [BQ, Ld, BC] candidate tile in VMEM and the Lq
    unrolled compare-accumulate runs entirely on the VPU."""
    Q, Lq = q_terms.shape
    _, Ld, C = dt_t.shape
    block_q = min(block_q, Q)
    vmem_budget = 6 * 1024 * 1024
    max_bc = max(
        128, (vmem_budget // (8 * block_q * max(Ld, 1))) // 128 * 128)
    block_c = min(block_c, max_bc, C)
    if Q % block_q != 0 or C % block_c != 0:
        raise ValueError(f"Q={Q} and C={C} must be multiples of the blocks "
                         f"({block_q}, {block_c}); pad upstream.")
    grid = (Q // block_q, C // block_c)
    scale = jnp.stack([jnp.float32(lo), jnp.float32(step)])
    return pl.pallas_call(
        _rescore_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_q, Lq), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, Lq), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, Ld, block_c), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, Ld, block_c), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, block_c), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * Q * Lq * Ld * C, bytes_accessed=Q * Ld * C * 8,
            transcendentals=Q * Ld * C),
        interpret=_interpret(),
    )(scale, q_terms, q_weights, dt_t, dc_t)


def _d16_rescore_kernel(qt_ref, qw_ref, rows_ref, start_ref, len_ref,
                        norm_ref, out_ref):
    """One (BQ, BC) delta16 rescore tile, fully in VMEM: decode the
    gap/tf slots, reconstruct term ids with a shifted-add prefix sum
    along the 128-lane segment, and run the statically-unrolled
    query-term compare-accumulate on the VPU. Single pass over the
    gathered rows — the XLA formulation re-reads the decoded [Q, C, S]
    intermediates once per query-term slot."""
    v = rows_ref[...]  # [BQ, BC, L] int32 (uint16 slots, zero-extended)
    L = v.shape[2]
    gap = jax.lax.shift_right_logical(v, 3)
    tf = (v & 7).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
    start = start_ref[...][:, :, None]  # [BQ, BC, 1]
    ln = len_ref[...][:, :, None]
    gm = jnp.where(lane >= start, gap, 0)
    ids = gm
    sh = 1
    while sh < L:  # Hillis-Steele inclusive prefix sum over lanes
        ids = ids + jnp.pad(ids, ((0, 0), (0, 0), (sh, 0)))[:, :, :L]
        sh *= 2
    valid = (lane >= start) & (lane < start + ln) & ((v & 7) > 0)
    tfn = tf / (tf + norm_ref[...][:, :, None])
    di = jnp.where(valid, tfn, 0.0)
    idm = jnp.where(valid, ids, -1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # static unroll: Mosaic can't lane-dynamically slice qt_ref, and the
    # stack cost of the unrolled masks is covered by the raised
    # vmem_limit_bytes below
    for w in range(qt_ref.shape[1]):
        t = qt_ref[:, w]  # [BQ]
        m = idm == t[:, None, None]
        acc = acc + qw_ref[:, w][:, None] * jnp.sum(
            jnp.where(m, di, 0.0), axis=2)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("block_q", "block_c"))
def delta16_rescore_pallas(
    q_terms: jnp.ndarray,   # [Q, W] int32 remapped ids (-1 = no match)
    q_weights: jnp.ndarray,  # [Q, W] f32 idf-folded weights
    rows: jnp.ndarray,      # [Q, C, L] int32 gathered delta16 slots
    seg_start: jnp.ndarray,  # [Q, C] int32 lane offset of the segment
    seg_len: jnp.ndarray,   # [Q, C] int32 slot count
    norm: jnp.ndarray,      # [Q, C] f32 per-candidate BM25 norm
    block_q: int = 8,
    block_c: int = 128,
) -> jnp.ndarray:  # [Q, C]
    """Pass-2 rescoring over DELTA16 rows as a Pallas kernel (r2 == 1
    layouts — segments within one covering row). Numerically identical
    to the XLA branch in :func:`_rescore_candidates` (same decode, same
    f32 tfNorm arithmetic)."""
    Q, W = q_terms.shape
    _, C, L = rows.shape
    block_q = min(block_q, Q)
    block_c = min(block_c, C)
    if Q % block_q or C % block_c:
        raise ValueError(f"Q={Q}, C={C} must tile ({block_q}, {block_c})")
    grid = (Q // block_q, C // block_c)
    return pl.pallas_call(
        _d16_rescore_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, block_c, L), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, block_c), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, block_c), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, block_c), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, block_c), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * Q * C * L * W, bytes_accessed=Q * C * L * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(q_terms, q_weights, rows, seg_start, seg_len, norm)


def _score_fields(
    fields: Sequence[FieldOperands],
    start: Optional[jnp.ndarray],
    doc_chunk: Optional[int],
    use_pallas: bool,
    block_q: int,
    block_d: int,
) -> jnp.ndarray:
    """Sum of per-field scores for one document chunk (or the whole axis)."""
    total = None
    for (qt, qw, dtt, dit) in fields:
        if start is not None:
            ld = dtt.shape[0]
            dtt = jax.lax.dynamic_slice(dtt, (0, start), (ld, doc_chunk))
            dit = jax.lax.dynamic_slice(dit, (0, start), (ld, doc_chunk))
        if use_pallas:
            s = bm25_score_block_pallas(
                qt, qw, dtt, dit, block_q=block_q, block_d=block_d)
        else:
            s = bm25_score_block_xla(qt, qw, dtt, dit)
        total = s if total is None else total + s
    return total


def merge_topk(
    scores_a: jnp.ndarray, ids_a: jnp.ndarray,
    scores_b: jnp.ndarray, ids_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two per-query top-k lists -> top-k of the union."""
    scores = jnp.concatenate([scores_a, scores_b], axis=1)
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    top_scores, idx = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, idx, axis=1)
    return top_scores, top_ids


def bm25_topk(
    fields: Sequence[FieldOperands],
    k: int = 10,
    doc_chunk: Optional[int] = None,
    use_pallas: bool = True,
    block_q: int = 64,
    block_d: int = 512,
    id_offset: jnp.ndarray | int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k BM25 (scores, doc ids) per query over the whole collection.

    ``fields`` is a non-empty sequence of per-field operands whose scores are
    added (multi-field bool.should). Scans the document axis in
    ``doc_chunk``-sized pieces with a running top-k merge, bounding HBM at
    [Q, doc_chunk] instead of [Q, N]. ``id_offset`` (traced ok) shifts
    returned doc ids — shard-local to global when the index is sharded.
    """
    fields = tuple(fields)
    Q = fields[0][0].shape[0]
    N = fields[0][2].shape[1]

    if doc_chunk is None or doc_chunk >= N:
        scores = _score_fields(fields, None, None, use_pallas, block_q, block_d)
        kk = min(k, N)
        top_scores, top_ids = jax.lax.top_k(scores, kk)
        return top_scores, top_ids + id_offset

    if N % doc_chunk != 0:
        raise ValueError(f"N={N} must be a multiple of doc_chunk={doc_chunk}")
    n_chunks = N // doc_chunk

    def chunk_step(carry, chunk_idx):
        run_scores, run_ids = carry
        start = chunk_idx * doc_chunk
        scores = _score_fields(
            fields, start, doc_chunk, use_pallas, block_q, block_d)
        c_scores, c_ids = jax.lax.top_k(scores, min(k, doc_chunk))
        c_ids = c_ids + start + id_offset
        return merge_topk(run_scores, run_ids, c_scores, c_ids, k), None

    init = (
        jnp.full((Q, k), -jnp.inf, jnp.float32),
        jnp.full((Q, k), -1, jnp.int32),
    )
    (top_scores, top_ids), _ = jax.lax.scan(
        chunk_step, init, jnp.arange(n_chunks))
    return top_scores, top_ids


# -- two-pass pruned search (MaxScore-style) -----------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("k", "n_candidates", "max_dup_shifts", "use_pallas",
                     "ragged_rows", "exact_by_sign"),
)
def bm25_pruned_topk(
    cand_doc: jnp.ndarray,  # [Q, P] int32 candidate doc ids (-1 pad)
    cand_imp: jnp.ndarray,  # [Q, P] float32 rare-term impacts
    fields: Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], ...],
    # per field: (q_terms [Q, Lq], q_weights [Q, Lq],
    #             doc_terms [N, Ld] DOC-major, doc_impacts [N, Ld])
    n_real_docs: int | jnp.ndarray = None,
    k: int = 10,
    n_candidates: int = 512,
    max_dup_shifts: int = 16,
    use_pallas: bool = False,
    ragged_rows: Tuple[int, ...] = (),
    exact_by_sign: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass top-k: candidate generation from gathered rare-term postings
    (host/native side produced ``cand_doc``/``cand_imp``), then BM25
    rescoring of the top candidates.

    The device-side replacement for Lucene's WAND/MaxScore pruning: work
    scales with the rare terms' posting mass + n_candidates, not with the
    collection size. Returned scores are exact BM25 under the f32 field
    layout, and exact up to the impact quantization of the packed/coded
    layouts (<= ~0.1% relative); recall@k < 100% only when a true top-k
    doc shares no rare term with the query or falls below the top-C
    pass-1 partial-score cut.

    ``exact_by_sign``: NEGATIVE ``cand_imp`` entries carry EXACT score
    contributions already known in pass 1 (host-gathered weighted sums of
    "tiny" terms whose posting lists fit pass-1 entirely — the
    compact-rows engine excludes those terms from the pass-2 rows).
    |value| joins the ranking partial; the negative entries' sums are
    ADDED to the pass-2 rescore. Riding the sign bit keeps the dedup
    sort at two operands — a third f32 operand measured ~1.5x sort cost
    on v5e. ORDERING CONTRACT: the negative entries are host-deduplicated
    (at most one per (query, doc)) and MUST be concatenated BEFORE the
    window blocks — the stable doc-sort then leaves each run's exact
    entry at the run start, so no accumulation pass is needed for it.
    """
    Q, P = cand_doc.shape
    SENTINEL = jnp.int32(2**31 - 2)
    doc = jnp.where(cand_doc < 0, SENTINEL, cand_doc)

    # sort each row by doc id, carrying impacts. lax.sort moves the values
    # with the keys inside the sort network — argsort + take_along_axis was
    # measured ~30x slower on v5e (a [Q, P] element gather per array).
    doc, enc = jax.lax.sort((doc, cand_imp), dimension=1, num_keys=1,
                            is_stable=True)
    imp = jnp.abs(enc) if exact_by_sign else enc

    # sum duplicate docs (each query term contributes <= once per doc, so
    # duplicates per doc <= #rare terms <= max_dup_shifts) — segmented
    # Hillis-Steele doubling: after the step at offset s, summed[i] holds
    # the in-run sum of imp[i .. i+2s); ceil(log2) passes over [Q, P]
    # instead of max_dup_shifts-1 (4 vs 15 at the default 16)
    summed = imp
    s = 1
    while s < max_dup_shifts and s < P:
        match = doc[:, s:] == doc[:, :-s]
        summed = summed.at[:, : P - s].add(
            jnp.where(match, summed[:, s:], 0.0))
        s *= 2

    run_start = jnp.concatenate(
        [jnp.ones((Q, 1), bool), doc[:, 1:] != doc[:, :-1]], axis=1)
    valid = doc != SENTINEL
    partial = jnp.where(run_start & valid, summed, -jnp.inf)

    C = min(n_candidates, P)
    part_scores, pos = jax.lax.top_k(partial, C)  # [Q, C]
    cand_ids = jnp.take_along_axis(doc, pos, axis=1)  # [Q, C]
    cand_valid = jnp.isfinite(part_scores)
    safe_ids = jnp.where(cand_valid, cand_ids, 0)

    total = _rescore_candidates(safe_ids, fields, ragged_rows, use_pallas)

    if exact_by_sign:
        # pass-1-exact contributions (tiny terms absent from the rows):
        # by the ordering contract the run's unique negative entry sits at
        # the run start — exactly where top-C candidate positions point
        total = total + jnp.take_along_axis(
            jnp.maximum(-enc, 0.0), pos, axis=1)

    if n_real_docs is not None:
        cand_valid = cand_valid & (cand_ids < n_real_docs)
    total = jnp.where(cand_valid, total, -jnp.inf)
    kk = min(k, C)
    top_scores, idx = jax.lax.top_k(total, kk)
    top_ids = jnp.take_along_axis(cand_ids, idx, axis=1)
    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, -1)
    return top_scores, top_ids


def _rescore_candidates(safe_ids, fields, ragged_rows, use_pallas):
    # pass 2: (near-)exact rescoring over all fields — a row-block gather
    # of the candidates' doc-major rows. Field layouts:
    #   (qt, qw, doc_terms, doc_impacts)                    f32 legacy
    #   (qt, qw, packed_rows, term_bits, lo, step)          bit-packed
    #   (qt, qw, doc_terms, doc_codes_u16, lo, step)        two-array
    #   (qt, qw, flat_rows, doc_off, doc_len,
    #    term_bits, lo, step)                               RAGGED packed
    # The ragged layout is the production path (~4 B per real posting, no
    # dense padding): each candidate's segment is fetched by gathering its
    # ragged_rows[f] covering 128-lane rows from ``flat_rows``; lanes
    # outside [off, off+len) — pad slots and neighbor docs sharing the
    # row — are masked via the global slot index. The row GATHER dominates
    # pass-2 (~50 ns per gathered row on v5e); impacts are log-quantized
    # (retrieval/index.py::log_quantize, <= 0.1% relative at >= 12 code
    # bits, in the same class as Lucene's own 1-byte norm quantization;
    # the production per-term scale is finer still, engine.py).
    Q, C = safe_ids.shape
    total = jnp.zeros((Q, C), jnp.float32)
    for f_idx, field in enumerate(fields):
        if len(field) == 9:
            # DELTA16 ragged rows (engine.py::_pack_doc_rows_delta16):
            # uint16 slots (gap13 << 3 | tf3), term ids reconstructed by
            # a masked prefix sum over the covering rows (gaps before the
            # segment start zeroed), impacts recomputed EXACTLY as
            # tf/(tf + norm_d) with idf folded into the query weights and
            # norm_d decoded from the 1-byte Lucene norm code
            # (index.py::int4_to_long, arithmetically: (bits|8) * 2^shift).
            (qt, qw, flat_u16, doc_off, doc_len, norm_code,
             k1, b, avgdl) = field
            R2 = ragged_rows[f_idx] if f_idx < len(ragged_rows) else 1
            lanes = flat_u16.shape[1]
            off = doc_off[safe_ids].astype(jnp.int32)  # [Q, C]
            ln = doc_len[safe_ids].astype(jnp.int32)
            code = norm_code[safe_ids].astype(jnp.int32)  # [Q, C]
            bits = (code & 7).astype(jnp.float32)
            shift = (code >> 3) - 1
            dl = jnp.where(
                shift < 0, bits,
                (bits + 8.0) * jnp.exp2(shift.astype(jnp.float32)))
            norm = k1 * (1.0 - b + b * dl / avgdl)  # [Q, C]
            if (use_pallas and R2 == 1 and Q % 8 == 0 and C % 128 == 0):
                r0 = off // lanes
                rows = flat_u16[r0].astype(jnp.int32)  # [Q, C, lanes]
                total = total + delta16_rescore_pallas(
                    qt, qw, rows, off % lanes, ln, norm)
                continue
            r0 = off // lanes
            rr = jax.lax.broadcasted_iota(jnp.int32, (Q, C, R2), 2)
            rows = flat_u16[r0[:, :, None] + rr]  # [Q, C, R2, lanes]
            v = rows.astype(jnp.int32)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (Q, C, R2, lanes), 3)
            g = (r0[:, :, None] + rr)[..., None] * lanes + lane
            seg = (g >= off[:, :, None, None]) & (
                g < (off + ln)[:, :, None, None])
            gap = jax.lax.shift_right_logical(v, 3)
            tf = (v & 7).astype(jnp.float32).reshape(Q, C, -1)
            gap_m = jnp.where(g >= off[:, :, None, None], gap, 0)
            ids = jnp.cumsum(gap_m.reshape(Q, C, -1), axis=-1)
            valid = (seg & ((v & 7) > 0)).reshape(Q, C, -1)
            dt_rows = jnp.where(valid, ids, -1)
            di_rows = jnp.where(valid, tf / (tf + norm[:, :, None]), 0.0)
        elif len(field) == 8:
            qt, qw, flat_rows, doc_off, doc_len, term_bits, lo, step = field
            R2 = ragged_rows[f_idx] if f_idx < len(ragged_rows) else 1
            lanes = flat_rows.shape[1]
            off = doc_off[safe_ids].astype(jnp.int32)  # [Q, C]
            ln = doc_len[safe_ids].astype(jnp.int32)
            r0 = off // lanes
            rr = jax.lax.broadcasted_iota(jnp.int32, (Q, C, R2), 2)
            rows = flat_rows[r0[:, :, None] + rr]  # [Q, C, R2, lanes]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (Q, C, R2, lanes), 3)
            g = (r0[:, :, None] + rr)[..., None] * lanes + lane
            seg = (g >= off[:, :, None, None]) & (
                g < (off + ln)[:, :, None, None])
            dt_rows = (rows & ((1 << term_bits) - 1)).reshape(Q, C, -1)
            code = jax.lax.shift_right_logical(
                rows, term_bits).astype(jnp.float32)
            di_rows = jnp.where(
                seg & (code > 0),
                jnp.exp(lo + (code - 1.0) * step), 0.0).reshape(Q, C, -1)
        elif len(field) == 6 and jnp.ndim(field[3]) == 0:
            qt, qw, packed_rows, term_bits, lo, step = field
            rows = packed_rows[safe_ids]  # [Q, C, Ld] — ONE gather
            dt_rows = rows & ((1 << term_bits) - 1)
            code = jax.lax.shift_right_logical(
                rows, term_bits).astype(jnp.float32)
            di_rows = jnp.where(
                code > 0, jnp.exp(lo + (code - 1.0) * step), 0.0)
        elif len(field) == 6:
            qt, qw, dterms, dcodes, lo, step = field
            if use_pallas and Q % 8 == 0 and C % 128 == 0:
                # transpose candidates onto the lane axis and rescore in
                # VMEM tiles (one HBM pass) instead of the XLA broadcast
                # form (which materializes [Q, C, Ld] per term slot)
                dt_t = jnp.swapaxes(dterms[safe_ids], 1, 2)  # [Q, Ld, C]
                dc_t = jnp.swapaxes(
                    dcodes[safe_ids].astype(jnp.int32), 1, 2)
                total = total + bm25_rescore_pallas(
                    qt, qw, dt_t, dc_t, lo=lo, step=step)
                continue
            dt_rows = dterms[safe_ids]  # [Q, C, Ld]
            code = dcodes[safe_ids].astype(jnp.float32)
            di_rows = jnp.where(
                code > 0, jnp.exp(lo + (code - 1.0) * step), 0.0)
        else:
            qt, qw, dterms, dimps = field
            dt_rows = dterms[safe_ids]  # [Q, C, Ld]
            di_rows = dimps[safe_ids]
        Lq = qt.shape[1]
        for l in range(Lq):
            t = qt[:, l][:, None, None]  # [Q, 1, 1]
            w = qw[:, l][:, None]  # [Q, 1]
            m = dt_rows == t  # [Q, C, Ld]
            total = total + w * jnp.sum(
                jnp.where(m, di_rows, 0.0), axis=-1)
    return total


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_candidates", "max_dup_shifts", "use_pallas",
                     "ragged_rows", "topc_recall"),
)
def bm25_pruned_topk_packed(
    cand_keys: jnp.ndarray,  # [Q, P] uint32 (doc << 8) | code8; pad ~0
    fields: Tuple[Tuple, ...],
    n_real_docs: int | jnp.ndarray = None,
    k: int = 10,
    n_candidates: int = 512,
    max_dup_shifts: int = 16,
    imp_lo: float | jnp.ndarray = 0.0,
    imp_step: float | jnp.ndarray = 1.0,
    tiny_doc: jnp.ndarray = None,  # [Q, T] int32 (-1 pad)
    tiny_ex: jnp.ndarray = None,   # [Q, T] f32 exact tiny sums
    use_pallas: bool = False,
    ragged_rows: Tuple[int, ...] = (),
    rescore_id_offset: int | jnp.ndarray = 0,
    topc_recall: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-key variant of :func:`bm25_pruned_topk`: every pass-1
    candidate is ONE uint32 ``(doc << 8) | code8`` (pad = all-ones), so
    the doc-major dedup sort runs with a single operand — the sort is the
    pass-1 bottleneck on TPU, and the two-operand (key, value) network
    costs ~1.5x the one-operand one. The 8-bit code (shared
    ``imp_lo``/``imp_step`` log scale — the packed CSR's own) only RANKS
    candidates; scores come from the pass-2 rescore plus the f32
    ``tiny_ex`` exact sums matched against the selected candidates (so
    tiny-term contributions stay lossless without riding the sort as a
    second operand — the old ``exact_by_sign`` contract is gone).

    ``rescore_id_offset`` (traced ok) shifts candidate doc ids ONLY for
    the pass-2 row lookup and the returned ids: the multi-index MIX
    engine concatenates every language's pass-2 rows into one global
    structure (doc -> (lang, local-id) map), while pass-1 keys, the
    ``n_real_docs`` bound, and the ``tiny_doc`` match stay language-LOCAL
    (one language per call; the reference's wildcard ``*wiki_v1`` fan-out,
    ``kb/generate_data.py:21-24``).

    ``topc_recall`` > 0 selects the top-C candidates with
    ``jax.lax.approx_max_k`` at that per-element recall target instead of
    exact ``top_k``: on TPU the exact top-C lowers to a full variadic
    (value, index) sort of the [Q, P] partials — of the same cost class
    as the pass-1 key sort itself — while the approximate reduction is a
    single binned pass. Missing a candidate near the top-C BOUNDARY is
    ~harmless (C >> k: a true top-k doc sits far above the cut, and the
    recall gate measures the end-to-end effect).
    """
    Q, P = cand_keys.shape
    SENT = jnp.uint32(0xFFFFFFFF)
    keys = jax.lax.sort(cand_keys, dimension=1, is_stable=False)
    doc = jnp.right_shift(keys, 8).astype(jnp.int32)
    code = (keys & jnp.uint32(0xFF)).astype(jnp.float32)
    valid = keys != SENT
    imp = jnp.where(valid & (code > 0),
                    jnp.exp(imp_lo + (code - 1.0) * imp_step), 0.0)

    # segmented doubling scan: ceil(log2(max_dup_shifts)) passes instead
    # of max_dup_shifts-1 (see bm25_pruned_topk)
    summed = imp
    s = 1
    while s < max_dup_shifts and s < P:
        match = doc[:, s:] == doc[:, :-s]
        summed = summed.at[:, : P - s].add(
            jnp.where(match, summed[:, s:], 0.0))
        s *= 2
    run_start = jnp.concatenate(
        [jnp.ones((Q, 1), bool), doc[:, 1:] != doc[:, :-1]], axis=1)
    partial = jnp.where(run_start & valid, summed, -jnp.inf)

    C = min(n_candidates, P)
    if topc_recall > 0.0:
        part_scores, pos = jax.lax.approx_max_k(
            partial, C, recall_target=topc_recall)
    else:
        part_scores, pos = jax.lax.top_k(partial, C)
    cand_ids = jnp.take_along_axis(doc, pos, axis=1)
    cand_valid = jnp.isfinite(part_scores)
    safe_ids = jnp.where(cand_valid, cand_ids, 0)

    total = _rescore_candidates(
        safe_ids + rescore_id_offset, fields, ragged_rows, use_pallas)
    if tiny_doc is not None:
        # lossless tiny contributions: match the selected candidates
        # against the host-gathered (doc, f32 sum) block. [Q, C, T]
        # compare+sum fuses into one reduction pass in XLA.
        m = safe_ids[:, :, None] == tiny_doc[:, None, :]
        total = total + jnp.sum(
            jnp.where(m & (tiny_doc[:, None, :] >= 0),
                      tiny_ex[:, None, :], 0.0), axis=-1)

    if n_real_docs is not None:
        cand_valid = cand_valid & (cand_ids < n_real_docs)
    total = jnp.where(cand_valid, total, -jnp.inf)
    kk = min(k, C)
    top_scores, idx = jax.lax.top_k(total, kk)
    top_ids = jnp.take_along_axis(cand_ids, idx, axis=1)
    top_ids = jnp.where(
        jnp.isfinite(top_scores), top_ids + rescore_id_offset, -1)
    return top_scores, top_ids


def gather_pruned_candidate_keys(
    rare_terms: jnp.ndarray,  # [Q, M] int32 pass-1 term ids (-1 pad)
    offsets: jnp.ndarray,  # [V+1] int32 CSR element offsets
    packed_rows: jnp.ndarray,  # [NR, 128] int32 (code8 << 24) | doc_id
    per_term_cap: int,
    reencode: bool = False,
    lo_src: float | jnp.ndarray = 0.0,
    step_src: float | jnp.ndarray = 1.0,
    lo_dst: float | jnp.ndarray = 0.0,
    step_dst: float | jnp.ndarray = 1.0,
    aligned: bool = False,
) -> jnp.ndarray:
    """Pass-1 window gather emitting packed uint32 sort keys
    ``(doc << 8) | code8`` (pad = all-ones) for
    :func:`bm25_pruned_topk_packed`. When the source CSR's log scale
    differs from the pooled key scale (title field pooled with text),
    codes are re-encoded: code' = ((lo_s + (code-1)*step_s) - lo_d)
    / step_d, clipped to [1, 255]. ``aligned`` means the CSR was built
    with ``align_windows`` (every window starts on a row boundary), so
    the +1 covering row for arbitrary starts is unnecessary — one fewer
    gathered row per term and a narrower emitted key block."""
    Q, M = rare_terms.shape
    cap = per_term_cap
    R = (cap + 127) // 128 + (0 if aligned else 1)
    safe = jnp.maximum(rare_terms, 0)
    o = offsets[safe].astype(jnp.int32)
    dfq = (offsets[safe + 1] - offsets[safe]).astype(jnp.int32)
    eff = jnp.where(rare_terms >= 0, jnp.minimum(dfq, cap), 0)
    r0 = o >> 7
    rr = jax.lax.broadcasted_iota(jnp.int32, (Q, M, R), 2)
    rows = r0[:, :, None] + rr
    p_rows = packed_rows[rows]  # [Q, M, R, 128]
    d = (p_rows & 0xFFFFFF).astype(jnp.uint32)
    code = jax.lax.shift_right_logical(p_rows, 24).astype(jnp.uint32)
    if reencode:
        cf = code.astype(jnp.float32)
        re = jnp.clip(jnp.round(
            (lo_src + (cf - 1.0) * step_src - lo_dst) / step_dst) + 1.0,
            1.0, 255.0)
        code = jnp.where(code > 0, re.astype(jnp.uint32), code)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, M, R, 128), 3)
    g = rows[..., None] * 128 + lane
    in_win = (g >= o[:, :, None, None]) & (g < (o + eff)[:, :, None, None])
    keys = jnp.where(in_win, (d << 8) | code, jnp.uint32(0xFFFFFFFF))
    return keys.reshape(Q, -1)


def gather_pruned_candidates(
    rare_terms: jnp.ndarray,  # [Q, M] int32 pass-1 term ids (-1 pad)
    offsets: jnp.ndarray,  # [V+1] int32 CSR element offsets
    packed_rows: jnp.ndarray,  # [NR, 128] int32 (code8 << 24) | doc_id
    per_term_cap: int,
    imp_lo: float | jnp.ndarray,
    imp_step: float | jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pass-1 candidate gather: each rare term's capped posting window as
    (cand_doc [Q, P], cand_imp [Q, P]) with -1 pads. The two-operand
    companion of :func:`gather_pruned_candidate_keys`, kept for
    :func:`bm25_pruned_topk` callers; multi-field engines can pool
    candidates from several CSRs (ES bool.should finds a doc through ANY
    matching field, generate_data.py:52-55 — text-only candidate
    generation would miss docs reachable only via their title)."""
    Q, M = rare_terms.shape
    cap = per_term_cap
    R = (cap + 127) // 128 + 1  # +1 row covers any off%128 misalignment
    safe = jnp.maximum(rare_terms, 0)
    o = offsets[safe].astype(jnp.int32)  # [Q, M]
    dfq = (offsets[safe + 1] - offsets[safe]).astype(jnp.int32)
    eff = jnp.where(rare_terms >= 0, jnp.minimum(dfq, cap), 0)
    r0 = o >> 7
    rr = jax.lax.broadcasted_iota(jnp.int32, (Q, M, R), 2)
    rows = r0[:, :, None] + rr  # [Q, M, R]
    p_rows = packed_rows[rows]  # [Q, M, R, 128] — ONE gather
    d_rows = p_rows & 0xFFFFFF
    code = jax.lax.shift_right_logical(p_rows, 24).astype(jnp.float32)
    i_rows = jnp.where(
        code > 0, jnp.exp(imp_lo + (code - 1.0) * imp_step), 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q, M, R, 128), 3)
    g = rows[..., None] * 128 + lane  # global element index
    valid = (g >= o[:, :, None, None]) & (g < (o + eff)[:, :, None, None])
    cand_doc = jnp.where(valid, d_rows, -1).reshape(Q, -1)
    cand_imp = jnp.where(valid, i_rows, 0.0).reshape(Q, -1)
    return cand_doc, cand_imp
