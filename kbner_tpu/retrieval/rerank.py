"""Context reranking (reference ``tools/bert_scoring.py``).

The reference optionally reranks retrieved contexts by BERTScore or
normalized edit distance before fusion. Both modes are implemented:
edit distance is self-contained; BERTScore runs natively on device from
any token-embedding function (e.g. the framework's XLM-R encoder with
locally imported weights) — greedy max-similarity matching of the
`bert-score` method, batched over the k candidate contexts in ONE
forward, instead of shelling out to the torch package.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

from .engine import RetrievedDoc


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance, O(len(a) * len(b)) with two rows."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalized_edit_similarity(a: str, b: str) -> float:
    """1 - dist/max_len in [0, 1]; 1.0 = identical."""
    if not a and not b:
        return 1.0
    return 1.0 - edit_distance(a, b) / max(len(a), len(b))


def rerank_by_edit_distance(
    query: str,
    docs: Sequence[RetrievedDoc],
) -> List[RetrievedDoc]:
    """Reorder retrieved contexts by edit similarity to the query
    (tools/bert_scoring.py's edit-distance mode)."""
    return sorted(
        docs,
        key=lambda d: -normalized_edit_similarity(query, d.sentence))


def rerank_with_scorer(
    query: str,
    docs: Sequence[RetrievedDoc],
    scorer: Callable[[str, str], float],
) -> List[RetrievedDoc]:
    """Generic reranking hook: scorer(query, sentence) -> similarity.
    Plug in an embedding-similarity scorer for the BERTScore-style mode."""
    return sorted(docs, key=lambda d: -scorer(query, d.sentence))


def bertscore_f1(q_emb, q_mask, d_emb, d_mask):
    """Batched BERTScore-F1 of one query against K candidates.

    ``q_emb`` [Lq, D], ``q_mask`` [Lq]; ``d_emb`` [K, Ld, D],
    ``d_mask`` [K, Ld]. Returns [K] f32. Greedy matching as in the
    BERTScore paper: recall = mean over query tokens of the best cosine
    similarity in the candidate, precision = the transpose, F1 their
    harmonic mean. One einsum + two masked max/mean reductions — XLA
    fuses the lot; no per-pair python.
    """
    import jax.numpy as jnp

    qn = q_emb / jnp.maximum(
        jnp.linalg.norm(q_emb, axis=-1, keepdims=True), 1e-9)
    dn = d_emb / jnp.maximum(
        jnp.linalg.norm(d_emb, axis=-1, keepdims=True), 1e-9)
    sim = jnp.einsum("qd,ksd->kqs", qn, dn)  # [K, Lq, Ld]
    pair = (q_mask[None, :, None] > 0) & (d_mask[:, None, :] > 0)
    neg = jnp.full_like(sim, -jnp.inf)
    sim = jnp.where(pair, sim, neg)
    n_q = jnp.sum(q_mask > 0)
    n_d = jnp.sum(d_mask > 0, axis=1)  # [K]
    best_q = jnp.max(sim, axis=2)  # [K, Lq] best match per query token
    best_d = jnp.max(sim, axis=1)  # [K, Ld]
    recall = jnp.sum(jnp.where(q_mask[None] > 0, best_q, 0.0),
                     axis=1) / jnp.maximum(n_q, 1)
    precision = jnp.sum(jnp.where(d_mask > 0, best_d, 0.0),
                        axis=1) / jnp.maximum(n_d, 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-9)
    # a pair with no valid tokens on either side scores 0, not nan/-inf
    # (the -inf masked sim never reaches the sums: its side's best_* is
    # only added where the OWN mask is live, so the guard below is the
    # single place empty rows are decided)
    return jnp.where((n_d > 0) & (n_q > 0), f1, 0.0)


def rerank_by_bertscore(
    encode_fn: Callable[[Sequence[str]], Tuple[np.ndarray, np.ndarray]],
    query: str,
    docs: Sequence[RetrievedDoc],
) -> List[RetrievedDoc]:
    """BERTScore reranking (``tools/bert_scoring.py`` bert mode).

    ``encode_fn(texts) -> (emb [B, S, D], mask [B, S])`` — any token
    embedder: the XLM-R encoder's hidden states, a classic embedder
    stack, or a hash projection in tests. The query and all k contexts
    embed in one batch; similarity and greedy matching run on device.
    """
    if not docs:
        return []
    emb, mask = encode_fn([query] + [d.sentence for d in docs])
    f1 = np.asarray(bertscore_f1(emb[0], mask[0], emb[1:], mask[1:]))
    order = np.argsort(-f1, kind="stable")
    return [docs[i] for i in order]


def split_corpus(records: Sequence, n_parts: int) -> List[List]:
    """Even corpus splitting (reference ``tools/split.py``)."""
    parts: List[List] = [[] for _ in range(n_parts)]
    for i, rec in enumerate(records):
        parts[i % n_parts].append(rec)
    return parts
