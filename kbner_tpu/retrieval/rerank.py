"""Context reranking (reference ``tools/bert_scoring.py``).

The reference optionally reranks retrieved contexts by BERTScore or
normalized edit distance before fusion. BERTScore needs a pretrained model;
the edit-distance reranker is self-contained and implemented here, plus a
hook for any embedding-similarity scorer.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

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


def split_corpus(records: Sequence, n_parts: int) -> List[List]:
    """Even corpus splitting (reference ``tools/split.py``)."""
    parts: List[List] = [[] for _ in range(n_parts)]
    for i, rec in enumerate(records):
        parts[i % n_parts].append(rec)
    return parts
