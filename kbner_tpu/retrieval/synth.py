"""Synthetic wiki-statistics corpora for collection-scale benchmarks.

The baseline target is English-Wikipedia scale (``BASELINE.md``: >= 10k
queries/s at >= 99% recall@10). Real dumps aren't available in the
zero-egress environment, so benchmarks run on synthetic corpora that
reproduce the statistics BM25 pruning actually depends on:

  - Zipf(s~1.07) term distribution over a wiki-sized vocabulary (~1M
    distinct terms for a few million sentences): sentence queries then
    contain genuinely rare terms, which is what makes the reference's
    top-10 (and MaxScore-style pruning) work on real text,
  - log-normal sentence lengths (the ``text`` field the reference indexes
    is sentence-granular, ``kb/build_kb.py:24-36``), so document norms and
    impact magnitudes vary like real text,
  - queries are corpus sentences (the reference's v3 query IS the raw
    sentence, ``kb/generate_data.py:33-68``) plus held-out sentences.

Everything is term-id space: analysis is not the system under test, and
``BM25Index.build_encoded`` consumes ids directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def zipf_cdf(vocab: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    w = ranks ** (-s)
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    return cdf


def synth_wiki_docs(
    n_docs: int,
    vocab: int = 1_000_000,
    zipf_s: float = 1.07,
    mean_len: int = 22,
    sigma: float = 0.45,
    min_len: int = 4,
    max_len: int = 64,
    seed: int = 0,
    n_topics: Optional[int] = None,
    entity_frac: float = 0.3,
    entities_per_topic: int = 32,
) -> np.ndarray:
    """[N, max_len] int32 term ids, pad -1 — sentence-like synthetic docs.

    With ``n_topics`` set, docs are TOPICAL: each doc belongs to a topic
    (a wiki page) whose ``entities_per_topic`` rare "entity" terms (names,
    places — drawn from the vocab tail) make up ``entity_frac`` of its
    tokens; the rest is the global Zipf background. This is the structure
    real BM25 sentence retrieval exploits — sentences about the same page
    share rare entity mentions (the reference's example query finds the
    "Bic Runga" page via the rare terms, ``README.md:262-271``) — and it is
    what makes top-k pruning sound on real text. An iid-Zipf corpus
    (``n_topics=None``) has no such structure and is adversarial for ANY
    dynamic-pruning engine (Lucene's WAND/MaxScore included): top-10 there
    is a diffuse sum over mid-frequency terms.
    """
    rng = np.random.RandomState(seed)
    lens = np.clip(
        rng.lognormal(np.log(mean_len), sigma, n_docs), min_len, max_len
    ).astype(np.int64)
    total = int(lens.sum())
    cdf = zipf_cdf(vocab, zipf_s)
    # inverse-CDF sampling in one vectorized pass
    terms = np.searchsorted(cdf, rng.random_sample(total)).astype(np.int32)
    if n_topics:
        # per-topic entity vocabularies from the rare tail
        tail_lo = vocab // 10
        ent_vocab = rng.randint(
            tail_lo, vocab, size=(n_topics, entities_per_topic)
        ).astype(np.int32)
        doc_topic = rng.randint(0, n_topics, size=n_docs)
        tok_topic = np.repeat(doc_topic, lens)
        is_ent = rng.random_sample(total) < entity_frac
        ent_slot = rng.randint(0, entities_per_topic, size=total)
        terms = np.where(is_ent, ent_vocab[tok_topic, ent_slot], terms)
    tok = np.full((n_docs, max_len), -1, dtype=np.int32)
    row = np.repeat(np.arange(n_docs), lens)
    offs = np.cumsum(lens) - lens
    col = np.arange(total) - np.repeat(offs, lens)
    tok[row, col] = terms
    return tok


def sentence_queries(
    docs: np.ndarray, n_queries: int, q_len: int, seed: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sentence queries = corpus rows (v3 retrieval semantics), padded to
    [Q, q_len] with -1; returns (query term ids, source doc ids)."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, docs.shape[0], size=n_queries)
    q = np.full((n_queries, q_len), -1, dtype=np.int32)
    width = min(q_len, docs.shape[1])
    q[:, :width] = docs[ids, :width]
    return q, ids
