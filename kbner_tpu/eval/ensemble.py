"""Majority-voting ensemble over multiple systems' predictions.

Host-side reimplementation of ``/root/reference/ensemble_prediction.py``:
each system contributes its predicted spans per sentence; spans are counted
as votes keyed by (positions, label); spans with at least ``threshold``
votes (default half the number of systems, ``:497-513``) are selected
greedily by (votes, then span length) with overlap suppression
(``pred_ensemble`` ``:280-299,400-417``); the surviving spans are written
back as BIOES tags.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

from ..data.tag_schemes import get_spans

SpanKey = Tuple[int, int, str]  # (start, end, label)


def collect_votes(
    system_tags: Sequence[Sequence[str]],
    ignore_labels: Sequence[str] = ("X",),
) -> Dict[SpanKey, int]:
    """Votes per (start, end, label) span across systems for ONE sentence."""
    votes: Dict[SpanKey, int] = defaultdict(int)
    for tags in system_tags:
        for span in get_spans(tags, ignore_labels=ignore_labels):
            votes[(span.start, span.end, span.label)] += 1
    return votes


def select_spans(
    votes: Dict[SpanKey, int],
    threshold: float,
) -> List[SpanKey]:
    """Greedy overlap-free selection by (votes desc, length desc).

    Mirrors the reference's greedy span fill: higher-voted spans claim their
    token range first; later spans are dropped if any token is taken.
    """
    ranked = sorted(
        votes.items(),
        key=lambda kv: (-kv[1], -(kv[0][1] - kv[0][0]), kv[0][0]),
    )
    taken: set = set()
    chosen: List[SpanKey] = []
    for (start, end, label), n in ranked:
        if n < threshold:
            continue
        positions = range(start, end)
        if any(p in taken for p in positions):
            continue
        taken.update(positions)
        chosen.append((start, end, label))
    return sorted(chosen)


def spans_to_bioes(spans: Sequence[SpanKey], length: int) -> List[str]:
    tags = ["O"] * length
    for start, end, label in spans:
        if end - start == 1:
            tags[start] = f"S-{label}"
        else:
            tags[start] = f"B-{label}"
            for i in range(start + 1, end - 1):
                tags[i] = f"I-{label}"
            tags[end - 1] = f"E-{label}"
    return tags


def ensemble_predictions(
    all_system_tags: Sequence[Sequence[Sequence[str]]],
    threshold: Optional[float] = None,
    ignore_labels: Sequence[str] = ("X",),
) -> List[List[str]]:
    """Majority-vote ensemble.

    ``all_system_tags[s][i]`` = BIOES tags of sentence i from system s.
    ``threshold`` defaults to 0.5 x #systems (``ensemble_prediction.py:497``).
    Returns ensembled BIOES tags per sentence.
    """
    n_systems = len(all_system_tags)
    if n_systems == 0:
        return []
    if threshold is None:
        threshold = 0.5 * n_systems
    n_sentences = len(all_system_tags[0])
    out: List[List[str]] = []
    for i in range(n_sentences):
        per_system = [all_system_tags[s][i] for s in range(n_systems)]
        length = len(per_system[0])
        votes = collect_votes(per_system, ignore_labels)
        chosen = select_spans(votes, threshold)
        out.append(spans_to_bioes(chosen, length))
    return out
