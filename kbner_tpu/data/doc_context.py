"""Document-window context (the reference's ``v2_doc`` mode).

Reimplements ``add_document_embeddings_v2``
(``/root/reference/flair/embeddings.py:3657-3790``): each sentence is
embedded inside a window over its document — left and right neighbor
sentences are added until the subtoken budget is reached, keeping the
target sentence centered (left/right balancing, ``:3744-3761``).

Design: this is a *data* transform, not a model change. The window
neighbors are appended as plain tokens tagged ``S-X`` (left context before,
right context after), which routes them through the existing X-mask
machinery: they shape the transformer's attention but are excluded from the
CRF and from evaluation — exactly the v2_doc semantics. The returned offset
maps target-sentence word w to position ``offset + w`` of the windowed
record.

Document grouping follows the reference: ``-DOCSTART-`` separators or comment
ids populate ``SentenceRecord.doc_id`` (``assign_documents``,
distillation_trainer.py:655-674).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

from .conll import SentenceRecord
from .subword import SubwordTokenizer, subtoken_length

X_TAG = "S-X"


def make_doc_context_records(
    records: Sequence[SentenceRecord],
    tokenizer: SubwordTokenizer,
    budget: int = 510,
    tag_layer: str = "ner",
) -> Tuple[List[SentenceRecord], List[int]]:
    """Returns (windowed records, per-record word offsets of the target
    sentence inside its window)."""
    by_doc: Dict[int, List[int]] = defaultdict(list)
    for i, rec in enumerate(records):
        by_doc[rec.doc_id].append(i)

    lengths = [subtoken_length(tokenizer, r.tokens) for r in records]
    out: List[SentenceRecord] = [None] * len(records)  # type: ignore
    offsets: List[int] = [0] * len(records)

    for doc_id, idxs in by_doc.items():
        for pos, i in enumerate(idxs):
            rec = records[i]
            used = lengths[i]
            left: List[int] = []
            right: List[int] = []
            li, ri = pos - 1, pos + 1
            # alternate extending left/right while the budget allows,
            # starting left (the reference balances both sides)
            while used < budget and (li >= 0 or ri < len(idxs)):
                extended = False
                if li >= 0:
                    cand = lengths[idxs[li]]
                    if used + cand <= budget:
                        left.insert(0, idxs[li])
                        used += cand
                        extended = True
                    li -= 1
                if ri < len(idxs):
                    cand = lengths[idxs[ri]]
                    if used + cand <= budget:
                        right.append(idxs[ri])
                        used += cand
                        extended = True
                    ri += 1
                if not extended:
                    break

            left_tokens = [t for j in left for t in records[j].tokens]
            right_tokens = [t for j in right for t in records[j].tokens]
            tokens = left_tokens + list(rec.tokens) + right_tokens
            tags = {}
            for layer, layer_tags in rec.tags.items():
                tags[layer] = ([X_TAG] * len(left_tokens) + list(layer_tags)
                               + [X_TAG] * len(right_tokens))
            if tag_layer not in tags:
                tags[tag_layer] = ([X_TAG] * len(left_tokens)
                                   + ["O"] * len(rec.tokens)
                                   + [X_TAG] * len(right_tokens))
            out[i] = SentenceRecord(
                tokens=tokens, tags=tags, doc_id=rec.doc_id,
                lang_id=rec.lang_id, comment=rec.comment)
            offsets[i] = len(left_tokens)
    return out, offsets


def strip_doc_context(
    preds: Sequence[Sequence[str]],
    originals: Sequence[SentenceRecord],
    offsets: Sequence[int],
) -> List[List[str]]:
    """Slice windowed predictions back to the original sentences."""
    out = []
    for pred, rec, off in zip(preds, originals, offsets):
        out.append(list(pred[off:off + len(rec.tokens)]))
    return out
