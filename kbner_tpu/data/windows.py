"""Sliding-window handling for over-budget sentences.

The reference embeds long sentences in overlapping subtoken windows and
stitches hidden states mid-overlap (``embeddings.py:3202-3227,3292-3299``).
Here the same policy is applied at the data level, which keeps device shapes
static: a long sentence is split into overlapping *word* chunks sized by
their subtoken length; each chunk is tagged independently; predictions are
stitched taking each side's half of the overlap — equivalent seam placement
to the reference's ``stride//2`` hidden-state stitch.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .conll import SentenceRecord
from .subword import SubwordTokenizer


def split_long_record(
    rec: SentenceRecord,
    tokenizer: SubwordTokenizer,
    max_subtokens: int = 510,
    stride_words: int = 16,
) -> List[Tuple[SentenceRecord, int]]:
    """Split one record into overlapping (chunk, word_offset) pieces.

    Chunks cover the sentence with ``stride_words`` words of overlap; each
    chunk fits the subtoken budget. Short sentences return [(rec, 0)].
    """
    lens = [len(tokenizer.encode_word(w)) for w in rec.tokens]
    if sum(lens) + 2 <= max_subtokens:
        return [(rec, 0)]

    chunks: List[Tuple[SentenceRecord, int]] = []
    start = 0
    n = len(rec.tokens)
    while start < n:
        used = 2  # CLS/SEP
        end = start
        while end < n and used + lens[end] <= max_subtokens:
            used += lens[end]
            end += 1
        if end == start:  # single pathological word
            end = start + 1
        chunk = SentenceRecord(
            tokens=rec.tokens[start:end],
            tags={k: v[start:end] for k, v in rec.tags.items()},
            doc_id=rec.doc_id, lang_id=rec.lang_id, comment=rec.comment)
        chunks.append((chunk, start))
        if end >= n:
            break
        start = max(end - stride_words, start + 1)
    return chunks


def stitch_window_predictions(
    pieces: Sequence[Tuple[Sequence[str], int, int]],
    total_len: int,
) -> List[str]:
    """Merge per-chunk predictions back to one sentence.

    ``pieces`` are (tags, word_offset, chunk_len) in order. In overlaps, the
    left chunk supplies the first half and the right chunk the second half
    (the reference drops stride//2 at each side of the seam).
    """
    out: List[str] = ["O"] * total_len
    prev_end = 0
    for idx, (tags, off, clen) in enumerate(pieces):
        begin = off
        if idx > 0 and off < prev_end:
            overlap = prev_end - off
            begin = off + overlap // 2
        for w in range(begin, off + clen):
            out[w] = tags[w - off]
        prev_end = off + clen
    return out


def predict_long(
    trainer,
    records: Sequence[SentenceRecord],
    max_subtokens: int = 510,
    stride_words: int = 16,
    batch_size: int = 32,
) -> List[List[str]]:
    """Window-split prediction wrapper around ``trainer.predict``."""
    all_chunks: List[SentenceRecord] = []
    layout: List[List[Tuple[int, int, int]]] = []  # per record: chunk info
    for rec in records:
        pieces = split_long_record(
            rec, trainer.tokenizer, max_subtokens, stride_words)
        entry = []
        for chunk, off in pieces:
            entry.append((len(all_chunks), off, len(chunk.tokens)))
            all_chunks.append(chunk)
        layout.append(entry)
    preds = trainer.predict(all_chunks, batch_size)
    out: List[List[str]] = []
    for rec, entry in zip(records, layout):
        pieces = [(preds[ci], off, clen) for ci, off, clen in entry]
        out.append(stitch_window_predictions(pieces, len(rec.tokens)))
    return out
