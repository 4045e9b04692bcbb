"""Sentence records -> padded device arrays.

This is the boundary between the host-side object world and the array world:
everything downstream of here is static-shaped JAX. Replaces the reference's
per-token ``_embeddings`` dicts and batch-level ``features`` caches
(``embeddings.py:61-124``) with explicit arrays:

  input_ids [B, S]       subtoken ids incl CLS/SEP
  attention_mask [B, S]  1 for real subtokens
  word_starts [B, W]     subtoken index of each word's first subtoken
  word_mask [B, W]       1 for real words
  tag_ids [B, W]         gold tag indices (pad: 0)
  crf_mask [B, W]        word_mask minus retrieved-context (X) positions --
                         drives transition-skip masking in the CRF, the
                         static-shape equivalent of the reference's remove_x
                         compaction (sequence_tagger_model.py:2448-2506)
  lang_ids [B]           source-corpus id (per-language CRF variants)

The ``<EOS>`` context separator word is encoded as the tokenizer's real SEP
token, mirroring the reference's placeholder swap (embeddings.py:3139-3165).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from .conll import EOS_MARKER, SentenceRecord
from .dictionary import Dictionary
from .subword import SubwordTokenizer


@dataclasses.dataclass
class EncodedBatch:
    input_ids: np.ndarray
    attention_mask: np.ndarray
    word_starts: np.ndarray
    word_mask: np.ndarray
    tag_ids: np.ndarray
    crf_mask: np.ndarray
    lang_ids: np.ndarray
    records: Optional[List[SentenceRecord]] = None
    # classic-embedding inputs (word_ids, char_ids, char_stream, ...) added
    # by add_classic_features for the non-transformer embedder families
    extra: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def num_sentences(self) -> int:
        return self.input_ids.shape[0]

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {
            "input_ids": self.input_ids,
            "attention_mask": self.attention_mask,
            "word_starts": self.word_starts,
            "word_mask": self.word_mask,
            "tag_ids": self.tag_ids,
            "crf_mask": self.crf_mask,
            "lang_ids": self.lang_ids,
        }
        out.update(self.extra)
        return out


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def encode_batch(
    records: Sequence[SentenceRecord],
    tokenizer: SubwordTokenizer,
    tag_dict: Optional[Dictionary] = None,
    tag_layer: str = "ner",
    max_subtokens: int = 512,
    subtoken_bucket: int = 16,
    word_bucket: int = 8,
    x_tag: str = "S-X",
    keep_records: bool = True,
) -> EncodedBatch:
    """Encode a list of sentences into one padded batch.

    Sequences longer than ``max_subtokens`` are truncated at a word boundary
    (training drops over-budget sentences upstream; the KB pipeline enforces a
    510-subtoken budget at data-generation time, context_process.py:974).
    """
    B = len(records)
    per_sentence = []
    for rec in records:
        sub_ids: List[int] = [tokenizer.cls_id]
        starts: List[int] = []
        n_words = 0
        for word in rec.tokens:
            ids = ([tokenizer.sep_id] if word == EOS_MARKER
                   else tokenizer.encode_word(word))
            if len(sub_ids) + len(ids) + 1 > max_subtokens:
                break
            starts.append(len(sub_ids))
            sub_ids.extend(ids)
            n_words += 1
        sub_ids.append(tokenizer.sep_id)
        per_sentence.append((sub_ids, starts, n_words))

    S = round_up(max(len(s[0]) for s in per_sentence), subtoken_bucket)
    W = round_up(max(s[2] for s in per_sentence), word_bucket)
    S = min(S, max_subtokens)

    input_ids = np.full((B, S), tokenizer.pad_id, dtype=np.int32)
    attention_mask = np.zeros((B, S), dtype=np.int32)
    word_starts = np.zeros((B, W), dtype=np.int32)
    word_mask = np.zeros((B, W), dtype=np.int32)
    tag_ids = np.zeros((B, W), dtype=np.int32)
    crf_mask = np.zeros((B, W), dtype=np.int32)
    lang_ids = np.zeros((B,), dtype=np.int32)

    for b, (rec, (sub_ids, starts, n_words)) in enumerate(zip(records, per_sentence)):
        L = len(sub_ids)
        input_ids[b, :L] = sub_ids
        attention_mask[b, :L] = 1
        word_starts[b, :n_words] = starts
        word_mask[b, :n_words] = 1
        lang_ids[b] = rec.lang_id
        tags = rec.tags.get(tag_layer)
        # Everything from <EOS> onward is retrieved context: masked from the
        # CRF whether or not gold tags are present (unlabeled prediction).
        eos = rec.eos_index
        for w in range(n_words):
            is_x = (tags is not None and w < len(tags) and tags[w] == x_tag) \
                or (eos >= 0 and w >= eos)
            crf_mask[b, w] = 0 if is_x else 1
            if tag_dict is not None and tags is not None and w < len(tags):
                if is_x:
                    # masked positions never reach the loss; tolerate tags
                    # missing from the dictionary (e.g. S-X when the tagset
                    # was built on context-free data)
                    tag_ids[b, w] = tag_dict.item2idx.get(tags[w], 0)
                else:
                    tag_ids[b, w] = tag_dict.get_idx_for_item(tags[w])

    return EncodedBatch(
        input_ids=input_ids,
        attention_mask=attention_mask,
        word_starts=word_starts,
        word_mask=word_mask,
        tag_ids=tag_ids,
        crf_mask=crf_mask,
        lang_ids=lang_ids,
        records=list(records) if keep_records else None,
    )


def kmeans(x: Sequence[int], k: int, seed: int = 0):
    """Frequency-weighted 1-D k-means over sentence lengths.

    The parser data loader's length bucketing
    (``/root/reference/flair/parser/utils/alg.py:10-47`` via
    ``utils/data.py:48``): Lloyd iterations run on the DISTINCT values
    weighted by their frequency (exact and fast for 1-D), and an empty
    cluster is reseeded with the farthest datapoint of the biggest
    cluster. Returns ``(centroids, clusters)`` where ``clusters[i]``
    lists the indices of datapoints assigned to centroid i; empty
    clusters are dropped (reference: ``y.unique()``).
    """
    x = np.asarray(x, dtype=np.float64)
    d, indices, f = np.unique(x, return_inverse=True, return_counts=True)
    if len(d) < k:
        raise ValueError(
            f"unable to assign {len(d)} datapoints to {k} clusters")
    total = d * f
    rng = np.random.RandomState(seed)
    c = d[rng.permutation(len(d))[:k]]
    old = None
    dists = np.abs(d[:, None] - c[None, :])
    y = dists.argmin(axis=1)
    dmin = dists.min(axis=1)
    while old is None or not np.array_equal(c, old):
        for i in range(k):
            if not np.any(y == i):
                mask = y[None, :] == np.arange(k)[:, None]
                biggest = np.nonzero(mask[mask.sum(axis=1).argmax()])[0]
                farthest = dmin[biggest].argmax()
                y[biggest[farthest]] = i
        mask = y[None, :] == np.arange(k)[:, None]  # [k, |d|]
        old = c
        c = (total[None, :] * mask).sum(axis=1) / (f[None, :] * mask).sum(
            axis=1)
        dists = np.abs(d[:, None] - c[None, :])
        y = dists.argmin(axis=1)
        dmin = dists.min(axis=1)
    y = y[indices]
    assigned = np.unique(y)
    centroids = c[assigned].tolist()
    clusters = [np.nonzero(y == i)[0].tolist() for i in assigned]
    return centroids, clusters


def make_batches(
    records: Sequence[SentenceRecord],
    tokenizer: SubwordTokenizer,
    tag_dict: Optional[Dictionary],
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    sort_by_length: bool = True,
    token_budget: int = 0,
    n_buckets: int = 0,
    **encode_kwargs,
) -> List[EncodedBatch]:
    """Length-sorted fixed-size batching.

    Mirrors ``ColumnDataLoader``'s subtoken-length sort + sentence-level
    batching (``custom_data_loader.py:82-122``): sorting keeps pad waste and
    shape-bucket churn low; shuffling permutes whole batches, preserving the
    within-batch homogeneity.
    """
    from .subword import subtoken_length

    order = list(range(len(records)))
    lengths = None
    if sort_by_length or token_budget or n_buckets:
        lengths = [subtoken_length(tokenizer, r.tokens) for r in records]
    if n_buckets:
        # kmeans length buckets (parser loader, utils/data.py:48): batches
        # are drawn within a bucket so padded shapes cluster tightly; a
        # token_budget caps the summed subtokens of each in-bucket batch
        # (it used to be silently ignored here)
        _, clusters = kmeans(lengths, min(n_buckets, len(set(lengths))),
                             seed=seed)
        chunks = []
        for cluster in clusters:
            cur, cur_tokens = [], 0
            for i in cluster:
                n = lengths[i] + 2
                if cur and (len(cur) >= batch_size or (
                        token_budget and cur_tokens + n > token_budget)):
                    chunks.append(cur)
                    cur, cur_tokens = [], 0
                cur.append(i)
                cur_tokens += n
            if cur:
                chunks.append(cur)
        if shuffle:
            np.random.RandomState(seed).shuffle(chunks)
        return [
            encode_batch([records[i] for i in chunk], tokenizer, tag_dict,
                         **encode_kwargs)
            for chunk in chunks
        ]
    if sort_by_length:
        order.sort(key=lambda i: lengths[i])
    if token_budget:
        # budget batching: group sentences until the summed subtoken count
        # would exceed the budget (ColumnDataLoader's token-budget mode,
        # custom_data_loader.py:118-149)
        chunks, cur, cur_tokens = [], [], 0
        for i in order:
            n = lengths[i] + 2
            if cur and cur_tokens + n > token_budget:
                chunks.append(cur)
                cur, cur_tokens = [], 0
            cur.append(i)
            cur_tokens += n
        if cur:
            chunks.append(cur)
    else:
        chunks = [order[i:i + batch_size]
                  for i in range(0, len(order), batch_size)]
    if shuffle:
        rng = np.random.RandomState(seed)
        rng.shuffle(chunks)
    return [
        encode_batch([records[i] for i in chunk], tokenizer, tag_dict,
                     **encode_kwargs)
        for chunk in chunks
    ]


def build_word_vocab(records: Sequence[SentenceRecord]) -> "Dictionary":
    """Token vocabulary over a corpus (index 0 = <unk>), for WordEmbedder."""
    from .dictionary import Dictionary

    vocab = Dictionary(add_unk=True)
    for rec in records:
        for tok in rec.tokens:
            vocab.add_item(tok)
    return vocab


def build_char_vocab(records: Sequence[SentenceRecord]) -> "Dictionary":
    """Character vocabulary (index 0 = <unk>, includes ' ' separator)."""
    from .dictionary import Dictionary

    vocab = Dictionary(add_unk=True)
    vocab.add_item(" ")
    for rec in records:
        for tok in rec.tokens:
            for ch in tok:
                vocab.add_item(ch)
    return vocab


# allennlp ELMoCharacterMapper constants (raw file ids, no +1 shift):
# utf-8 bytes 0-255, BOW=258, EOW=259, padding=260 — the char encoding
# real elmo_*_weights.hdf5 char tables were trained against
ELMO_BOW, ELMO_EOW, ELMO_PAD = 258, 259, 260
ELMO_CHAR_VOCAB = 261
ELMO_MAX_CHARS = 50


def add_classic_features(
    eb: EncodedBatch,
    word_vocab=None,
    char_vocab=None,
    max_chars_per_word: int = 16,
    max_stream_chars: int = 1024,
    bpe_vocab=None,
    elmo_bytes: bool = False,
) -> EncodedBatch:
    """Attach word-id / char-id / char-stream arrays for the classic
    embedder families (word vectors, char-BiLSTM, Flair char-LM).

    The word axis matches the batch's existing [B, W] padding. The char
    stream is the space-joined sentence with per-word first/last char
    positions for Flair-style LM extraction (embeddings.py:2271-2553).

    ``elmo_bytes`` additionally emits ``elmo_char_ids``/``elmo_char_mask``
    [B, W, 50] in allennlp's ELMoCharacterMapper byte scheme (BOW + utf-8
    bytes + EOW, pad 260) — the encoding real ELMo weight files expect
    (reference wrapper embeddings.py:677-772).
    """
    if eb.records is None:
        raise ValueError("add_classic_features needs eb.records")
    B, W = eb.word_mask.shape

    if elmo_bytes:
        EC = ELMO_MAX_CHARS
        ids = np.full((B, W, EC), ELMO_PAD, dtype=np.int32)
        mask = np.zeros((B, W, EC), dtype=np.int32)
        for b, rec in enumerate(eb.records):
            for w, tok in enumerate(rec.tokens[:W]):
                row = ([ELMO_BOW] + list(tok.encode("utf-8"))[: EC - 2]
                       + [ELMO_EOW])
                ids[b, w, : len(row)] = row
                mask[b, w, : len(row)] = 1
        eb.extra["elmo_char_ids"] = ids
        eb.extra["elmo_char_mask"] = mask

    if word_vocab is not None:
        word_ids = np.zeros((B, W), dtype=np.int32)
        for b, rec in enumerate(eb.records):
            for w, tok in enumerate(rec.tokens[:W]):
                word_ids[b, w] = word_vocab.item2idx.get(tok, 0)
        eb.extra["word_ids"] = word_ids

    if char_vocab is not None:
        C = max_chars_per_word
        char_ids = np.zeros((B, W, C), dtype=np.int32)
        char_mask = np.zeros((B, W, C), dtype=np.int32)
        # sentence char stream + word boundaries
        stream_len = 0
        streams = []
        bounds = []
        for rec in eb.records:
            chars: List[int] = []
            starts, ends = [], []
            for w, tok in enumerate(rec.tokens[:W]):
                if w > 0:
                    chars.append(char_vocab.item2idx.get(" ", 0))
                starts.append(len(chars))
                for ch in tok:
                    chars.append(char_vocab.item2idx.get(ch, 0))
                ends.append(max(len(chars) - 1, 0))
            chars = chars[:max_stream_chars]
            streams.append(chars)
            bounds.append((starts, ends))
            stream_len = max(stream_len, len(chars))
        T = round_up(max(stream_len, 1), 32)
        T = min(T, max_stream_chars)
        char_stream = np.zeros((B, T), dtype=np.int32)
        char_stream_mask = np.zeros((B, T), dtype=np.int32)
        word_char_starts = np.zeros((B, W), dtype=np.int32)
        word_char_ends = np.zeros((B, W), dtype=np.int32)
        for b, (rec, chars, (starts, ends)) in enumerate(
                zip(eb.records, streams, bounds)):
            char_stream[b, : len(chars)] = chars
            char_stream_mask[b, : len(chars)] = 1
            for w, tok in enumerate(rec.tokens[:W]):
                word_char_starts[b, w] = min(starts[w], T - 1)
                word_char_ends[b, w] = min(ends[w], T - 1)
                for c, ch in enumerate(tok[:C]):
                    char_ids[b, w, c] = char_vocab.item2idx.get(ch, 0)
                    char_mask[b, w, c] = 1
        eb.extra["char_ids"] = char_ids
        eb.extra["char_mask"] = char_mask
        eb.extra["char_stream"] = char_stream
        eb.extra["char_stream_mask"] = char_stream_mask
        eb.extra["word_char_starts"] = word_char_starts
        eb.extra["word_char_ends"] = word_char_ends

    if bpe_vocab is not None:
        first, last = bpe_vocab.encode_first_last(eb)
        eb.extra["bpe_first_ids"] = first
        eb.extra["bpe_last_ids"] = last
    return eb
