"""Subword tokenization interface with offline-safe fallback.

The reference runs the HF XLM-R tokenizer in its ingest hot loops
(``embeddings.py:3202-3227``, ``context_process.py:304``). We keep subword
tokenization on the host (it is I/O-bound string work, not device work) behind
a tiny protocol so that:

  - production uses a local HF/sentencepiece tokenizer (``HFTokenizer``),
  - tests and zero-egress environments use ``HashTokenizer``, a deterministic
    word-hash tokenizer that needs no model file.

Both produce per-word subtoken id lists; ``encode.py`` flattens them into
padded arrays with first-subtoken alignment (the reference's default pooling,
``embeddings.py:3318-3331``).
"""

from __future__ import annotations

import hashlib
from typing import List, Protocol, Sequence


class SubwordTokenizer(Protocol):
    cls_id: int
    sep_id: int
    pad_id: int
    vocab_size: int

    def encode_word(self, word: str) -> List[int]:
        """Subtoken ids for one word (no specials)."""
        ...


class HashTokenizer:
    """Deterministic fallback tokenizer: hashes words into a fixed vocab.

    Long words are split into 4-char pieces so that multi-subtoken alignment
    paths are exercised. Ids 0-3 are reserved: pad=0 (unused by RoBERTa
    convention but harmless), cls=1, sep=2, unk=3 — callers should prefer the
    attributes over the raw numbers.
    """

    def __init__(self, vocab_size: int = 1000, max_pieces: int = 3):
        self.vocab_size = vocab_size
        self.max_pieces = max_pieces
        self.cls_id = 0
        self.pad_id = 1
        self.sep_id = 2
        self.unk_id = 3
        self._reserved = 4

    def _hash(self, piece: str) -> int:
        h = int.from_bytes(
            hashlib.md5(piece.encode("utf-8")).digest()[:4], "little")
        return self._reserved + h % (self.vocab_size - self._reserved)

    def encode_word(self, word: str) -> List[int]:
        pieces = [word[i:i + 4] for i in range(0, len(word), 4)]
        pieces = pieces[: self.max_pieces] or [word]
        return [self._hash(p) for p in pieces]


class HFTokenizer:
    """Adapter over a locally saved HF tokenizer directory.

    Never passes a hub name: zero-egress environments must not attempt
    downloads. Use ``AutoTokenizer.save_pretrained`` artifacts on disk.
    """

    def __init__(self, tokenizer_dir: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(
            tokenizer_dir, local_files_only=True)
        self.cls_id = self._tok.cls_token_id
        self.sep_id = self._tok.sep_token_id
        self.pad_id = self._tok.pad_token_id
        self.vocab_size = len(self._tok)
        self._cache: dict = {}

    def encode_word(self, word: str) -> List[int]:
        ids = self._cache.get(word)
        if ids is None:
            # XLM-R sentencepiece treats a leading space as word boundary.
            ids = self._tok.encode(" " + word, add_special_tokens=False)
            if not ids:
                ids = [self._tok.unk_token_id]
            self._cache[word] = ids
        return ids


def subtoken_length(
    tokenizer: SubwordTokenizer, words: Sequence[str]
) -> int:
    """Total subtokens for a word sequence (used for length-bucketed batching,
    reference ``custom_data_loader.py:82-100``)."""
    return sum(len(tokenizer.encode_word(w)) for w in words)
