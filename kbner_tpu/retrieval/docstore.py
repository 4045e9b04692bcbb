"""Packed, mmap-backed document store — the random-access KB payload DB.

The reference keeps document payloads in two native stores: the
wikipedia2vec LMDB DumpDB during parsing (``kb/dumps/convert_db.sh``,
consumed at ``kb/parse_text.py:34``) and Elasticsearch ``_source``
storage at serving time (``paragraph`` is stored-not-indexed,
``kb/build_kb.py:29-31``). The in-memory :class:`~.engine.DocStore`
(Python string lists) fills that role for tests, but at wiki scale
(4M+ sentence docs) it costs gigabytes of host RAM per process and
seconds of (de)serialization.

:class:`PackedDocStore` is the production replacement: one file holding
every field of every document as a single UTF-8 blob plus a uint64
offset table, opened with ``mmap`` so lookups are page-cache reads with
zero per-process resident cost and O(1) startup. Layout::

    magic  b"KBDS1\\n"
    blob   UTF-8 bytes of all field values, concatenated in doc-major,
           field-minor order (doc0.sentence, doc0.paragraph, ...)
    offs   uint64[n_docs * n_fields + 1] little-endian cumulative offsets
           into blob (absolute file positions)
    footer 24 bytes: uint64 n_docs, uint64 n_fields, uint64 offs_pos

The writer streams: payload bytes go straight to disk while only the
offset table (32 B/doc) stays in memory, so building the store for a
full dump needs constant document memory. Doc ids are assignment order
and match the ``BM25Index`` built from the same record stream.
"""

from __future__ import annotations

import mmap
from pathlib import Path
from typing import Iterable, Iterator, List, Tuple, Union

import numpy as np

from .engine import DocStore, RetrievedDoc

_MAGIC = b"KBDS1\n"
FIELDS = ("sentence", "paragraph", "title", "url")
_FOOTER = np.dtype("<u8").itemsize * 3


class PackedDocStoreWriter:
    """Streaming builder: ``add()`` documents, then ``close()``."""

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "wb")
        self._f.write(_MAGIC)
        self._pos = len(_MAGIC)
        self._offsets: List[int] = [self._pos]
        self._closed = False

    def add(self, sentence: str, paragraph: str = "", title: str = "",
            url: str = "") -> int:
        """Append one document; returns its doc id."""
        doc_id = (len(self._offsets) - 1) // len(FIELDS)
        for val in (sentence, paragraph, title, url):
            b = val.encode("utf-8")
            self._f.write(b)
            self._pos += len(b)
            self._offsets.append(self._pos)
        return doc_id

    def __len__(self) -> int:
        return (len(self._offsets) - 1) // len(FIELDS)

    def close(self) -> None:
        if self._closed:
            return
        offs = np.asarray(self._offsets, dtype="<u8")
        offs_pos = self._pos
        self._f.write(offs.tobytes())
        footer = np.asarray([len(self), len(FIELDS), offs_pos], dtype="<u8")
        self._f.write(footer.tobytes())
        self._f.close()
        self._closed = True

    def __enter__(self) -> "PackedDocStoreWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class PackedDocStore:
    """Read side: mmap the file, decode fields on demand.

    API-compatible with :class:`~.engine.DocStore` (``materialize``,
    ``sentences``-style field access via :meth:`get`/:meth:`field`).
    """

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        self._file = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        if self._mm[:len(_MAGIC)] != _MAGIC:
            raise ValueError(f"{path} is not a packed doc store")
        n_docs, n_fields, offs_pos = np.frombuffer(
            self._mm[-_FOOTER:], dtype="<u8")
        if int(n_fields) != len(FIELDS):
            raise ValueError(
                f"field count {n_fields} != {len(FIELDS)}; file from a "
                "different schema version")
        self.n_docs = int(n_docs)
        count = self.n_docs * len(FIELDS) + 1
        self._offs = np.frombuffer(
            self._mm, dtype="<u8", count=count, offset=int(offs_pos))

    @classmethod
    def build(cls, path: Union[str, Path],
              records: Iterable[Union[Tuple[str, str, str, str], dict]]
              ) -> "PackedDocStore":
        """Build from (sentence, paragraph, title, url) tuples or dicts
        with those keys (the parse_text JSONL schema)."""
        with PackedDocStoreWriter(path) as w:
            for r in records:
                if isinstance(r, dict):
                    w.add(r.get("sentence", ""), r.get("paragraph", ""),
                          r.get("title", ""), r.get("url", ""))
                else:
                    w.add(*r)
        return cls(path)

    @classmethod
    def from_store(cls, path: Union[str, Path],
                   store: DocStore) -> "PackedDocStore":
        def rows():
            n = len(store.sentences)
            for i in range(n):
                def g(lst):
                    return lst[i] if lst is not None and i < len(lst) else ""
                yield (store.sentences[i], g(store.paragraphs),
                       g(store.titles), g(store.urls))
        return cls.build(path, rows())

    def __len__(self) -> int:
        return self.n_docs

    def get(self, doc_id: int, field: str) -> str:
        if not 0 <= doc_id < self.n_docs:
            raise IndexError(f"doc id {doc_id} out of range [0, {self.n_docs})")
        j = doc_id * len(FIELDS) + FIELDS.index(field)
        lo, hi = int(self._offs[j]), int(self._offs[j + 1])
        return self._mm[lo:hi].decode("utf-8")

    def field(self, field: str) -> Iterator[str]:
        """Stream one field over all docs (index rebuilds, audits)."""
        for i in range(self.n_docs):
            yield self.get(i, field)

    def materialize(self, doc_id: int, score: float) -> RetrievedDoc:
        if not 0 <= doc_id < self.n_docs:
            return RetrievedDoc(doc_id=doc_id, score=score, sentence="",
                                paragraph="", title="", url="")
        return RetrievedDoc(
            doc_id=doc_id, score=score,
            sentence=self.get(doc_id, "sentence"),
            paragraph=self.get(doc_id, "paragraph"),
            title=self.get(doc_id, "title"),
            url=self.get(doc_id, "url"),
        )

    def close(self) -> None:
        self._offs = None  # release the buffer export before mmap.close
        self._mm.close()
        self._file.close()

    def __enter__(self) -> "PackedDocStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
