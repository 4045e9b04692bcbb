"""KB retrieval pipeline: corpus-level query generation, retrieval-file
interop, and the iterative (v4) entity-retrieval loop.

Host-side orchestration mirroring ``/root/reference/kb/generate_data.py`` and
the dataset-emitting parts of ``context_process.py``; the device work happens
inside :class:`~kbner_tpu.retrieval.engine.RetrievalEngine`.

File format parity: the reference stores retrievals as a query line followed
by k result lines ``sentence \\t paragraph \\t title \\t score \\t url \\t
hits`` (``generate_data.py:137-144``, documented ``README.md:248-272``), so
artifacts are exchangeable between the two systems in either direction.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

from ..data.conll import SentenceRecord
from .engine import DocStore, RetrievalEngine, RetrievedDoc
from .fusion import extract_entities
from .index import BM25Index, BM25Params
from .analyzer import get_analyzer

_CJK_SPACE_RE = re.compile(
    r"(?<=[⺀-鿿가-힯豈-﫿]) "
    r"(?=[⺀-鿿가-힯豈-﫿])")


def clean_cjk_spaces(text: str) -> str:
    """Remove spaces between CJK characters (zh/mix query cleanup,
    ``generate_data.py:70-79``)."""
    prev = None
    while prev != text:
        prev = text
        text = _CJK_SPACE_RE.sub("", text)
    return text


def sentence_query(record: SentenceRecord, lang: str = "en") -> str:
    text = " ".join(record.original_tokens())
    if lang in ("zh", "mix"):
        text = clean_cjk_spaces(text)
    return text


def retrieve_for_records(
    engine: RetrievalEngine,
    records: Sequence[SentenceRecord],
    k: int = 10,
    lang: str = "en",
    with_entity: bool = False,
    entities: Optional[Sequence[Sequence[str]]] = None,
    tag_layer: str = "ner",
    batch_size: int = 1024,
) -> List[List[RetrievedDoc]]:
    """Per-sentence BM25 retrieval over a corpus split.

    ``with_entity`` adds title-boosted entity clauses (v4); entities default
    to the records' gold/predicted tags (``generate_data.py:100-109``).
    Queries run in batches of ``batch_size`` (the reference uses 1000-query
    ``_msearch`` batches, ``:118-127``).
    """
    queries = [sentence_query(r, lang) for r in records]
    ents: Optional[List[List[str]]] = None
    if with_entity:
        ents = (list(map(list, entities)) if entities is not None
                else [extract_entities(r, tag_layer) for r in records])
    if ents is None and engine.mode == "pruned":
        # sentence-only queries ride the pipelined stream (pack/upload
        # overlap device compute); entity-boosted queries carry a title
        # field the stream does not pack, so they stay batchwise
        return engine.search_texts_stream(queries, k=k,
                                          batch_size=batch_size)
    out: List[List[RetrievedDoc]] = []
    for i in range(0, len(queries), batch_size):
        qs = queries[i:i + batch_size]
        es = ents[i:i + batch_size] if ents is not None else None
        out.extend(engine.search(qs, k=k, entity_queries=es))
    return out


# -- retrieval-file interop ----------------------------------------------------

def write_retrieval_file(
    path: str | Path,
    records: Sequence[SentenceRecord],
    results: Sequence[Sequence[RetrievedDoc]],
    lang: str = "en",
    entities: Optional[Sequence[Sequence[str]]] = None,
) -> None:
    """Reference retrieval-file format, including the highlight column:
    ES wraps matched terms in ``<hit>`` tags per field and the reference
    stores ``text_fragment ---#--- title_fragment``
    (``generate_data.py:43-51,141``). The text fragment highlights the
    sentence query's terms; the title fragment highlights the entity
    clause's terms (v4 ``--with_entity``), so it is empty for plain
    sentence retrieval exactly as ES omits unmatched-field highlights.
    Term sets come from the language's own index analyzer (zh's cjk set
    includes single chars, so UAX#29 offset tokens still match)."""
    from .analyzer import get_analyzer, highlight_hits

    analyze = get_analyzer(lang)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for i, (rec, docs) in enumerate(zip(records, results)):
            query = sentence_query(rec, lang)
            f.write(query + "\n")
            q_terms = set(analyze(query))
            ent_terms = (set(analyze(" ".join(entities[i])))
                         if entities is not None and i < len(entities)
                         else set())
            for d in docs:
                hits = (highlight_hits(d.sentence, q_terms) + " ---#--- "
                        + highlight_hits(d.title, ent_terms))
                f.write(
                    f"{d.sentence}\t{d.paragraph}\t{d.title}\t"
                    f"{d.score:.6f}\t{d.url}\t{hits}\n")
            f.write("\n")


def read_retrieval_file(path: str | Path) -> Dict[str, List[RetrievedDoc]]:
    """Parse a retrieval file into query -> ranked contexts (the role of
    ``context_process.py:802-967``'s google_dict)."""
    out: Dict[str, List[RetrievedDoc]] = {}
    query: Optional[str] = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                query = None
                continue
            if query is None:
                query = line
                out[query] = []
                continue
            parts = line.split("\t")
            sentence = parts[0] if len(parts) > 0 else ""
            paragraph = parts[1] if len(parts) > 1 else ""
            title = parts[2] if len(parts) > 2 else ""
            score = float(parts[3]) if len(parts) > 3 and parts[3] else 0.0
            url = parts[4] if len(parts) > 4 else ""
            out[query].append(RetrievedDoc(
                doc_id=-1, score=score, sentence=sentence,
                paragraph=paragraph, title=title, url=url))
    return out


# -- KB persistence ---------------------------------------------------------------

def save_kb(
    dir_path: str | Path,
    text_index: BM25Index,
    store,
    title_index: Optional[BM25Index] = None,
    lang: str = "en",
    ik_dict: Optional[str | Path] = None,
    ik_smart: bool = False,
) -> None:
    """Persist a built KB (the role of the long-lived ES index +
    ``_source`` store, ``build_kb.py``): ``text.idx``/``title.idx``
    pickles, a ``kb.docs`` PackedDocStore, and ``meta.json``. Reload with
    :func:`load_kb`; the retrieve/serve CLIs take ``--index_dir``."""
    from .docstore import PackedDocStore

    d = Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    text_index.save(d / "text.idx")
    if title_index is not None:
        title_index.save(d / "title.idx")
    if isinstance(store, PackedDocStore):
        if store.path.resolve() != (d / "kb.docs").resolve():
            import shutil

            shutil.copyfile(store.path, d / "kb.docs")
    else:
        PackedDocStore.from_store(d / "kb.docs", store).close()
    meta = {"lang": lang}
    if ik_dict is not None:
        # the segmentation dictionary is part of the index's identity:
        # reopening with a different lexicon would tokenize queries
        # differently from the indexed documents — copy it INTO the
        # directory so load_kb restores the exact analyzer
        import shutil

        from .analyzer import builtin_zh_lexicon

        src = builtin_zh_lexicon() if ik_dict == "builtin" else ik_dict
        shutil.copyfile(src, d / "ik.dic")
        meta["ik_dict"] = "ik.dic"
        meta["ik_smart"] = bool(ik_smart)
    (d / "meta.json").write_text(json.dumps(meta))


def load_kb(dir_path: str | Path
            ) -> Tuple[BM25Index, "PackedDocStore", Optional[BM25Index], str]:
    """Open a :func:`save_kb` directory: mmap the doc store, unpickle the
    indices, restore the language's analyzer."""
    from .docstore import PackedDocStore

    d = Path(dir_path)
    meta = json.loads((d / "meta.json").read_text())
    lang = meta.get("lang", "en")
    analyzer = get_analyzer(
        lang,
        dict_path=(d / meta["ik_dict"] if meta.get("ik_dict") else None),
        smart=meta.get("ik_smart", False))
    text_index = BM25Index.load(d / "text.idx", analyzer=analyzer)
    title_index = (BM25Index.load(d / "title.idx", analyzer=analyzer)
                   if (d / "title.idx").exists() else None)
    store = PackedDocStore(d / "kb.docs")
    return text_index, store, title_index, lang


# -- KB construction -------------------------------------------------------------

def build_kb_from_jsonl(
    path: str | Path,
    lang: str = "en",
    max_docs: Optional[int] = None,
    params: Optional[BM25Params] = None,
    with_title_index: bool = True,
    store_path: Optional[str | Path] = None,
    fail_path: Optional[str | Path] = None,
    ik_dict: Optional[str | Path] = None,
    ik_smart: bool = False,
) -> Tuple[BM25Index, "DocStore | PackedDocStore", Optional[BM25Index]]:
    """Build text (+title) indices from parsed-wiki JSONL.

    Input format matches the reference's ``parse_text.py`` output
    (``:81``): one JSON object per line with ``title``, ``sentence``,
    ``paragraph``, ``url`` fields. The ES mapping indexed ``text`` (the
    sentence) and ``title``; ``paragraph``/``url`` are stored, not searched
    (``build_kb.py:24-36``).

    ``store_path`` streams payloads to an mmap-backed
    :class:`~.docstore.PackedDocStore` instead of holding every
    paragraph in RAM (the production path at dump scale; the LMDB/ES
    ``_source`` role). ``fail_path`` appends unparseable input lines to
    a fail file and continues — the ingest-failure contract of the
    reference's bulk loader (``build_kb.py:81-84``) — instead of
    aborting the whole build; without it malformed input still raises.
    """
    from .docstore import PackedDocStoreWriter, PackedDocStore

    analyzer = get_analyzer(lang, dict_path=ik_dict, smart=ik_smart)
    sentences: List[str] = []
    titles: List[str] = []
    paragraphs: List[str] = []
    urls: List[str] = []
    writer = (PackedDocStoreWriter(store_path)
              if store_path is not None else None)
    n_failed = 0
    fail_f = open(fail_path, "a", encoding="utf-8") if fail_path else None
    try:
        with open(path, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    obj = json.loads(line)
                    if not isinstance(obj, dict):
                        raise ValueError("record is not an object")
                except ValueError:
                    if fail_f is None:
                        raise
                    fail_f.write(line if line.endswith("\n") else line + "\n")
                    n_failed += 1
                    continue
                sentence = obj.get("sentence", "")
                title = obj.get("title", "")
                sentences.append(sentence)
                titles.append(title)
                if writer is not None:
                    writer.add(sentence, obj.get("paragraph", ""), title,
                               obj.get("url", ""))
                else:
                    paragraphs.append(obj.get("paragraph", ""))
                    urls.append(obj.get("url", ""))
                if max_docs is not None and len(sentences) >= max_docs:
                    break
    finally:
        if fail_f is not None:
            fail_f.close()
        if writer is not None:
            writer.close()
    if n_failed:
        import logging
        logging.getLogger(__name__).warning(
            "build_kb_from_jsonl: %d unparseable lines appended to %s",
            n_failed, fail_path)
    text_index = BM25Index.build(sentences, analyzer=analyzer, params=params)
    title_index = (BM25Index.build(titles, analyzer=analyzer, params=params)
                   if with_title_index else None)
    if writer is not None:
        store: DocStore | PackedDocStore = PackedDocStore(store_path)
    else:
        store = DocStore(sentences=sentences, paragraphs=paragraphs,
                         titles=titles, urls=urls)
    return text_index, store, title_index
