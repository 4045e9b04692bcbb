"""PackedDocStore: the mmap-backed KB payload store (LMDB/ES-_source
analogue, reference kb/dumps/convert_db.sh + build_kb.py:29-31) and the
ingest fail-file contract (build_kb.py:81-84)."""

import json

import pytest

from kbner_tpu.retrieval import DocStore, PackedDocStore, PackedDocStoreWriter
from kbner_tpu.retrieval.pipeline import build_kb_from_jsonl


def _records(n=37):
    for i in range(n):
        yield {
            "sentence": f"sentence number {i} with unicode é中文" * (1 + i % 3),
            "paragraph": f"paragraph {i} " + "x" * (i * 7 % 50),
            "title": f"Title {i}",
            "url": f"https://example.org/{i}",
        }


def test_roundtrip(tmp_path):
    path = tmp_path / "kb.docs"
    recs = list(_records())
    store = PackedDocStore.build(path, recs)
    assert len(store) == len(recs)
    for i, r in enumerate(recs):
        assert store.get(i, "sentence") == r["sentence"]
        assert store.get(i, "paragraph") == r["paragraph"]
        assert store.get(i, "title") == r["title"]
        assert store.get(i, "url") == r["url"]
    d = store.materialize(3, 1.5)
    assert d.doc_id == 3 and d.score == 1.5
    assert d.sentence == recs[3]["sentence"]
    assert d.paragraph == recs[3]["paragraph"]
    # reopen fresh (mmap path, no writer state)
    store.close()
    store2 = PackedDocStore(path)
    assert store2.get(36, "title") == "Title 36"
    assert list(store2.field("url"))[:2] == [
        "https://example.org/0", "https://example.org/1"]
    store2.close()


def test_writer_streaming_and_empty_fields(tmp_path):
    path = tmp_path / "kb.docs"
    with PackedDocStoreWriter(path) as w:
        assert w.add("only sentence") == 0
        assert w.add("", "", "", "") == 1
        assert len(w) == 2
    s = PackedDocStore(path)
    assert s.get(0, "paragraph") == ""
    assert s.get(1, "sentence") == ""
    assert s.materialize(1, 0.0).title == ""
    with pytest.raises(IndexError):
        s.get(2, "sentence")
    s.close()


def test_from_store_matches_inmemory(tmp_path):
    mem = DocStore(sentences=["a b", "c"], paragraphs=["pa", "pb"],
                   titles=None, urls=["u0", "u1"])
    packed = PackedDocStore.from_store(tmp_path / "p.docs", mem)
    for i in range(2):
        assert packed.materialize(i, 0.0).sentence == \
            mem.materialize(i, 0.0).sentence
        assert packed.materialize(i, 0.0).url == mem.materialize(i, 0.0).url
        assert packed.materialize(i, 0.0).title == ""
    packed.close()


def test_magic_rejects_garbage(tmp_path):
    p = tmp_path / "not_a_store"
    p.write_bytes(b"garbage bytes that are long enough to hold a footer!!")
    with pytest.raises(ValueError, match="not a packed doc store"):
        PackedDocStore(p)


def _write_jsonl(path, recs, garbage_at=None):
    with open(path, "w", encoding="utf-8") as f:
        for i, r in enumerate(recs):
            if garbage_at is not None and i in garbage_at:
                f.write("{this is not json\n")
            f.write(json.dumps(r) + "\n")


def test_build_kb_streams_to_packed_store(tmp_path):
    recs = list(_records(20))
    jsonl = tmp_path / "kb.jsonl"
    _write_jsonl(jsonl, recs)
    idx, store, tidx = build_kb_from_jsonl(
        jsonl, store_path=tmp_path / "kb.docs")
    assert isinstance(store, PackedDocStore)
    assert len(store) == 20
    assert idx.n_docs == 20 and tidx.n_docs == 20
    assert store.get(7, "paragraph") == recs[7]["paragraph"]


def test_build_kb_fail_file(tmp_path):
    recs = list(_records(6))
    jsonl = tmp_path / "kb.jsonl"
    _write_jsonl(jsonl, recs, garbage_at={2, 4})
    fail = tmp_path / "kb.fail"
    idx, store, _ = build_kb_from_jsonl(jsonl, fail_path=fail)
    # all 6 good records survive, the 2 bad lines land in the fail file
    assert idx.n_docs == 6
    lines = fail.read_text().splitlines()
    assert len(lines) == 2 and all("not json" in ln for ln in lines)
    # without a fail file the same input raises (no silent drops)
    with pytest.raises(ValueError):
        build_kb_from_jsonl(jsonl)


def test_engine_materializes_from_packed_store(tmp_path):
    from kbner_tpu.retrieval import RetrievalEngine

    recs = list(_records(30))
    jsonl = tmp_path / "kb.jsonl"
    _write_jsonl(jsonl, recs)
    idx, store, tidx = build_kb_from_jsonl(
        jsonl, store_path=tmp_path / "kb.docs")
    engine = RetrievalEngine(idx, store=store, title_index=tidx,
                             mode="exhaustive")
    res = engine.search(["sentence number 5"], k=3)
    assert len(res[0]) == 3
    top = res[0][0]
    assert top.sentence.startswith("sentence number")
    assert top.paragraph.startswith("paragraph")
    assert top.url.startswith("https://example.org/")
