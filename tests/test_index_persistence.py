"""Persistent KB workflow: `cli index` builds + saves; retrieve/serve
reopen via --index_dir (the role of the reference's long-lived ES
index, build_kb.py)."""

import json
from pathlib import Path

import numpy as np

FIX = Path(__file__).parent / "fixtures"


def _kb_jsonl(path, n=30):
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n):
            f.write(json.dumps({
                "sentence": f"entity {i} lives in city {i % 5}",
                "paragraph": f"About entity {i}.",
                "title": f"Entity {i}",
                "url": f"https://x/{i}",
            }) + "\n")


def test_save_load_kb_roundtrip(tmp_path):
    from kbner_tpu.retrieval import PackedDocStore, RetrievalEngine
    from kbner_tpu.retrieval.pipeline import (build_kb_from_jsonl, load_kb,
                                              save_kb)

    kb = tmp_path / "kb.jsonl"
    _kb_jsonl(kb)
    ti, store, tti = build_kb_from_jsonl(kb)
    save_kb(tmp_path / "idx", ti, store, tti, "en")

    ti2, store2, tti2, lang = load_kb(tmp_path / "idx")
    assert lang == "en" and isinstance(store2, PackedDocStore)
    assert ti2.n_docs == ti.n_docs and tti2.n_docs == tti.n_docs
    # the loaded index scores identically to the built one
    q = ["entity 7 lives in city 2"]
    np.testing.assert_allclose(ti.score_oracle(q), ti2.score_oracle(q))
    # engine over the loaded KB materializes payloads from the mmap store
    eng = RetrievalEngine(ti2, store=store2, title_index=tti2)
    top = eng.search(q, k=1)[0][0]
    assert top.paragraph.startswith("About entity")


def test_cli_index_then_retrieve(tmp_path):
    from kbner_tpu import cli

    kb = tmp_path / "kb.jsonl"
    _kb_jsonl(kb)
    cli.main(["index", "--kb", str(kb), "--out", str(tmp_path / "idx")])
    for f in ("text.idx", "title.idx", "kb.docs", "meta.json"):
        assert (tmp_path / "idx" / f).exists()
    out = tmp_path / "out"
    cli.main(["retrieve", "--index_dir", str(tmp_path / "idx"),
              "--data_folder", str(FIX / "ner_toy"),
              "--out", str(out), "--k", "2"])
    assert (out / "train.retrieval.tsv").exists()
    # neither --kb nor --index_dir is an error, not a crash
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["retrieve", "--data_folder", str(FIX / "ner_toy"),
                  "--out", str(out)])


def test_cli_retrieve_route_mix(tmp_path):
    """MIX-track fan-out from the CLI: repeated lang=path KBs, every
    query merged across all language engines by score."""
    from kbner_tpu import cli
    from kbner_tpu.retrieval.pipeline import read_retrieval_file

    for lang in ("en", "de"):
        with open(tmp_path / f"{lang}.jsonl", "w", encoding="utf-8") as f:
            for i in range(12):
                extra = " Alice Smith visited Berlin" if i == 5 else ""
                f.write(json.dumps({
                    "sentence": f"{lang} doc {i} text{extra}",
                    "paragraph": "p", "title": f"{lang.upper()} E{i}",
                    "url": "u"}) + "\n")
    out = tmp_path / "out"
    cli.main(["retrieve", "--route", "mix",
              "--kb", f"en={tmp_path / 'en.jsonl'}",
              "--kb", f"de={tmp_path / 'de.jsonl'}",
              "--data_folder", str(FIX / "ner_toy"),
              "--out", str(out), "--k", "4"])
    parsed = read_retrieval_file(out / "train.retrieval.tsv")
    rows = next(iter(parsed.values()))
    # the Alice/Berlin sentence exists in BOTH KBs; the merged top-k must
    # contain it from both languages with equal scores
    titles = {d.title for q, docs in parsed.items() for d in docs}
    assert any(t.startswith("EN") for t in titles)
    assert any(t.startswith("DE") for t in titles)
    assert all(len(docs) <= 4 for docs in parsed.values())
    scores = [d.score for d in rows]
    assert scores == sorted(scores, reverse=True)  # merged by score
