"""Context reranking reachable from the production CLI
(`retrieve --rerank edit|bertscore`, the tools/bert_scoring.py modes)."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

FIX = Path(__file__).parent / "fixtures"


def _kb_jsonl(path, n=25):
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n):
            f.write(json.dumps({
                "sentence": f"entity {i} lives in city {i % 5}",
                "paragraph": f"About entity {i}.",
                "title": f"Entity {i}",
                "url": f"https://x/{i}",
            }) + "\n")


def test_retrieve_rerank_edit(tmp_path):
    from kbner_tpu import cli

    kb = tmp_path / "kb.jsonl"
    _kb_jsonl(kb)
    out = tmp_path / "out"
    cli.main(["retrieve", "--kb", str(kb),
              "--data_folder", str(FIX / "ner_toy"),
              "--out", str(out), "--k", "3", "--rerank", "edit"])
    assert (out / "train.retrieval.tsv").exists()
    assert (out / "train.txt").exists()


def test_retrieve_rerank_bertscore_needs_model():
    from kbner_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["retrieve", "--kb", "x.jsonl", "--data_folder", "d",
                  "--out", "o", "--rerank", "bertscore"])


def test_embed_texts_and_bertscore_rerank(tmp_path):
    """Train the toy tagger, then rerank through its encoder end to end."""
    from kbner_tpu import cli

    raw = yaml.safe_load((FIX / "toy_config.yaml").read_text())
    raw["corpora"][0]["data_folder"] = str(FIX / "ner_toy")
    raw["train"]["max_epochs"] = 1
    raw["target_dir"] = str(tmp_path / "run")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(raw))
    cli.main(["train", "--config", str(cfg)])

    kb = tmp_path / "kb.jsonl"
    _kb_jsonl(kb)
    out = tmp_path / "out"
    cli.main(["retrieve", "--kb", str(kb),
              "--data_folder", str(FIX / "ner_toy"),
              "--out", str(out), "--k", "3",
              "--rerank", "bertscore", "--model_config", str(cfg)])
    assert (out / "train.retrieval.tsv").exists()

    # embed_texts contract: input order, per-text masks, common padding
    from kbner_tpu.config import ExperimentConfig
    from kbner_tpu.cli import _build

    _, _, _, _, trainer = _build(ExperimentConfig.from_file(cfg))
    texts = ["a b c", "one", "x y"]
    emb, mask = trainer.embed_texts(texts)
    assert emb.shape[0] == 3 and mask.shape == emb.shape[:2]
    assert mask.sum(axis=1).tolist() == [3, 1, 2]
    assert np.abs(emb[1, 0]).sum() > 0  # real features, not zeros
