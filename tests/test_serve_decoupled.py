"""Serving and retrieval decoupled from training-time artifacts.

VERDICT r2 next #6: `serve` must reconstruct from config +
tag_dictionary.json + checkpoint without the train corpus on disk, and
`retrieve` must honor the experiment's tokenizer for the fusion budget
instead of a hard-coded hash proxy."""

import io
import json
import shutil
from pathlib import Path

import pytest
import yaml

FIX = Path(__file__).parent / "fixtures"


def _train_toy(tmp_path):
    from kbner_tpu import cli

    raw = yaml.safe_load((FIX / "toy_config.yaml").read_text())
    raw["corpora"][0]["data_folder"] = str(FIX / "ner_toy")
    raw["train"]["max_epochs"] = 25
    raw["target_dir"] = str(tmp_path / "run")
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(raw))
    cli.main(["train", "--config", str(p)])
    return p, raw


def test_serve_without_train_corpus(tmp_path, capsys, monkeypatch):
    """serve runs from a deployment directory holding ONLY the config,
    tag_dictionary.json, and the checkpoint — the corpus path in the
    config does not even exist."""
    from kbner_tpu import cli

    p, raw = _train_toy(tmp_path)
    capsys.readouterr()

    deploy = tmp_path / "deploy"
    (deploy / "run").mkdir(parents=True)
    for f in ("best-model.msgpack", "tag_dictionary.json"):
        shutil.copy(Path(raw["target_dir"]) / f, deploy / "run" / f)
    raw["corpora"][0]["data_folder"] = str(deploy / "DOES_NOT_EXIST")
    raw["target_dir"] = str(deploy / "run")
    dp = deploy / "cfg.yaml"
    dp.write_text(yaml.safe_dump(raw))

    req = {"id": 7, "tokens": ["Alice", "Smith", "visited", "Berlin"]}
    monkeypatch.setattr("sys.stdin", io.StringIO(json.dumps(req)))
    cli.main(["serve", "--config", str(dp)])
    out = [json.loads(ln) for ln in
           capsys.readouterr().out.strip().splitlines()]
    assert out[0]["id"] == 7
    assert len(out[0]["tags"]) == 4
    labels = {s["label"] for s in out[0]["spans"]}
    assert "PER" in labels  # the trained weights really loaded


def test_serve_requires_tag_dictionary(tmp_path, monkeypatch):
    from kbner_tpu import cli

    raw = yaml.safe_load((FIX / "toy_config.yaml").read_text())
    raw["corpora"][0]["data_folder"] = str(FIX / "ner_toy")
    raw["target_dir"] = str(tmp_path / "empty_run")
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(raw))
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    with pytest.raises(ValueError, match="tag_dictionary.json"):
        cli.main(["serve", "--config", str(p)])


@pytest.fixture()
def hf_tok_dir(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    d = tmp_path / "hf_tok"
    d.mkdir()
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "<pad>", "</s>", "<unk>"])
    tok.train_from_iterator(
        ["alice visited berlin", "acme corp is a company in new york",
         "the european union met in paris"], trainer)
    tok.save(str(d / "tokenizer.json"))
    json.dump({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        "pad_token": "<pad>", "cls_token": "<s>", "sep_token": "</s>",
    }, open(d / "tokenizer_config.json", "w"))
    return d


def test_retrieve_honors_hf_tokenizer(tmp_path, hf_tok_dir, caplog):
    """--hf_tokenizer routes the fusion budget through the real tokenizer
    (no hash-proxy warning); --tokenizer_config does the same through an
    experiment config's tokenizer: block."""
    import logging

    from kbner_tpu import cli

    kb = tmp_path / "kb.jsonl"
    kb.write_text("\n".join(json.dumps({
        "title": t, "p_id": 0, "s_id": 0, "sentence": s, "paragraph": s,
        "url": "u"}) for t, s in [
            ("Berlin", "Berlin is the capital of Germany ."),
            ("Alice", "Alice Smith is a person ."),
        ]))

    with caplog.at_level(logging.WARNING):
        cli.main(["retrieve", "--kb", str(kb),
                  "--data_folder", str(FIX / "ner_toy"),
                  "--out", str(tmp_path / "out_hf"), "--k", "2",
                  "--hf_tokenizer", str(hf_tok_dir)])
    assert not any("word-hash proxy" in r.message for r in caplog.records)
    assert (tmp_path / "out_hf" / "train.txt").exists()

    # tokenizer_config path: the experiment's tokenizer block is honored
    cfg = {"name": "tok", "corpora": [],
           "tokenizer": {"type": "hf", "dir": str(hf_tok_dir)}}
    cfg_p = tmp_path / "tok.yaml"
    cfg_p.write_text(yaml.safe_dump(cfg))
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        cli.main(["retrieve", "--kb", str(kb),
                  "--data_folder", str(FIX / "ner_toy"),
                  "--out", str(tmp_path / "out_cfg"), "--k", "2",
                  "--tokenizer_config", str(cfg_p)])
    assert not any("word-hash proxy" in r.message for r in caplog.records)

    # default still works but warns about the proxy
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        cli.main(["retrieve", "--kb", str(kb),
                  "--data_folder", str(FIX / "ner_toy"),
                  "--out", str(tmp_path / "out_hash"), "--k", "2"])
    assert any("word-hash proxy" in r.message for r in caplog.records)
