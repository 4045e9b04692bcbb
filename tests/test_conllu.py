"""CoNLL-U (Universal Dependencies) reading + the parsing targets on real
treebank format (VERDICT r2 next #8; reference reader
flair/datasets.py:1006)."""

import json
from pathlib import Path

import yaml

from kbner_tpu.data.conll import read_conllu_file
from kbner_tpu.data.corpora import CORPUS_REGISTRY, corpus_spec

FIX = Path(__file__).parent / "fixtures"


def test_read_conllu_skips_ranges_and_empty_nodes():
    recs = read_conllu_file(FIX / "ud_toy" / "en_toy-ud-train.conllu")
    assert len(recs) == 24  # 6 sentences x 4 reps
    r0 = recs[0]
    assert r0.tokens == ["The", "dog", "barks"]
    assert r0.tags["head"] == ["2", "3", "0"]
    assert r0.tags["deprel"] == ["det", "nsubj", "root"]
    assert r0.tags["deps"] == ["2:det", "3:nsubj", "0:root"]
    assert r0.tags["lemma"] == ["lemthe", "lemdog", "lembarks"]
    assert r0.tags["upos"] == ["NOUN"] * 3 and r0.tags["pos"] == ["NN"] * 3
    assert r0.comment and r0.comment.startswith("#")
    # the multiword-token range line (2-3 doesn't) and the empty node
    # (4.1) are skipped: basic token ids stay contiguous
    r2 = recs[2]
    assert r2.tokens == ["She", "does", "n't", "run"]
    assert "doesn't" not in r2.tokens and "ellided" not in r2.tokens
    assert r2.tags["head"] == ["4", "4", "4", "0"]


def test_ud_registry_entries():
    e = CORPUS_REGISTRY["UD_ENGLISH"]
    assert e.format == "conllu"
    assert e.train_file == "en_ewt-ud-train.conllu"
    spec = corpus_spec("UD_ENGLISH", "/data")
    assert spec.format == "conllu"
    assert spec.data_folder == "/data/ud_english"
    # overrides point the entry at local fixtures
    spec = corpus_spec("UD_ENGLISH", str(FIX), data_folder=str(FIX / "ud_toy"),
                       train_file="en_toy-ud-train.conllu")
    assert spec.train_file == "en_toy-ud-train.conllu"


def test_cli_dependency_on_conllu(tmp_path, capsys):
    """targets: dependency trains end to end on CoNLL-U input (head/deprel
    round-trip through the biaffine parser) and memorizes the toy bank."""
    from kbner_tpu import cli

    cfg = {
        "name": "ud-dep",
        "targets": "dependency",
        "corpora": [{
            "name": "UD_TOY", "format": "conllu",
            "data_folder": str(FIX / "ud_toy"),
            "train_file": "en_toy-ud-train.conllu",
            "dev_file": "en_toy-ud-dev.conllu",
            "test_file": "en_toy-ud-train.conllu",
        }],
        "tokenizer": {"type": "hash", "vocab_size": 997},
        "model": {"encoder": "tiny", "arc_dim": 32, "rel_dim": 16},
        "train": {"max_epochs": 60, "batch_size": 8,
                  "learning_rate": 5e-3, "lr_rate": 1.0},
        "target_dir": str(tmp_path / "ud_run"),
    }
    p = tmp_path / "ud.yaml"
    p.write_text(yaml.safe_dump(cfg))
    cli.main(["train", "--config", str(p)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    scores = json.loads(out)
    assert scores["uas"] >= 0.9, scores
    assert scores["las"] >= 0.9, scores


def test_cli_enhancedud_on_conllu(tmp_path, capsys):
    """targets: enhancedud consumes the DEPS column of CoNLL-U files."""
    from kbner_tpu import cli

    cfg = {
        "name": "ud-sdp",
        "targets": "enhancedud",
        "corpora": [{
            "name": "UD_TOY", "format": "conllu",
            "data_folder": str(FIX / "ud_toy"),
            "train_file": "en_toy-ud-train.conllu",
            "dev_file": "en_toy-ud-dev.conllu",
            "test_file": "en_toy-ud-train.conllu",
        }],
        "tokenizer": {"type": "hash", "vocab_size": 997},
        "model": {"encoder": "tiny", "arc_dim": 32, "rel_dim": 16},
        "train": {"max_epochs": 50, "batch_size": 8,
                  "learning_rate": 5e-3, "lr_rate": 1.0},
        "target_dir": str(tmp_path / "sdp_run"),
    }
    p = tmp_path / "sdp.yaml"
    p.write_text(yaml.safe_dump(cfg))
    cli.main(["train", "--config", str(p)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    scores = json.loads(out)
    assert scores["lf1"] >= 0.9, scores
