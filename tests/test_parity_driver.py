"""The one-command real-data F1-parity driver (cli parity): stage-1 ->
encoder export -> stage-2 -> predict -> conlleval. Runs end-to-end on the
fixture corpus in CI (VERDICT r3 #4a); with real weights/data absent it
must skip gracefully with an explicit message."""

import json
from pathlib import Path

import pytest

from kbner_tpu.cli import main

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture()
def parity_data(tmp_path):
    import shutil

    root = tmp_path / "data"
    shutil.copytree(FIX / "ner_toy", root / "stage1")
    shutil.copytree(FIX / "ner_toy", root / "stage2")
    return root


def test_parity_runs_end_to_end(parity_data, tmp_path, capsys):
    out = tmp_path / "out"
    main(["parity", "--data", str(parity_data),
          "--stage1_folder", "stage1", "--stage2_folder", "stage2",
          "--out", str(out), "--epochs_stage1", "2",
          "--epochs_stage2", "6", "--lr", "2e-3", "--lr_rate", "10",
          "--batch_size", "8"])
    summary = json.loads((out / "parity.json").read_text())
    assert summary["parity"] == "ran"
    # the stage hand-off really happened
    assert (out / "stage1" / "finetuned-encoder.msgpack").exists()
    assert (out / "stage2" / "best-model.msgpack").exists()
    tsv = out / "stage2" / "test.parity-stage2-en.tsv"
    assert tsv.exists() and tsv.stat().st_size > 0
    assert isinstance(summary["conlleval_micro_f1"], float)
    assert summary["conlleval_micro_f1"] >= 0.0


def test_parity_skips_without_data(tmp_path, capsys):
    main(["parity", "--data", str(tmp_path / "nope"),
          "--out", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "SKIP" in out and "stage-1 multilingual" in out


def test_parity_skips_without_weights(parity_data, tmp_path, capsys):
    main(["parity", "--weights", str(tmp_path / "no-such-ckpt"),
          "--data", str(parity_data), "--stage1_folder", "stage1",
          "--stage2_folder", "stage2", "--out", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "SKIP" in out and "config.json" in out
