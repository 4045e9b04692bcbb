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


def test_parity_weights_actually_loaded(parity_data, tmp_path):
    """--weights must INITIALIZE the encoder from the checkpoint (not just
    copy its architecture): with lr=0 the exported stage-1 encoder equals
    the checkpoint weights bit-for-bit. --hash_tokenizer is the 550M
    rehearsal mode (no sentencepiece files needed)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    import numpy as np
    from flax.serialization import msgpack_restore

    cfg = transformers.XLMRobertaConfig(
        vocab_size=251, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.XLMRobertaModel(cfg, add_pooling_layer=False)
    ckpt = tmp_path / "ckpt"
    hf.save_pretrained(ckpt)

    out = tmp_path / "out"
    main(["parity", "--weights", str(ckpt), "--hash_tokenizer",
          "--hash_vocab", "128", "--data", str(parity_data),
          "--stage1_folder", "stage1", "--stage2_folder", "stage2",
          "--out", str(out), "--epochs_stage1", "1", "--epochs_stage2", "1",
          "--lr", "0.0", "--lr_rate", "0.0", "--batch_size", "8"])
    enc_path = out / "stage1" / "finetuned-encoder.msgpack"
    assert enc_path.exists()
    exported = msgpack_restore(enc_path.read_bytes())
    while set(exported.keys()) in ({"params"}, {"encoder"}):
        exported = exported[next(iter(exported))]
    want = hf.embeddings.word_embeddings.weight.detach().numpy()
    got = np.asarray(
        exported["word_embeddings"]["embedding"], dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_parity_skips_without_weights(parity_data, tmp_path, capsys):
    main(["parity", "--weights", str(tmp_path / "no-such-ckpt"),
          "--data", str(parity_data), "--stage1_folder", "stage1",
          "--stage2_folder", "stage2", "--out", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "SKIP" in out and "config.json" in out
