"""`trainer:` config key: KD / ACE / SWAF / LM run end-to-end through the
CLI, strict config validation (VERDICT r2 next #2: a capability you cannot
drive from the CLI is not done; reference selects trainers by name,
/root/reference/train.py:105-131)."""

import json
from pathlib import Path

import pytest
import yaml

from kbner_tpu.config import ExperimentConfig

FIX = Path(__file__).parent / "fixtures"


def base_config(tmp_path, name="toy", **overrides):
    raw = yaml.safe_load((FIX / "toy_config.yaml").read_text())
    raw["corpora"][0]["data_folder"] = str(FIX / "ner_toy")
    raw["corpora"][0]["test_file"] = "train.txt"
    raw["train"]["max_epochs"] = 25
    raw["target_dir"] = str(tmp_path / f"{name}_run")
    raw["name"] = name
    raw.update(overrides)
    p = tmp_path / f"{name}.yaml"
    p.write_text(yaml.safe_dump(raw))
    return p, raw


# -- strict validation ---------------------------------------------------------

def test_unknown_top_level_key_raises(tmp_path):
    p, raw = base_config(tmp_path)
    raw["trainers"] = "FinetuneTrainer"  # typo of 'trainer'
    p.write_text(yaml.safe_dump(raw))
    with pytest.raises(ValueError, match="unknown config keys.*trainers"):
        ExperimentConfig.from_file(p)


def test_unknown_train_key_raises(tmp_path):
    p, raw = base_config(tmp_path)
    raw["train"]["learing_rate"] = 1e-3  # typo must not train with defaults
    p.write_text(yaml.safe_dump(raw))
    cfg = ExperimentConfig.from_file(p)
    with pytest.raises(ValueError, match="unknown train keys.*learing_rate"):
        cfg.make_train_config()


def test_unknown_trainer_raises(tmp_path):
    p, raw = base_config(tmp_path)
    raw["trainer"] = "MagicTrainer"
    p.write_text(yaml.safe_dump(raw))
    with pytest.raises(ValueError, match="unknown trainer"):
        ExperimentConfig.from_file(p)


def test_reference_trainer_aliases():
    cfg = ExperimentConfig.from_dict({
        "name": "a", "corpora": [], "trainer": "ModelFinetuner"})
    assert cfg.trainer_kind == "finetune"
    cfg = ExperimentConfig.from_dict({
        "name": "a", "corpora": [], "trainer": "ModelDistiller"})
    assert cfg.trainer_kind == "distill"


def test_distill_train_keys_validated(tmp_path):
    """DistillConfig fields (interpolation etc.) are legal under the KD
    trainer but rejected for the plain finetuner."""
    p, raw = base_config(tmp_path, trainer="DistillationTrainer")
    raw["train"]["interpolation"] = 0.7
    p.write_text(yaml.safe_dump(raw))
    cfg = ExperimentConfig.from_file(p)
    assert cfg.make_train_config().interpolation == 0.7

    raw["trainer"] = "FinetuneTrainer"
    p.write_text(yaml.safe_dump(raw))
    with pytest.raises(ValueError, match="interpolation"):
        ExperimentConfig.from_file(p).make_train_config()


# -- KD ------------------------------------------------------------------------

def test_cli_kd_end_to_end(tmp_path):
    """Teacher trained by the CLI, then a student distills from it through
    `trainer: DistillationTrainer` + `teachers:` (ModelDistiller path)."""
    from kbner_tpu import cli

    teacher_p, teacher_raw = base_config(tmp_path, name="teacher")
    cli.main(["train", "--config", str(teacher_p)])
    assert (Path(teacher_raw["target_dir"]) / "best-model.msgpack").exists()

    student_p, student_raw = base_config(
        tmp_path, name="student",
        trainer="DistillationTrainer", teachers=[str(teacher_p)])
    student_raw["train"]["interpolation"] = 0.5
    student_raw["train"]["max_epochs"] = 20
    student_p.write_text(yaml.safe_dump(student_raw))
    cli.main(["train", "--config", str(student_p)])
    run = Path(student_raw["target_dir"])
    assert (run / "best-model.msgpack").exists()
    results = json.loads((run / "test_results.json").read_text())
    assert results["TOY"]["micro_f1"] > 0.8  # distilled student learns


def test_cli_kd_requires_teachers(tmp_path):
    from kbner_tpu import cli

    p, raw = base_config(tmp_path, name="kd_no_teachers",
                         trainer="DistillationTrainer")
    with pytest.raises(ValueError, match="teachers"):
        cli.main(["train", "--config", str(p)])


# -- ACE -----------------------------------------------------------------------

def test_cli_ace_end_to_end(tmp_path):
    """`trainer: ReinforcementTrainer` runs the ACE episode loop over a
    stacked-embedder tagger and saves training_state.json + a final model
    trained with the best action (reinforcement_trainer.py:273+)."""
    from kbner_tpu import cli

    p, raw = base_config(tmp_path, name="ace",
                         trainer="ReinforcementTrainer")
    raw["model"]["embeddings"] = [
        {"type": "word", "dim": 24},
        {"type": "char_bilstm", "char_dim": 8, "hidden": 8},
    ]
    raw["ace"] = {"episodes": 3}
    raw["train"]["max_epochs"] = 15
    raw["train"]["learning_rate"] = 0.05
    p.write_text(yaml.safe_dump(raw))
    cli.main(["train", "--config", str(p)])
    run = Path(raw["target_dir"])
    state = json.loads((run / "training_state.json").read_text())
    assert len(state["best_action"]) == 2
    assert sum(state["best_action"]) >= 1
    assert (run / "best-model.msgpack").exists()
    results = json.loads((run / "test_results.json").read_text())
    assert results["TOY"]["micro_f1"] > 0.5


# -- SWAF ----------------------------------------------------------------------

def test_cli_swaf_end_to_end(tmp_path):
    """`trainer: SWAFTrainer` learns per-token system weights from dev
    prediction files and combines test predictions (swaf_trainer.py)."""
    from kbner_tpu import cli
    from kbner_tpu.data.conll import read_column_file

    # two synthetic systems: A is right on PER, B is right on LOC
    gold = [("Alice", "B-PER", "B-PER", "O"),
            ("visited", "O", "O", "O"),
            ("Berlin", "B-LOC", "O", "B-LOC")]

    def write_preds(path, col):
        lines = [f"{t} {g} {a if col == 0 else b}"
                 for t, g, a, b in gold]
        path.write_text("\n".join(lines) + "\n\n")

    files = {}
    for split in ("dev", "test"):
        for s, name in ((0, "a"), (1, "b")):
            f = tmp_path / f"{split}.{name}.tsv"
            write_preds(f, s)
            files.setdefault(split, []).append(str(f))

    p, raw = base_config(tmp_path, name="swaf", trainer="SWAFTrainer")
    raw["systems"] = files
    raw["train"] = {"max_epochs": 300, "learning_rate": 0.05}
    p.write_text(yaml.safe_dump(raw))
    cli.main(["train", "--config", str(p)])
    run = Path(raw["target_dir"])
    result = json.loads((run / "swaf_results.json").read_text())
    # the weighted vote recovers both entities neither system has alone
    assert result["test_micro_f1"] == pytest.approx(1.0)
    out = read_column_file(run / "test.swaf.tsv", {0: "text", 1: "pred"},
                           tag_to_bioes=None)
    assert out[0].tags["pred"] == ["B-PER", "O", "B-LOC"]


# -- LM ------------------------------------------------------------------------

def test_cli_lm_end_to_end(tmp_path):
    """`trainer: LanguageModelTrainer` pretrains the char LM on the corpus
    text (language_model_trainer.py path)."""
    from kbner_tpu import cli

    p, raw = base_config(tmp_path, name="lm", trainer="LanguageModelTrainer")
    raw["model"] = {"embed_dim": 16, "hidden": 32}
    raw["train"] = {"max_steps": 40, "batch_size": 4, "seq_len": 32,
                    "log_every": 1000}
    p.write_text(yaml.safe_dump(raw))
    cli.main(["train", "--config", str(p)])
    run = Path(raw["target_dir"])
    assert (run / "char-lm.msgpack").exists()
    assert (run / "char_vocab.json").exists()
