"""Aux subsystems: checkpoint/resume, loss.tsv, plotter, speed test,
hyperparameter search, learned ensemble (SWAF)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kbner_tpu.data import Dictionary, HashTokenizer, encode_batch, \
    load_column_corpus
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.models.ensemble_model import (
    EnsembleConfig,
    EnsembleModel,
    SWAFTrainer,
    encode_system_predictions,
)
from kbner_tpu.train import FinetuneTrainer, TrainConfig
from kbner_tpu.train.param_search import (
    SearchSpace,
    random_search,
    tpe_search,
)
from kbner_tpu.utils import plot_training_curves

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def trainer_factory():
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    tok = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    batch = encode_batch(corpus.train[:2], tok, tag_dict)

    def make():
        model, params = init_tagger(
            cfg, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch.arrays().items()})
        return FinetuneTrainer(model, params, corpus, tok, tag_dict)

    return make, corpus


def test_checkpoint_resume(tmp_path, trainer_factory):
    make, corpus = trainer_factory
    # run 1: 3 epochs with checkpointing
    t1 = make()
    cfg1 = TrainConfig(learning_rate=1e-3, lr_rate=1.0, batch_size=8,
                       max_epochs=3, checkpoint=True)
    r1 = t1.train(tmp_path / "run", cfg1)
    assert (tmp_path / "run" / "checkpoint.msgpack").exists()
    # run 2: resume to 5 epochs; history continues from epoch 3
    t2 = make()
    cfg2 = TrainConfig(learning_rate=1e-3, lr_rate=1.0, batch_size=8,
                       max_epochs=5, checkpoint=True, resume=True)
    r2 = t2.train(tmp_path / "run", cfg2)
    assert len(r2["history"]["train_loss"]) == 5
    assert r2["history"]["train_loss"][:3] == r1["history"]["train_loss"]


def test_loss_tsv_and_plot(tmp_path, trainer_factory):
    make, corpus = trainer_factory
    t = make()
    t.train(tmp_path / "run", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=8, max_epochs=2))
    tsv = (tmp_path / "run" / "loss.tsv").read_text().splitlines()
    assert tsv[0].startswith("EPOCH") and len(tsv) == 3
    out = plot_training_curves(tmp_path / "run")
    if out is not None:  # matplotlib present
        assert out.exists() and out.stat().st_size > 0


def test_profiler_trace(tmp_path, trainer_factory):
    """profile_steps captures an XPlane trace of the first-epoch steps
    (SURVEY §5 tracing: the rebuild adds real profiler integration)."""
    make, corpus = trainer_factory
    t = make()
    t.train(tmp_path / "run", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=8, max_epochs=1,
        profile_steps=1, profile_start=0))
    traces = list((tmp_path / "run" / "profile").rglob("*.xplane.pb"))
    assert traces and traces[0].stat().st_size > 0


def test_evaluate_speed(trainer_factory):
    make, corpus = trainer_factory
    t = make()
    sps = t.evaluate_speed(corpus.train, batch_size=8)
    assert sps > 0


def test_random_search():
    space = SearchSpace(
        choices={"batch_size": [4, 8]},
        log_uniform={"lr": (1e-4, 1e-1)},
    )

    # quadratic bowl: best lr near 1e-2
    def run_trial(params):
        return -abs(np.log10(params["lr"]) + 2.0)

    result = random_search(space, run_trial, n_trials=12, seed=1)
    assert abs(np.log10(result["best_params"]["lr"]) + 2.0) < 0.7
    assert len(result["trials"]) == 12


def test_tpe_search_converges_and_beats_random_budget():
    space = SearchSpace(
        choices={"scheme": ["bad", "good"]},
        uniform={"x": (0.0, 1.0)},
        log_uniform={"lr": (1e-4, 1e-1)},
    )

    # smooth objective: best at scheme=good, x=0.7, lr=1e-2
    def run_trial(p):
        return (-abs(np.log10(p["lr"]) + 2.0)
                - 3.0 * (p["x"] - 0.7) ** 2
                + (1.0 if p["scheme"] == "good" else 0.0))

    result = tpe_search(space, run_trial, n_trials=30, n_startup=6, seed=3)
    best = result["best_params"]
    assert best["scheme"] == "good"
    assert abs(best["x"] - 0.7) < 0.15
    assert abs(np.log10(best["lr"]) + 2.0) < 0.5
    assert len(result["trials"]) == 30
    # later (guided) trials concentrate near the optimum vs the startup ones
    late = [t["score"] for t in result["trials"][-10:]]
    early = [t["score"] for t in result["trials"][:6]]
    assert np.mean(late) > np.mean(early)


def test_swaf_ensemble_learns_system_reliability():
    # system 0 is always right; system 1 always wrong: the learned combiner
    # should follow system 0
    label_dict = Dictionary()
    for item in ("O", "S-PER", "S-LOC"):
        label_dict.add_item(item)
    gold = [["S-PER", "O", "S-LOC"], ["O", "S-PER", "O"]]
    sys0 = gold
    sys1 = [["O", "S-PER", "O"], ["S-LOC", "O", "S-PER"]]
    arrays = encode_system_predictions([sys0, sys1], gold, label_dict)

    cfg = EnsembleConfig(num_systems=2, num_labels=len(label_dict))
    model = EnsembleModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(arrays["system_onehots"]))
    trainer = SWAFTrainer(model, params)
    losses = trainer.train(arrays, steps=300, lr=5e-2)
    assert losses[-1] < losses[0]
    combined = trainer.combine(arrays)
    mask = arrays["mask"].astype(bool)
    acc = (combined[mask] == arrays["gold_ids"][mask]).mean()
    assert acc == 1.0
