"""Full ACE driver: episode search + final training over a stacked tagger."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kbner_tpu.data import HashTokenizer, encode_batch, load_column_corpus
from kbner_tpu.data.encode import (
    add_classic_features,
    build_char_vocab,
    build_word_vocab,
)
from kbner_tpu.models import TaggerConfig, XLMRConfig
from kbner_tpu.models.embedders import (
    CharBiLSTMEmbedder,
    EmbedderSpec,
    WordEmbedder,
)
from kbner_tpu.models.tagger import init_stacked_tagger
from kbner_tpu.train import FinetuneTrainer, TrainConfig
from kbner_tpu.train.reinforce import ReinforceConfig, ace_train

FIX = Path(__file__).parent / "fixtures"


def test_ace_train_end_to_end(tmp_path):
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    tok = HashTokenizer(vocab_size=997)
    wv = build_word_vocab(corpus.train)
    cv = build_char_vocab(corpus.train)
    specs = (
        EmbedderSpec("w", WordEmbedder(vocab_size=len(wv), dim=16), 16),
        EmbedderSpec("c", CharBiLSTMEmbedder(
            char_vocab_size=len(cv), char_dim=8, hidden=8), 16),
    )
    eb = encode_batch(corpus.train[:2], tok, tag_dict)
    add_classic_features(eb, wv, cv)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    model, params = init_stacked_tagger(
        cfg, specs, jax.random.PRNGKey(0), arrays)
    trainer = FinetuneTrainer(model, params, corpus, tok, tag_dict)
    trainer.word_vocab = wv
    trainer.char_vocab = cv

    result = ace_train(
        trainer,
        TrainConfig(learning_rate=0.05, lr_rate=1.0, batch_size=8,
                    max_epochs=6),
        tmp_path / "ace",
        num_embeddings=2,
        config=ReinforceConfig(episodes=2, seed=0),
    )
    assert len(result["history"]) == 2
    assert sum(result["best_action"]) >= 1
    assert (tmp_path / "ace" / "training_state.json").exists()
    assert (tmp_path / "ace" / "best-model.msgpack").exists()
    assert np.isfinite(result["final"]["best_dev_score"])
