"""Iterative (v4) entity retrieval and multi-stage fine-tuning drivers."""

from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from kbner_tpu.data import (
    EOS_MARKER,
    HashTokenizer,
    encode_batch,
    load_column_corpus,
)
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.retrieval import BM25Index, BM25Params, DocStore, RetrievalEngine
from kbner_tpu.retrieval.iterative import (
    entity_retrieval_round,
    run_multistage,
    strip_context,
)
from kbner_tpu.train import FinetuneTrainer, TrainConfig

FIX = Path(__file__).parent / "fixtures"

DOCS = [
    "Alice Smith is a fictional person",
    "Berlin is the capital of Germany",
    "Acme Corp is a fictional company",
    "Paris is the capital of France",
    "The European Union is a political union",
]
TITLES = ["Alice Smith", "Berlin", "Acme Corp", "Paris", "European Union"]


@pytest.fixture(scope="module")
def setup():
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    tokenizer = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    batch = encode_batch(corpus.train[:2], tokenizer, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch.arrays().items()})
    trainer = FinetuneTrainer(model, params, corpus, tokenizer, tag_dict)

    params_idx = BM25Params(quantize_norms=False)
    text_index = BM25Index.build(DOCS, params=params_idx, pad_docs_to=8)
    title_index = BM25Index.build(TITLES, params=params_idx, pad_docs_to=8)
    store = DocStore(sentences=DOCS, titles=TITLES)
    engine = RetrievalEngine(text_index, store=store, title_index=title_index,
                             use_pallas=False, block_d=8)
    return corpus, tokenizer, trainer, engine


def test_entity_retrieval_round_gold(setup):
    corpus, tokenizer, trainer, engine = setup
    fused = entity_retrieval_round(
        engine, trainer, corpus.train, tokenizer, k=3,
        use_gold_entities=True)
    assert len(fused) == len(corpus.train)
    # the Alice sentence should pull Alice-titled context via the boost
    alice = fused[0]
    assert EOS_MARKER in alice.tokens
    ctx = " ".join(alice.tokens[alice.eos_index:])
    assert "Alice" in ctx or "Berlin" in ctx


def test_entity_retrieval_round_predicted(setup):
    corpus, tokenizer, trainer, engine = setup
    # untrained model predictions are garbage, but the loop must still run
    fused = entity_retrieval_round(
        engine, trainer, corpus.dev, tokenizer, k=2,
        use_gold_entities=False)
    assert len(fused) == len(corpus.dev)


def test_strip_context_idempotent(setup):
    corpus, *_ = setup
    stripped = strip_context(corpus.train)
    assert [r.tokens for r in stripped] == [r.tokens for r in corpus.train]


def test_run_multistage(tmp_path, setup):
    corpus, tokenizer, trainer, engine = setup
    tag_dict = trainer.tag_dict
    cfg = trainer.model.config
    calls = []

    def build_trainer(stage_cfg, encoder_init):
        batch = encode_batch(corpus.train[:2], tokenizer, tag_dict)
        model, params = init_tagger(
            cfg, jax.random.PRNGKey(stage_cfg["seed"]),
            {k: jnp.asarray(v) for k, v in batch.arrays().items()})
        t = FinetuneTrainer(model, params, corpus, tokenizer, tag_dict)
        if encoder_init is not None:
            t.load_encoder(encoder_init)
            calls.append(str(encoder_init))
        tc = TrainConfig(learning_rate=1e-3, lr_rate=1.0, batch_size=8,
                         max_epochs=1)
        return t, tc, tmp_path / f"stage{stage_cfg['seed']}"

    results = run_multistage(
        [{"seed": 0}, {"seed": 1}], build_trainer)
    assert len(results) == 2
    # stage 2 initialized from stage 1's exported encoder
    assert len(calls) == 1 and "stage0" in calls[0]
    assert (tmp_path / "stage0" / "finetuned-encoder.msgpack").exists()
