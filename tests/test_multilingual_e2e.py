"""Multilingual end-to-end: two-language ListCorpus training with language
resampling, per-language dev macro-averaging, and the langwiki-routed
retrieval-augmentation pipeline."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kbner_tpu.data import (
    HashTokenizer,
    ListCorpus,
    encode_batch,
    load_column_corpus,
)
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.retrieval import (
    BM25Index,
    BM25Params,
    DocStore,
    RetrievalEngine,
)
from kbner_tpu.retrieval.engine import langwiki_search
from kbner_tpu.retrieval.fusion import fuse_contexts
from kbner_tpu.train import FinetuneTrainer, TrainConfig

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def multi_corpus():
    en = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id",
        name="EN")
    de = load_column_corpus(
        FIX / "ner_toy_de", {0: "text", 1: "ner"}, comment_symbol="# id",
        name="DE")
    return ListCorpus([en, de])


def test_lang_ids_assigned(multi_corpus):
    langs = {rec.lang_id for rec in multi_corpus.corpora[0].train}
    assert langs == {0}
    langs_de = {rec.lang_id for rec in multi_corpus.corpora[1].train}
    assert langs_de == {1}
    assert multi_corpus.targets == ["EN", "DE"]


def test_multilingual_training_with_resampling(tmp_path, multi_corpus):
    tag_dict = multi_corpus.make_tag_dictionary("ner")
    tok = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    eb = encode_batch(multi_corpus.train[:2], tok, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in eb.arrays().items()})
    trainer = FinetuneTrainer(model, params, multi_corpus, tok, tag_dict)
    result = trainer.train(tmp_path / "multi", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=8, max_epochs=45,
        resample_smooth=0.7))
    # dataset-level macro dev average over BOTH languages mostly memorizes
    # (tiny random-init model; the point is the multilingual machinery)
    assert result["best_dev_score"] >= 0.75
    assert len(result["history"]["dev_score"]) == 45
    # per-language test evaluation works through final_test
    results = trainer.final_test(tmp_path / "multi")
    assert set(results.keys()) <= {"EN", "DE"}


def test_langwiki_fused_pipeline(multi_corpus):
    tok = HashTokenizer(vocab_size=997)
    en_docs = ["Berlin is the capital of Germany",
               "Acme Corp is a company"]
    de_docs = ["Berlin ist die Hauptstadt von Deutschland",
               "Die Europaeische Union ist ein Staatenverbund"]
    params = BM25Params(quantize_norms=False)
    engines = {
        "en": RetrievalEngine(
            BM25Index.build(en_docs, params=params, pad_docs_to=8),
            store=DocStore(sentences=en_docs, titles=["Berlin", "Acme"]),
            use_pallas=False, block_d=8),
        "de": RetrievalEngine(
            BM25Index.build(de_docs, params=params, pad_docs_to=8),
            store=DocStore(sentences=de_docs, titles=["Berlin", "EU"]),
            use_pallas=False, block_d=8),
    }
    records = [multi_corpus.corpora[0].train[0],
               multi_corpus.corpora[1].train[0]]
    queries = [" ".join(r.tokens) for r in records]
    results = langwiki_search(engines, queries, ["en", "de"], k=2)
    # each language's query hit its own index
    assert "capital" in results[0][0].sentence
    assert "Hauptstadt" in results[1][0].sentence
    fused = fuse_contexts(records, results, tok, mode="sentence")
    assert all("<EOS>" in f.tokens for f in fused)
    # language ids preserved through fusion
    assert [f.lang_id for f in fused] == [0, 1]


def test_per_language_crf(tmp_path, multi_corpus):
    """Enhanced per-language CRF: one transition matrix per corpus,
    selected by lang_ids (sequence_tagger_model.py:391-415)."""
    tag_dict = multi_corpus.make_tag_dictionary("ner")
    tok = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0,
        num_languages=len(multi_corpus.corpora))
    eb = encode_batch(multi_corpus.train[:4], tok, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in eb.arrays().items()})
    # per-language transitions exist
    assert params["params"]["transitions"].shape[0] == 2
    trainer = FinetuneTrainer(model, params, multi_corpus, tok, tag_dict)
    result = trainer.train(tmp_path / "plc", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=8, max_epochs=10))
    assert np.isfinite(result["history"]["train_loss"]).all()
    # the two languages' transition matrices have diverged during training
    t = np.asarray(trainer.params["params"]["transitions"])
    assert np.abs(t[0] - t[1]).max() > 1e-4
    # prediction still runs (mixed-language batch)
    preds = trainer.predict(multi_corpus.train[:6])
    assert len(preds) == 6


def test_transition_attention(tmp_path, multi_corpus):
    """Attention-combined transitions (sequence_tagger_model.py:411-415,
    :1054-1063): per-sentence softmax mixture over the per-language
    matrices, predicted from pooled sentence features."""
    tag_dict = multi_corpus.make_tag_dictionary("ner")
    tok = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0,
        num_languages=len(multi_corpus.corpora),
        transition_attention=True)
    eb = encode_batch(multi_corpus.train[:4], tok, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in eb.arrays().items()})
    assert "sent_to_trans_att" in params["params"]
    trainer = FinetuneTrainer(model, params, multi_corpus, tok, tag_dict)
    result = trainer.train(tmp_path / "ta", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=8, max_epochs=10))
    hist = result["history"]["train_loss"]
    assert np.isfinite(hist).all() and hist[-1] < hist[0]
    preds = trainer.predict(multi_corpus.train[:6])
    assert len(preds) == 6
    # the mixed transitions keep the START/STOP constraints: decode never
    # emits the reserved tags
    reserved = {"<START>", "<STOP>"}
    assert not any(t in reserved for p in preds for t in p)
