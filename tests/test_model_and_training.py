"""Model + trainer integration tests on a tiny random-init config.

Follows the reference's test strategy (SURVEY.md §4): real end-to-end
mini-trainings on checked-in micro-corpora, train->save->load->predict
round-trips.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kbner_tpu.data import (
    HashTokenizer,
    encode_batch,
    load_column_corpus,
    read_column_file,
)
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.train import FinetuneTrainer, TrainConfig

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def toy_setup():
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    tokenizer = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    batch = encode_batch(corpus.train[:4], tokenizer, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch.arrays().items()})
    return corpus, tag_dict, tokenizer, cfg, model, params


def test_encode_batch_shapes(toy_setup):
    corpus, tag_dict, tokenizer, *_ = toy_setup
    eb = encode_batch(corpus.train[:4], tokenizer, tag_dict)
    B, S = eb.input_ids.shape
    _, W = eb.tag_ids.shape
    assert B == 4 and S % 16 == 0 and W % 8 == 0
    # first subtoken of each sentence is CLS at position 0; word 0 starts at 1
    assert (eb.word_starts[:, 0] == 1).all()
    # gold tags decode back to strings
    r0 = corpus.train[0]
    n0 = len(r0.tokens)
    decoded = [tag_dict.get_item_for_index(i) for i in eb.tag_ids[0, :n0]]
    assert decoded == r0.tags["ner"]


def test_context_sentences_masked(toy_setup):
    _, tag_dict, tokenizer, *_ = toy_setup
    recs = read_column_file(
        FIX / "ner_ctx" / "train.txt", {0: "text", 1: "ner"},
        comment_symbol="# id", tag_to_bioes="ner")
    eb = encode_batch(recs, tokenizer, tag_dict)
    rec = recs[0]
    eos = rec.eos_index
    n = len(rec.tokens)
    # context positions (>= eos) are excluded from the CRF
    assert (eb.crf_mask[0, :eos] == 1).all()
    assert (eb.crf_mask[0, eos:n] == 0).all()
    # <EOS> word maps to the tokenizer SEP id
    sep_pos = eb.word_starts[0, eos]
    assert eb.input_ids[0, sep_pos] == tokenizer.sep_id


def test_forward_and_loss_finite(toy_setup):
    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    eb = encode_batch(corpus.train[:4], tokenizer, tag_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    emissions = model.apply(
        params, arrays["input_ids"], arrays["attention_mask"],
        arrays["word_starts"], arrays["word_mask"])
    assert emissions.shape == (4, eb.tag_ids.shape[1], cfg.num_tags)
    loss = model.apply(params, arrays, deterministic=True, method=model.loss)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_decode_shape_and_validity(toy_setup):
    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    eb = encode_batch(corpus.train[:4], tokenizer, tag_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    tags, scores = model.apply(params, arrays, method=model.decode)
    assert tags.shape == eb.tag_ids.shape
    # decoded tags never include START/STOP at unmasked positions
    real = np.asarray(tags)[np.asarray(eb.crf_mask) == 1]
    assert not np.isin(real, [cfg.start_idx, cfg.stop_idx]).any()


def _copy(params):
    # the trainer's jitted train step donates its param buffers; give each
    # trainer its own copy so the module-scoped fixture stays alive
    return jax.tree_util.tree_map(lambda x: x.copy(), params)


def test_overfit_toy_corpus(tmp_path, toy_setup):
    """Minimum end-to-end slice: training memorizes the toy corpus."""
    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    trainer = FinetuneTrainer(model, _copy(params), corpus, tokenizer, tag_dict)
    out = trainer.train(tmp_path / "run", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=4, max_epochs=30,
        warmup_fraction=0.05, seed=1))
    metric, _ = trainer.evaluate(corpus.train)
    assert metric.micro_avg_f_score() == pytest.approx(1.0), str(metric)
    # save -> load -> identical predictions
    preds_before = trainer.predict(corpus.test)
    p = tmp_path / "model.msgpack"
    trainer.save(p)
    model2, params2 = init_tagger(
        cfg, jax.random.PRNGKey(42),
        {k: jnp.asarray(v) for k, v in
         encode_batch(corpus.train[:2], tokenizer, tag_dict).arrays().items()})
    trainer2 = FinetuneTrainer(model2, params2, corpus, tokenizer, tag_dict)
    trainer2.load(p)
    assert trainer2.predict(corpus.test) == preds_before


def test_adam_mu_bf16_trains(tmp_path, toy_setup):
    """adam_mu_bf16 stores the first moment in bfloat16 (halving its HBM
    at 550M-param scale) and still memorizes the toy corpus."""
    from kbner_tpu.train.optim import make_finetune_optimizer

    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    tx = make_finetune_optimizer(
        params, lr=1e-3, lr_rate=1.0, mu_dtype=jnp.bfloat16)
    opt_state = tx.init(params)
    mus = [leaf for path, leaf in jax.tree_util.tree_leaves_with_path(
        opt_state) if any(getattr(k, "name", "") == "mu" for k in path)]
    assert mus and all(m.dtype == jnp.bfloat16 for m in mus)

    trainer = FinetuneTrainer(
        model, _copy(params), corpus, tokenizer, tag_dict)
    trainer.train(tmp_path / "run", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=4, max_epochs=30,
        warmup_fraction=0.05, seed=1, adam_mu_bf16=True))
    metric, _ = trainer.evaluate(corpus.train)
    assert metric.micro_avg_f_score() == pytest.approx(1.0), str(metric)


def test_encoder_export_roundtrip(tmp_path, toy_setup):
    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    trainer = FinetuneTrainer(model, _copy(params), corpus, tokenizer, tag_dict)
    p = tmp_path / "enc.msgpack"
    trainer.save_encoder(p)
    # mutate encoder, reload, check restored
    before = trainer.params["params"]["encoder"]["word_embeddings"]["embedding"]
    trainer.params["params"]["encoder"]["word_embeddings"]["embedding"] = (
        before + 1.0)
    trainer.load_encoder(p)
    after = trainer.params["params"]["encoder"]["word_embeddings"]["embedding"]
    np.testing.assert_allclose(np.asarray(after), np.asarray(before))


def test_posterior_decode(toy_setup):
    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    eb = encode_batch(corpus.train[:4], tokenizer, tag_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    tags_v, _ = model.apply(params, arrays, method=model.decode)
    tags_p, score_p = model.apply(params, arrays, posterior=True,
                                  method=model.decode)
    assert tags_p.shape == tags_v.shape
    # posterior argmax is a valid tagging: no START/STOP at real positions
    real = np.asarray(tags_p)[np.asarray(eb.crf_mask) == 1]
    assert not np.isin(real, [cfg.start_idx, cfg.stop_idx]).any()
    assert np.isfinite(np.asarray(score_p)).all()


def test_devless_best_model_is_lowest_loss(tmp_path, toy_setup):
    """Without dev sets, selection falls back to train loss — the best
    model must be the LOWEST-loss epoch (trainer previously kept the
    highest, i.e. the first epoch)."""
    from kbner_tpu.data.conll import Corpus

    corpus, tag_dict, tokenizer, cfg, model, params = toy_setup
    nodev = Corpus(train=list(corpus.train), dev=[], test=[], name="nodev")
    trainer = FinetuneTrainer(
        model, _copy(params), nodev, tokenizer, tag_dict)
    out = trainer.train(tmp_path / "run", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=4, max_epochs=6,
        warmup_fraction=0.05, seed=1))
    hist = out["history"]
    assert len(hist["train_loss"]) == 6
    # selection score is -train_loss: best == lowest loss, not first epoch
    assert out["best_dev_score"] == max(hist["dev_score"])
    assert -out["best_dev_score"] == pytest.approx(min(hist["train_loss"]))
    best_epoch = int(np.argmax(hist["dev_score"]))
    assert best_epoch != 0 or np.argmin(hist["train_loss"]) == 0
    if best_epoch == len(hist["train_loss"]) - 1:
        # best saved at the final epoch -> identical to final-model
        assert ((tmp_path / "run" / "best-model.msgpack").read_bytes()
                == (tmp_path / "run" / "final-model.msgpack").read_bytes())
