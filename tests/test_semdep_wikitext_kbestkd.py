"""Semantic-dep parser, wikitext extraction, k-best KD trainer, remat."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kbner_tpu.data import Dictionary, HashTokenizer, encode_batch, \
    load_column_corpus
from kbner_tpu.data.conll import SentenceRecord
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.models.biaffine import (
    SemanticDependencyParser,
    SemDepConfig,
    encode_semdep_arrays,
)
from kbner_tpu.retrieval.wikitext import (
    insert_anchors,
    paragraphs_to_jsonl,
    split_sentences,
    strip_anchors,
)
from kbner_tpu.train.distill import DistillationTrainer, DistillConfig

TOK = HashTokenizer(vocab_size=997)
FIX = Path(__file__).parent / "fixtures"


# -- semantic dependencies -------------------------------------------------------

def semdep_batch():
    recs = [
        SentenceRecord(
            tokens=["A", "B", "C"],
            tags={"deps": ["2:det", "3:nsubj|0:root", "0:root"]}),
        SentenceRecord(
            tokens=["X", "Y"],
            tags={"deps": ["2:mod", "0:root"]}),
    ]
    rd = Dictionary()
    for r in ("det", "nsubj", "root", "mod"):
        rd.add_item(r)
    eb = encode_batch(recs, TOK, None)
    encode_semdep_arrays(eb, rel_dict=rd)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    return eb, arrays, rd


def test_encode_semdep_multihead():
    eb, arrays, rd = semdep_batch()
    # token B (index 1) has two heads: 3 and 0
    assert eb.extra["arc_matrix"][0, 1, 3] == 1
    assert eb.extra["arc_matrix"][0, 1, 0] == 1
    assert eb.extra["rel_matrix"][0, 1, 0] == rd.get_idx_for_item("root")


def test_semdep_parser_overfits():
    eb, arrays, rd = semdep_batch()
    cfg = SemDepConfig(encoder=XLMRConfig.tiny(vocab_size=1000),
                       num_rels=len(rd), arc_dim=32, rel_dim=16)
    model = SemanticDependencyParser(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(lambda pp: model.apply(
            pp, arrays, deterministic=True, method=model.loss))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    for _ in range(200):
        params, opt, loss = step(params, opt)
    arcs, rels = model.apply(params, arrays, method=model.decode)
    arcs = np.asarray(arcs)
    gold = np.asarray(semdep_batch()[0].extra["arc_matrix"])
    # learned arcs match gold on real positions
    np.testing.assert_array_equal(arcs[0, :3], gold[0, :3])
    np.testing.assert_array_equal(arcs[1, :2], gold[1, :2])


# -- wikitext --------------------------------------------------------------------

def test_insert_and_strip_anchors():
    para = "Berlin is the capital of Germany."
    anchors = [("Berlin", 0, 6), ("Germany", 25, 32)]
    marked = insert_anchors(para, anchors)
    assert marked == ("<e:Berlin>Berlin</e> is the capital of "
                      "<e:Germany>Germany</e>.")
    assert strip_anchors(marked) == para


def test_split_sentences_en_zh():
    en = "First sentence. Second one! Is this third? yes."
    parts = split_sentences(en, "en")
    assert parts[0] == "First sentence." and len(parts) >= 3
    zh = "今天天气很好。我们去公园吧！好的？"
    zparts = split_sentences(zh, "zh")
    assert zparts == ["今天天气很好。", "我们去公园吧！", "好的？"]


def test_paragraphs_to_jsonl_roundtrip(tmp_path):
    recs = [
        {"title": "Berlin", "url": "u1",
         "paragraph": "Berlin is big. It is in Germany.",
         "anchors": [("Germany", 24, 31)]},
        {"title": "Dup", "url": "u2",
         "paragraph": "Berlin is big. It is in Germany."},  # deduped
    ]
    out = tmp_path / "kb.jsonl"
    n = paragraphs_to_jsonl(recs, out, lang="en")
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert n == len(lines) == 2  # two sentences, second record deduped
    assert lines[0]["title"] == "Berlin"
    assert "<e:Germany>" in lines[1]["sentence"] or \
        "<e:Germany>" in lines[1]["paragraph"]

    # consumable by the KB builder
    from kbner_tpu.retrieval.pipeline import build_kb_from_jsonl

    text_index, store, title_index = build_kb_from_jsonl(out)
    assert text_index.n_docs == 2


# -- k-best KD + remat -------------------------------------------------------------

def test_kbest_distillation_trainer(tmp_path):
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    eb = encode_batch(corpus.train[:2], TOK, tag_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    s_model, s_params = init_tagger(cfg, jax.random.PRNGKey(0), arrays)
    t_model, t_params = init_tagger(cfg, jax.random.PRNGKey(7), arrays)
    trainer = DistillationTrainer(
        s_model, s_params, corpus, TOK, tag_dict,
        teachers=[(t_model, t_params)])
    result = trainer.train(tmp_path / "kbkd", DistillConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=8, max_epochs=2,
        kbest=3, interpolation=0.5))
    assert np.isfinite(result["history"]["train_loss"]).all()


def test_remat_encoder_gradients_match():
    cfg_plain = XLMRConfig.tiny(vocab_size=300)
    import dataclasses

    cfg_remat = dataclasses.replace(cfg_plain, remat=True)
    from kbner_tpu.models.xlmr import XLMREncoder

    ids = jnp.asarray(np.random.RandomState(0).randint(4, 299, (2, 16)))
    mask = jnp.ones((2, 16), jnp.int32)

    def loss_with(cfg, params):
        enc = XLMREncoder(cfg)
        hidden, _ = enc.apply(params, ids, mask)
        return jnp.sum(hidden ** 2)

    enc_plain = XLMREncoder(cfg_plain)
    params = enc_plain.init(jax.random.PRNGKey(0), ids, mask)
    g_plain = jax.grad(lambda p: loss_with(cfg_plain, p))(params)
    g_remat = jax.grad(lambda p: loss_with(cfg_remat, p))(params)
    a = jax.tree_util.tree_leaves(g_plain)
    b = jax.tree_util.tree_leaves(g_remat)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
