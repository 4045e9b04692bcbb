"""Biaffine dependency parser, MST decode, and span-NER (NER-DP) tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kbner_tpu.data import Dictionary, HashTokenizer, encode_batch
from kbner_tpu.data.conll import SentenceRecord
from kbner_tpu.models import XLMRConfig
from kbner_tpu.models.biaffine import (
    BiaffineConfig,
    BiaffineNER,
    BiaffineNERConfig,
    BiaffineParser,
    chu_liu_edmonds,
    encode_dependency_arrays,
    encode_span_labels,
    mst_decode,
)

TOK = HashTokenizer(vocab_size=997)

# tiny UD-style sentences: tokens, heads (1-indexed into sentence, 0=root), rels
DEP_DATA = [
    (["The", "dog", "barks"], [2, 3, 0], ["det", "nsubj", "root"]),
    (["Dogs", "bark"], [2, 0], ["nsubj", "root"]),
    (["A", "cat", "sleeps", "here"], [2, 3, 0, 3],
     ["det", "nsubj", "root", "advmod"]),
]


def make_dep_batch():
    recs = [
        SentenceRecord(tokens=t,
                       tags={"head": [str(h) for h in hs], "deprel": rs})
        for t, hs, rs in DEP_DATA
    ]
    rel_dict = Dictionary()
    for _, _, rs in DEP_DATA:
        for r in rs:
            rel_dict.add_item(r)
    eb = encode_batch(recs, TOK, None)
    encode_dependency_arrays(eb, rel_dict=rel_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    return eb, arrays, rel_dict


def test_encode_dependency_arrays():
    eb, arrays, rel_dict = make_dep_batch()
    assert eb.extra["heads"][0, :3].tolist() == [2, 3, 0]
    assert eb.extra["rel_ids"][0, 2] == rel_dict.get_idx_for_item("root")


def test_parser_loss_and_overfit():
    eb, arrays, rel_dict = make_dep_batch()
    cfg = BiaffineConfig(
        encoder=XLMRConfig.tiny(vocab_size=1000), num_rels=len(rel_dict),
        arc_dim=32, rel_dim=16)
    model = BiaffineParser(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda pp: model.apply(pp, arrays, deterministic=True,
                                   method=model.loss))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, loss

    losses = []
    for _ in range(150):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3

    heads, rels = model.apply(params, arrays, method=model.decode)
    heads = np.asarray(heads)
    for b, (toks, gold_heads, _) in enumerate(DEP_DATA):
        assert heads[b, : len(toks)].tolist() == gold_heads


def test_parser_tree_crf_loss_overfit_and_marginals():
    """arc_loss='crf' (projective tree CRF NLL) trains to the gold trees,
    and marginals are a proper head distribution per word."""
    eb, arrays, rel_dict = make_dep_batch()
    cfg = BiaffineConfig(
        encoder=XLMRConfig.tiny(vocab_size=1000), num_rels=len(rel_dict),
        arc_dim=32, rel_dim=16, arc_loss="crf")
    model = BiaffineParser(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda pp: model.apply(pp, arrays, deterministic=True,
                                   method=model.loss))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, loss

    losses = []
    for _ in range(150):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.3

    heads, _ = model.apply(params, arrays, method=model.decode)
    heads = np.asarray(heads)
    for b, (toks, gold_heads, _) in enumerate(DEP_DATA):
        assert heads[b, : len(toks)].tolist() == gold_heads

    marg = np.asarray(model.apply(params, arrays, method=model.marginals))
    wm = np.asarray(eb.word_mask)
    for b in range(wm.shape[0]):
        L = int(wm[b].sum())
        np.testing.assert_allclose(
            marg[b, 1: L + 1].sum(axis=1), 1.0, atol=1e-3)
        # trained model concentrates mass on the gold arcs
        assert marg[b, 1: L + 1].argmax(axis=1).tolist() == DEP_DATA[b][1]


def test_parser_partial_annotation_loss():
    """partial=True marginalizes words with head < 0 instead of scoring
    them (reference crf partial branch)."""
    eb, arrays, rel_dict = make_dep_batch()
    heads = np.asarray(arrays["heads"]).copy()
    heads[:, 0] = -1  # first word unannotated everywhere
    rel_ids = np.asarray(arrays["rel_ids"]).copy()
    arrays = dict(arrays)
    arrays["heads"] = jnp.asarray(heads)
    arrays["rel_ids"] = jnp.asarray(rel_ids)
    cfg = BiaffineConfig(
        encoder=XLMRConfig.tiny(vocab_size=1000), num_rels=len(rel_dict),
        arc_dim=32, rel_dim=16, arc_loss="crf", partial=True)
    model = BiaffineParser(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    loss = float(model.apply(params, arrays, deterministic=True,
                             method=model.loss))
    assert np.isfinite(loss) and loss > -1e-4
    g = jax.grad(lambda p: model.apply(
        p, arrays, deterministic=True, method=model.loss))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_chu_liu_edmonds_breaks_cycles():
    # greedy argmax creates a 1<->2 cycle; MST must break it
    s = np.full((3, 3), -1e9)
    s[1, 2] = 10.0
    s[2, 1] = 10.0
    s[1, 0] = 5.0
    s[2, 0] = 4.0
    heads = chu_liu_edmonds(s)
    assert heads[0] == 0
    # exactly one node attaches to ROOT; no cycle remains
    attached_to_root = [d for d in (1, 2) if heads[d] == 0]
    assert len(attached_to_root) == 1
    other = 3 - attached_to_root[0]
    assert heads[other] in (0, attached_to_root[0])


def test_mst_decode_shapes():
    eb, arrays, rel_dict = make_dep_batch()
    B, W = eb.word_mask.shape
    s_arc = np.random.RandomState(0).randn(B, W + 1, W + 1)
    heads = mst_decode(s_arc, eb.word_mask)
    assert heads.shape == (B, W)
    for b in range(B):
        n = int(eb.word_mask[b].sum())
        assert (heads[b, :n] <= n).all()


def test_biaffine_ner_span_labels_and_loss():
    recs = [
        SentenceRecord(tokens=["Alice", "visited", "Berlin"],
                       tags={"ner": ["S-PER", "O", "S-LOC"]}),
        SentenceRecord(tokens=["Acme", "Corp", "is", "here"],
                       tags={"ner": ["B-ORG", "E-ORG", "O", "O"]}),
    ]
    label_dict = Dictionary()
    label_dict.add_item("O")
    for lbl in ("PER", "LOC", "ORG"):
        label_dict.add_item(lbl)
    eb = encode_batch(recs, TOK, None)
    encode_span_labels(eb, label_dict=label_dict)
    assert eb.extra["span_labels"][0, 0, 0] == \
        label_dict.get_idx_for_item("PER")
    assert eb.extra["span_labels"][1, 0, 1] == \
        label_dict.get_idx_for_item("ORG")

    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    cfg = BiaffineNERConfig(
        encoder=XLMRConfig.tiny(vocab_size=1000),
        num_labels=len(label_dict), span_dim=16)
    model = BiaffineNER(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, arrays,
                        method=model.loss)
    loss = model.apply(params, arrays, deterministic=True, method=model.loss)
    assert np.isfinite(float(loss))
    spans = model.apply(params, arrays, method=model.decode)
    assert len(spans) == 2  # untrained output, structure only
