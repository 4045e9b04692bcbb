"""Sharded-vs-unsharded training equivalence: the mesh changes where the
math runs, never what it computes."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kbner_tpu.data import HashTokenizer, encode_batch, load_column_corpus
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.parallel import make_mesh, pad_batch_for_mesh, shard_batch
from kbner_tpu.parallel.sharding_rules import shard_params

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def setup():
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    tok = HashTokenizer(vocab_size=997)
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    eb = encode_batch(corpus.train, tok, tag_dict)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    model, params = init_tagger(cfg, jax.random.PRNGKey(0), arrays)
    return model, params, eb


def test_loss_identical_across_meshes(setup):
    model, params, eb = setup

    def loss_fn(p, b):
        return model.apply(p, b, deterministic=True, method=model.loss)

    # single device
    base = float(jax.jit(loss_fn)(
        params, {k: jnp.asarray(v) for k, v in eb.arrays().items()}))

    # 8-way data parallel
    mesh_dp = make_mesh(data=8, model=1)
    batch_dp = shard_batch(pad_batch_for_mesh(eb.arrays(), mesh_dp), mesh_dp)
    dp = float(jax.jit(loss_fn)(jax.device_put(
        params, jax.sharding.NamedSharding(
            mesh_dp, jax.sharding.PartitionSpec())), batch_dp))

    # 4x2 data x model (tensor parallel encoder)
    mesh_tp = make_mesh(data=4, model=2)
    batch_tp = shard_batch(pad_batch_for_mesh(eb.arrays(), mesh_tp), mesh_tp)
    tp = float(jax.jit(loss_fn)(shard_params(params, mesh_tp), batch_tp))

    # same mesh + FSDP weight sharding over 'data' (ZeRO-3-style): the
    # layout changes, the loss must not
    fsdp = float(jax.jit(loss_fn)(
        shard_params(params, mesh_tp, fsdp=True), batch_tp))
    assert fsdp == pytest.approx(tp, rel=1e-4)

    # padding rows have zero word_mask/crf_mask; with mean-per-sentence CRF
    # NLL the padded rows contribute zero-score sentences, so compare on the
    # unpadded batch only when B divides evenly
    B = eb.num_sentences
    if B % 8 == 0:
        assert dp == pytest.approx(base, rel=1e-4)
    assert tp == pytest.approx(dp, rel=1e-4)


def test_gradients_identical_dp_vs_tp(setup):
    model, params, eb = setup
    arrays = pad_batch_for_mesh(eb.arrays(), make_mesh(data=8, model=1))

    def loss_fn(p, b):
        return model.apply(p, b, deterministic=True, method=model.loss)

    mesh_dp = make_mesh(data=8, model=1)
    mesh_tp = make_mesh(data=4, model=2)
    g_dp = jax.jit(jax.grad(loss_fn))(
        jax.device_put(params, jax.sharding.NamedSharding(
            mesh_dp, jax.sharding.PartitionSpec())),
        shard_batch(arrays, mesh_dp))
    g_tp = jax.jit(jax.grad(loss_fn))(
        shard_params(params, mesh_tp), shard_batch(arrays, mesh_tp))
    a = jax.tree_util.tree_leaves(g_dp)
    b = jax.tree_util.tree_leaves(g_tp)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-3, atol=1e-5)
