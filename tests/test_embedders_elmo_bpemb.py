"""ELMo-architecture and byte-pair embedders (the classic-embedding long
tail: reference ``ELMoEmbeddings`` embeddings.py:1212 and
``BytePairEmbeddings`` — VERDICT r2 missing under component #14)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from kbner_tpu.data import HashTokenizer, encode_batch, load_column_corpus
from kbner_tpu.data.encode import add_classic_features, build_char_vocab
from kbner_tpu.models.embedders import BPEmbEmbedder, BPEVocab, ELMoEmbedder

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def setup():
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id")
    tag_dict = corpus.make_tag_dictionary("ner")
    tokenizer = HashTokenizer(vocab_size=997)
    char_vocab = build_char_vocab(corpus.train)
    bpe_vocab = BPEVocab.build(corpus.train, dim=8, max_words=50)
    eb = encode_batch(corpus.train[:4], tokenizer, tag_dict)
    add_classic_features(eb, None, char_vocab, bpe_vocab=bpe_vocab)
    arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
    return corpus, char_vocab, bpe_vocab, eb, arrays


# -- ELMo ----------------------------------------------------------------------

def test_elmo_shapes_and_masking(setup):
    corpus, cv, bv, eb, arrays = setup
    B, W = eb.word_mask.shape
    mod = ELMoEmbedder(char_vocab_size=len(cv), char_dim=8, proj_dim=8,
                       filters=((1, 8), (2, 8)), num_layers=2)
    params = mod.init(jax.random.PRNGKey(0), arrays)
    out = mod.apply(params, arrays)
    # mode="all": token layer + 2 LSTM layers, each 2*proj wide
    assert out.shape == (B, W, 2 * 8 * 3)
    # padded word positions are exactly zero
    pad = np.asarray(out)[np.asarray(eb.word_mask) == 0]
    assert pad.size > 0 and np.all(pad == 0.0)
    # real positions are not all zero
    real = np.asarray(out)[np.asarray(eb.word_mask) == 1]
    assert np.abs(real).max() > 0


@pytest.mark.parametrize("mode,dim_mult", [
    ("top", 1), ("average", 1), ("mix", 1), ("all", 3)])
def test_elmo_modes(setup, mode, dim_mult):
    corpus, cv, bv, eb, arrays = setup
    B, W = eb.word_mask.shape
    mod = ELMoEmbedder(char_vocab_size=len(cv), char_dim=4, proj_dim=4,
                       filters=((1, 4),), num_layers=2, mode=mode)
    assert mod.out_dim == 2 * 4 * dim_mult
    params = mod.init(jax.random.PRNGKey(0), arrays)
    out = mod.apply(params, arrays)
    assert out.shape == (B, W, mod.out_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_elmo_npz_roundtrip(setup, tmp_path):
    """Pretrained-weight path: save params to npz, reload, identical
    outputs (the zero-egress stand-in for the allennlp weight files)."""
    corpus, cv, bv, eb, arrays = setup
    mod = ELMoEmbedder(char_vocab_size=len(cv), char_dim=4, proj_dim=4,
                       filters=((1, 4), (2, 4)), num_layers=1)
    params = mod.init(jax.random.PRNGKey(1), arrays)
    out0 = mod.apply(params, arrays)

    path = tmp_path / "elmo.npz"
    ELMoEmbedder.save_npz(path, params)
    params2 = mod.init(jax.random.PRNGKey(2), arrays)  # different init
    restored = ELMoEmbedder.load_npz(path, params2)
    out1 = mod.apply(restored, arrays)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-6, atol=1e-6)


def test_elmo_context_sensitivity(setup):
    """Same word in different sentence contexts gets different vectors —
    the property that distinguishes ELMo from static word vectors."""
    corpus, cv, bv, eb, arrays = setup
    mod = ELMoEmbedder(char_vocab_size=len(cv), char_dim=8, proj_dim=8,
                       filters=((1, 8),), num_layers=1, mode="top")
    params = mod.init(jax.random.PRNGKey(0), arrays)

    # two fake sentences sharing token index 0's char ids but with
    # different following words
    a = {k: np.asarray(v).copy() for k, v in arrays.items()}
    b = {k: np.asarray(v).copy() for k, v in arrays.items()}
    b["char_ids"][0, 1:] = b["char_ids"][1, 1:]
    b["char_mask"][0, 1:] = b["char_mask"][1, 1:]
    oa = mod.apply(params, {k: jnp.asarray(v) for k, v in a.items()})
    ob = mod.apply(params, {k: jnp.asarray(v) for k, v in b.items()})
    assert not np.allclose(np.asarray(oa)[0, 0], np.asarray(ob)[0, 0])


# -- BPEmb ---------------------------------------------------------------------

def test_bpe_vocab_build_and_segment(setup):
    corpus, cv, bv, eb, arrays = setup
    # a frequent whole word segments to its single ▁word piece
    tok = corpus.train[0].tokens[0]
    ids = bv.segment(tok)
    assert len(ids) >= 1
    inv = {v: k for k, v in bv.pieces.items()}
    joined = "".join(inv[i] for i in ids if i != 0)
    assert joined == "▁" + tok.lower()
    # unseen chars fall back to <unk>, never empty
    assert bv.segment("ωωω") == [0, 0, 0] or 0 in bv.segment("ωωω")
    assert bv.segment("") == [0] or len(bv.segment("")) >= 1


def test_bpe_first_last_ids(setup):
    corpus, cv, bv, eb, arrays = setup
    B, W = eb.word_mask.shape
    assert eb.extra["bpe_first_ids"].shape == (B, W)
    assert eb.extra["bpe_last_ids"].shape == (B, W)
    rec = corpus.train[0]
    for w, tok in enumerate(rec.tokens[:W]):
        ids = bv.segment(tok)
        assert eb.extra["bpe_first_ids"][0, w] == ids[0]
        assert eb.extra["bpe_last_ids"][0, w] == ids[-1]


def test_bpemb_embedder_forward(setup):
    corpus, cv, bv, eb, arrays = setup
    B, W = eb.word_mask.shape
    mod = BPEmbEmbedder(piece_vocab_size=len(bv.pieces), dim=bv.dim)
    params = mod.init(jax.random.PRNGKey(0), arrays)
    out = mod.apply(params, arrays)
    assert out.shape == (B, W, 2 * bv.dim)

    frozen = BPEmbEmbedder(piece_vocab_size=len(bv.pieces), dim=bv.dim,
                           trainable=False)
    fp = frozen.init(jax.random.PRNGKey(0), arrays)
    grads = jax.grad(
        lambda p: jnp.sum(frozen.apply(p, arrays)))(fp)
    table = jax.tree_util.tree_leaves(grads)[0]
    assert np.all(np.asarray(table) == 0.0)  # stop_gradient honored


def test_bpe_vocab_from_w2v_text(tmp_path):
    """Real bpemb vectors are w2v text files of ▁-prefixed pieces."""
    path = tmp_path / "bpe.vec"
    path.write_text("3 4\n<unk> 0 0 0 0\n▁the 1 2 3 4\nhe 5 6 7 8\n")
    bv = BPEVocab.from_w2v_text(path)
    assert bv.dim == 4
    assert bv.segment("the") == [bv.pieces["▁the"]]
    np.testing.assert_allclose(bv.matrix[bv.pieces["▁the"]], [1, 2, 3, 4])


# -- CLI stack integration -----------------------------------------------------

def test_cli_ace_stack_with_elmo_bpemb(tmp_path):
    """`elmo` and `bpemb` are selectable stack members in the ACE config
    surface and train end-to-end through the CLI."""
    from kbner_tpu import cli

    raw = yaml.safe_load((FIX / "toy_config.yaml").read_text())
    raw["corpora"][0]["data_folder"] = str(FIX / "ner_toy")
    raw["corpora"][0]["test_file"] = "train.txt"
    raw["name"] = "elmo_bpemb"
    raw["target_dir"] = str(tmp_path / "run")
    raw["trainer"] = "ReinforcementTrainer"
    raw["model"]["embeddings"] = [
        {"type": "elmo", "char_dim": 8, "proj_dim": 8, "num_layers": 1},
        {"type": "bpemb", "dim": 8},
    ]
    raw["ace"] = {"episodes": 2}
    raw["train"]["max_epochs"] = 8
    raw["train"]["learning_rate"] = 0.05
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(raw))
    cli.main(["train", "--config", str(p)])
    run = Path(raw["target_dir"])
    assert (run / "best-model.msgpack").exists()
