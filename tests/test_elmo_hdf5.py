"""Real-ELMo HDF5 weight import: golden-value parity vs a NumPy bilm.

VERDICT r3 #9: the reference's ACE configs stack allennlp ELMo
(embeddings.py:677-772) from ``elmo_*_weights.hdf5`` files. The import
path (ELMoEmbedder.load_hdf5 + bilm mode) is validated here against a
locally-constructed HDF5 in the exact bilm-tf layout, with an
independent NumPy implementation of the bilm-tf forward as the oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from kbner_tpu.models import ELMoEmbedder

CHAR_V, CHAR_D = 20, 4
FILTERS = ((1, 3), (2, 4), (3, 5))
N_HIGH = 2
PROJ, CELL, LAYERS = 5, 8, 2
N_FILT = sum(c for _, c in FILTERS)


def write_bilm_hdf5(path, rng):
    """Random weights in the bilm-tf layout allennlp consumes."""
    u = lambda *s: rng.uniform(-0.4, 0.4, size=s).astype(np.float32)
    with h5py.File(path, "w") as f:
        f["char_embed"] = u(CHAR_V, CHAR_D)
        for i, (w, ch) in enumerate(FILTERS):
            f[f"CNN/W_cnn_{i}"] = u(1, w, CHAR_D, ch)
            f[f"CNN/b_cnn_{i}"] = u(ch)
        for k in range(N_HIGH):
            f[f"CNN_high_{k}/W_carry"] = u(N_FILT, N_FILT)
            f[f"CNN_high_{k}/b_carry"] = u(N_FILT)
            f[f"CNN_high_{k}/W_transform"] = u(N_FILT, N_FILT)
            f[f"CNN_high_{k}/b_transform"] = u(N_FILT)
        f["CNN_proj/W_proj"] = u(N_FILT, PROJ)
        f["CNN_proj/b_proj"] = u(PROJ)
        for d in range(2):
            for layer in range(LAYERS):
                g = f"RNN_{d}/RNN/MultiRNNCell/Cell{layer}/LSTMCell"
                f[f"{g}/W_0"] = u(PROJ + PROJ, 4 * CELL)
                f[f"{g}/B"] = u(4 * CELL)
                f[f"{g}/W_P_0"] = u(CELL, PROJ)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_bilm(f, char_ids):
    """Independent bilm-tf forward (relu VALID convs + carry/transform
    highway + tf-order LSTMP with forget bias 1.0, clip 3, residual
    skips per direction)."""
    B, W, C = char_ids.shape
    E = np.asarray(f["char_embed"])
    x = E[char_ids.reshape(B * W, C)]  # [BW, C, cd]
    pooled = []
    for i, (w, ch) in enumerate(FILTERS):
        K = np.asarray(f[f"CNN/W_cnn_{i}"])[0]  # [w, cd, ch]
        b = np.asarray(f[f"CNN/b_cnn_{i}"])
        P = C - w + 1
        out = np.zeros((B * W, P, ch), np.float32)
        for p in range(P):
            acc = b.copy()
            for k in range(w):
                acc = acc + x[:, p + k] @ K[k]
            out[:, p] = acc
        pooled.append(np.maximum(out, 0.0).max(axis=1))
    tok = np.concatenate(pooled, axis=-1)
    for k in range(N_HIGH):
        g = sigmoid(tok @ np.asarray(f[f"CNN_high_{k}/W_carry"])
                    + np.asarray(f[f"CNN_high_{k}/b_carry"]))
        tr = np.maximum(
            tok @ np.asarray(f[f"CNN_high_{k}/W_transform"])
            + np.asarray(f[f"CNN_high_{k}/b_transform"]), 0.0)
        tok = g * tr + (1.0 - g) * tok
    tok = tok @ np.asarray(f["CNN_proj/W_proj"]) + np.asarray(
        f["CNN_proj/b_proj"])
    tok = tok.reshape(B, W, PROJ)

    def lstmp(seq, d, layer):
        g = f"RNN_{d}/RNN/MultiRNNCell/Cell{layer}/LSTMCell"
        Wm = np.asarray(f[f"{g}/W_0"])
        Bv = np.asarray(f[f"{g}/B"])
        Wp = np.asarray(f[f"{g}/W_P_0"])
        B_, T, _ = seq.shape
        c = np.zeros((B_, CELL), np.float32)
        h = np.zeros((B_, PROJ), np.float32)
        out = np.zeros((B_, T, PROJ), np.float32)
        for t in range(T):
            z = np.concatenate([seq[:, t], h], axis=-1) @ Wm + Bv
            i_, j, fg, o = np.split(z, 4, axis=-1)
            c = sigmoid(fg + 1.0) * c + sigmoid(i_) * np.tanh(j)
            c = np.clip(c, -3.0, 3.0)
            h = np.clip((sigmoid(o) * np.tanh(c)) @ Wp, -3.0, 3.0)
            out[:, t] = h
        return out

    layers = [np.concatenate([tok, tok], axis=-1)]
    h_f, h_b = tok, tok
    for layer in range(LAYERS):
        fwd = lstmp(h_f, 0, layer)
        bwd = lstmp(h_b[:, ::-1], 1, layer)[:, ::-1]
        layers.append(np.concatenate([fwd, bwd], axis=-1))
        h_f = fwd + h_f
        h_b = bwd + h_b
    return np.concatenate(layers, axis=-1)


def test_hdf5_import_golden(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "elmo_weights.hdf5"
    write_bilm_hdf5(path, rng)

    B, W, C = 2, 6, 7
    char_ids = rng.randint(0, CHAR_V, size=(B, W, C)).astype(np.int32)
    batch = {
        "char_ids": jnp.asarray(char_ids),
        "char_mask": jnp.ones((B, W, C), jnp.int32),
        "word_mask": jnp.ones((B, W), jnp.int32),
    }
    mod = ELMoEmbedder(
        char_vocab_size=CHAR_V, char_dim=CHAR_D, filters=FILTERS,
        n_highway=N_HIGH, proj_dim=PROJ, num_layers=LAYERS,
        mode="all", cell_dim=CELL, conv_activation="relu")
    params = mod.init(jax.random.PRNGKey(0), batch)
    loaded = ELMoEmbedder.load_hdf5(path, params)
    got = np.asarray(mod.apply(loaded, batch))

    with h5py.File(path, "r") as f:
        want = numpy_bilm(f, char_ids)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert got.shape == (B, W, 2 * PROJ * (LAYERS + 1))


def test_hdf5_import_shape_mismatch(tmp_path):
    rng = np.random.RandomState(1)
    path = tmp_path / "elmo_weights.hdf5"
    write_bilm_hdf5(path, rng)
    mod = ELMoEmbedder(
        char_vocab_size=CHAR_V, char_dim=CHAR_D, filters=FILTERS,
        n_highway=N_HIGH, proj_dim=PROJ + 1,  # wrong proj dim
        num_layers=LAYERS, mode="all", cell_dim=CELL,
        conv_activation="relu")
    batch = {
        "char_ids": jnp.zeros((1, 2, 3), jnp.int32),
        "char_mask": jnp.ones((1, 2, 3), jnp.int32),
        "word_mask": jnp.ones((1, 2), jnp.int32),
    }
    params = mod.init(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="vs model"):
        ELMoEmbedder.load_hdf5(path, params)


def test_cli_ace_elmo_weight_splice(tmp_path):
    """The ACE builder splices `weights:` HDF5 files into the stacked
    tagger's param tree at the right member (reference: ACE configs
    stacking pretrained ELMo, utils/ ACE recipes)."""
    import yaml

    from kbner_tpu.cli import _build_ace
    from kbner_tpu.config import ExperimentConfig
    from pathlib import Path

    FIX = Path(__file__).parent / "fixtures"
    raw = yaml.safe_load((FIX / "toy_config.yaml").read_text())
    raw["target_dir"] = str(tmp_path / "run")
    w = tmp_path / "elmo_weights.hdf5"
    write_bilm_hdf5(w, np.random.RandomState(3))
    raw["model"]["embeddings"] = [
        {"type": "word", "dim": 8},
        {"type": "elmo", "char_vocab_size": CHAR_V, "char_dim": CHAR_D,
         "proj_dim": PROJ, "num_layers": LAYERS, "cell_dim": CELL,
         "filters": [list(f) for f in FILTERS], "n_highway": N_HIGH,
         "weights": str(w)},
    ]
    p = tmp_path / "ace.yaml"
    p.write_text(yaml.safe_dump(raw))
    cfg = ExperimentConfig.from_file(p)
    corpus, trainer, specs = _build_ace(cfg)
    sub = trainer.params["params"]["stack"]["members_1"]
    with h5py.File(w, "r") as f:
        np.testing.assert_allclose(
            np.asarray(sub["chars"]["embedding"]),
            np.asarray(f["char_embed"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sub["fwd1"]["W_P_0"]),
            np.asarray(f["RNN_0/RNN/MultiRNNCell/Cell1/LSTMCell/W_P_0"]),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sub["bwd0"]["B"]),
            np.asarray(f["RNN_1/RNN/MultiRNNCell/Cell0/LSTMCell/B"]),
            rtol=1e-6)


def test_npz_roundtrip_bilm_mode(tmp_path):
    """The existing npz save/load keeps working for the bilm topology."""
    rng = np.random.RandomState(2)
    mod = ELMoEmbedder(
        char_vocab_size=CHAR_V, char_dim=CHAR_D, filters=FILTERS,
        n_highway=1, proj_dim=PROJ, num_layers=1, mode="top",
        cell_dim=CELL, conv_activation="relu")
    batch = {
        "char_ids": jnp.asarray(
            rng.randint(0, CHAR_V, size=(1, 3, 5)).astype(np.int32)),
        "char_mask": jnp.ones((1, 3, 5), jnp.int32),
        "word_mask": jnp.ones((1, 3), jnp.int32),
    }
    params = mod.init(jax.random.PRNGKey(0), batch)
    out1 = np.asarray(mod.apply(params, batch))
    p = tmp_path / "elmo.npz"
    ELMoEmbedder.save_npz(p, params)
    params2 = ELMoEmbedder.load_npz(p, params)
    out2 = np.asarray(mod.apply(params2, batch))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)
