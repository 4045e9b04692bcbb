"""HF checkpoint import parity: our Flax XLM-R must reproduce the torch
XLMRobertaModel's hidden states bit-for-bit (up to float tolerance) when
loading the same weights.

Uses a tiny randomly-initialized torch model constructed locally (no
network), saved with save_pretrained — the same artifact format as a real
xlm-roberta-base/large checkpoint directory.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kbner_tpu.models.xlmr import (  # noqa: E402
    XLMRConfig,
    XLMREncoder,
    load_hf_checkpoint,
)


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    cfg = transformers.XLMRobertaConfig(
        vocab_size=251, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg, add_pooling_layer=False)
    model.eval()
    d = tmp_path_factory.mktemp("hf_xlmr")
    model.save_pretrained(d)
    return d, model


def test_hf_import_hidden_state_parity(hf_model_dir):
    d, torch_model = hf_model_dir
    config = XLMRConfig.from_hf_config(d / "config.json",
                                       dtype=jnp.float32,
                                       hidden_dropout=0.0,
                                       attention_dropout=0.0)
    params = load_hf_checkpoint(d, config)

    rng = np.random.RandomState(0)
    ids = rng.randint(4, 250, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 9:] = 0
    ids[1, 9:] = 1  # pad token

    with torch.no_grad():
        torch_out = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    enc = XLMREncoder(config)
    ours, _ = enc.apply(params, jnp.asarray(ids.astype(np.int32)),
                        jnp.asarray(mask.astype(np.int32)))
    ours = np.asarray(ours)

    # compare at real (unpadded) positions
    np.testing.assert_allclose(ours[0], torch_out[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(ours[1, :9], torch_out[1, :9], atol=2e-4,
                               rtol=1e-3)


def test_hf_import_missing_weight_raises(hf_model_dir, tmp_path):
    d, _ = hf_model_dir
    import json
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(d, broken)
    # truncate the checkpoint: drop a required tensor
    from safetensors.numpy import load_file, save_file

    st = broken / "model.safetensors"
    state = load_file(st)
    state.pop("embeddings.word_embeddings.weight")
    save_file(state, st)
    cfg = XLMRConfig.from_hf_config(broken / "config.json")
    with pytest.raises(KeyError):
        load_hf_checkpoint(broken, cfg)


REAL_CKPT_ENV = "KBNER_HF_CHECKPOINT"
_REAL_DEFAULT_DIRS = ("models/xlm-roberta-large", "models/xlm-roberta-base")


def _find_real_checkpoint():
    import os
    from pathlib import Path

    cands = [os.environ[REAL_CKPT_ENV]] if REAL_CKPT_ENV in os.environ \
        else []
    root = Path(__file__).resolve().parents[1]
    cands += [str(root / d) for d in _REAL_DEFAULT_DIRS]
    for c in cands:
        p = Path(c)
        if (p / "config.json").exists() and (
                (p / "model.safetensors").exists()
                or (p / "pytorch_model.bin").exists()):
            return p
    return None


def test_hf_import_real_checkpoint_parity():
    """When a REAL base/large-shaped checkpoint directory is on disk
    (KBNER_HF_CHECKPOINT env or models/xlm-roberta-{large,base}), verify
    hidden-state parity against torch on it — the artifact the parity
    driver (cli parity --weights) will consume (VERDICT r3 #4b). Skips
    with an explicit message in this zero-egress environment when no
    checkpoint is present."""
    d = _find_real_checkpoint()
    if d is None:
        pytest.skip(
            "no real HF checkpoint on disk: set KBNER_HF_CHECKPOINT or "
            "place xlm-roberta-large under models/ (zero-egress env)")
    config = XLMRConfig.from_hf_config(d / "config.json",
                                       dtype=jnp.float32,
                                       hidden_dropout=0.0,
                                       attention_dropout=0.0)
    params = load_hf_checkpoint(d, config)
    torch_model = transformers.XLMRobertaModel.from_pretrained(
        d, add_pooling_layer=False)
    torch_model.eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(4, config.vocab_size - 2, size=(2, 16)).astype(
        np.int64)
    mask = np.ones((2, 16), dtype=np.int64)
    with torch.no_grad():
        torch_out = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    enc = XLMREncoder(config)
    ours, _ = enc.apply(params, jnp.asarray(ids.astype(np.int32)),
                        jnp.asarray(mask.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), torch_out, atol=5e-3,
                               rtol=1e-2)
