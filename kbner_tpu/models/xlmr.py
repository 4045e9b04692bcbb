"""XLM-RoBERTa encoder in Flax — the workhorse embedding model.

Replaces the reference's ``TransformerWordEmbeddings`` HF/torch path
(``/root/reference/flair/embeddings.py:2906-3910``) with a from-scratch Flax
implementation designed for TPU:

  - bfloat16 activations / float32 params by default (MXU-friendly),
  - static shapes everywhere; attention masks handle padding,
  - RoBERTa position-id convention (pad offset) reproduced exactly so HF
    ``xlm-roberta-base/large`` checkpoints load bit-compatibly,
  - weight import from HF PyTorch/safetensors checkpoints on disk (zero-egress
    environments can't call ``from_pretrained`` on a hub name).

Sharding: parameters are annotated with logical axis names via
``flax.linen.Partitioned``-free plain trees; the mesh rules in
``kbner_tpu.parallel`` map hidden/mlp axes to the 'model' mesh axis for
tensor parallelism and batch to 'data'.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class XLMRConfig:
    vocab_size: int = 250002
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Any = jnp.bfloat16  # activation dtype
    # rematerialize each encoder layer in the backward pass (activation
    # checkpointing): trades recompute FLOPs for HBM, the standard recipe
    # for fine-tuning xlm-roberta-large on 16 GB chips
    remat: bool = False
    # optional jax.checkpoint_policies name (e.g.
    # "dots_with_no_batch_dims_saveable" keeps matmul outputs and only
    # recomputes the cheap elementwise/softmax work — most of full
    # remat's HBM saving at a fraction of its recompute FLOPs)
    remat_policy: Optional[str] = None

    @classmethod
    def base(cls, **kw) -> "XLMRConfig":
        return cls(**kw)

    @classmethod
    def large(cls, **kw) -> "XLMRConfig":
        return cls(hidden_size=1024, num_layers=24, num_heads=16,
                   intermediate_size=4096, **kw)

    @classmethod
    def tiny(cls, **kw) -> "XLMRConfig":
        """Tiny config for tests (random init, CPU-runnable)."""
        defaults = dict(vocab_size=1000, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        max_position_embeddings=130, dtype=jnp.float32,
                        hidden_dropout=0.0, attention_dropout=0.0)
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def from_hf_config(cls, path: Path, **kw) -> "XLMRConfig":
        """Build from a HF ``config.json`` on disk. Explicit ``kw`` wins
        over the file (callers may override e.g. remat; a duplicated
        ``vocab_size`` must not raise)."""
        hf = json.loads(Path(path).read_text())
        fields = dict(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=hf.get("type_vocab_size", 1),
            pad_token_id=hf.get("pad_token_id", 1),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        )
        fields.update(kw)
        return cls(**fields)


class SelfAttention(nn.Module):
    config: XLMRConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.hidden_size, dtype=cfg.dtype, name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        B, S, _ = hidden.shape
        shape = (B, S, cfg.num_heads, head_dim)
        q = q.reshape(shape)
        k = k.reshape(shape)
        v = v.reshape(shape)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        scores = scores + attn_bias  # [B, 1, 1, S] additive mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out")(ctx)
        return out


class EncoderLayer(nn.Module):
    config: XLMRConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool):
        cfg = self.config
        attn_out = SelfAttention(cfg, name="attention")(
            hidden, attn_bias, deterministic)
        attn_out = nn.Dropout(cfg.hidden_dropout)(
            attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              name="attention_ln")(hidden + attn_out)
        mlp = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                       name="intermediate")(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(mlp)
        mlp = nn.Dropout(cfg.hidden_dropout)(mlp, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              name="output_ln")(hidden + mlp)
        return hidden


class XLMREncoder(nn.Module):
    """RoBERTa-style encoder returning all hidden states.

    ``__call__`` returns ``(last_hidden [B,S,H], all_hidden [L+1,B,S,H])``;
    the per-layer stack feeds ScalarMix-style layer pooling
    (reference ``embeddings.py:1445-1502``).
    """

    config: XLMRConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, S] int32
        attention_mask: jnp.ndarray,  # [B, S] int32/bool
        deterministic: bool = True,
        output_hidden_states: bool = False,
    ):
        cfg = self.config
        mask = attention_mask.astype(jnp.int32)

        word_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                            dtype=cfg.dtype, name="word_embeddings")(input_ids)
        # RoBERTa position ids: pad positions get pad_token_id; real tokens
        # get cumsum offset by pad_token_id (matches fairseq/HF exactly).
        position_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        pos_emb = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                           dtype=cfg.dtype, name="position_embeddings")(position_ids)
        type_emb = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            dtype=cfg.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        hidden = word_emb + pos_emb + type_emb
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              name="embeddings_ln")(hidden)
        hidden = nn.Dropout(cfg.hidden_dropout)(
            hidden, deterministic=deterministic)

        attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(
            cfg.dtype)

        layer_cls = EncoderLayer
        if cfg.remat:
            # static_argnums indexes the bound method's args with self at 0:
            # (self, hidden, attn_bias, deterministic) -> deterministic is 3
            policy = (getattr(jax.checkpoint_policies, cfg.remat_policy)
                      if cfg.remat_policy else None)
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,),
                                 policy=policy)

        all_hidden = [hidden] if output_hidden_states else None
        for i in range(cfg.num_layers):
            hidden = layer_cls(cfg, name=f"layer_{i}")(
                hidden, attn_bias, deterministic)
            if output_hidden_states:
                all_hidden.append(hidden)

        if output_hidden_states:
            return hidden, jnp.stack(all_hidden, axis=0)
        return hidden, None


# -- HF checkpoint import -----------------------------------------------------

def _hf_key_map(num_layers: int) -> Dict[str, str]:
    """Map HF ``roberta.*`` state-dict keys -> our param tree paths."""
    m = {
        "embeddings.word_embeddings.weight": "word_embeddings/embedding",
        "embeddings.position_embeddings.weight": "position_embeddings/embedding",
        "embeddings.token_type_embeddings.weight": "token_type_embeddings/embedding",
        "embeddings.LayerNorm.weight": "embeddings_ln/scale",
        "embeddings.LayerNorm.bias": "embeddings_ln/bias",
    }
    for i in range(num_layers):
        src = f"encoder.layer.{i}"
        dst = f"layer_{i}"
        for qkv in ("query", "key", "value"):
            m[f"{src}.attention.self.{qkv}.weight"] = f"{dst}/attention/{qkv}/kernel"
            m[f"{src}.attention.self.{qkv}.bias"] = f"{dst}/attention/{qkv}/bias"
        m[f"{src}.attention.output.dense.weight"] = f"{dst}/attention/out/kernel"
        m[f"{src}.attention.output.dense.bias"] = f"{dst}/attention/out/bias"
        m[f"{src}.attention.output.LayerNorm.weight"] = f"{dst}/attention_ln/scale"
        m[f"{src}.attention.output.LayerNorm.bias"] = f"{dst}/attention_ln/bias"
        m[f"{src}.intermediate.dense.weight"] = f"{dst}/intermediate/kernel"
        m[f"{src}.intermediate.dense.bias"] = f"{dst}/intermediate/bias"
        m[f"{src}.output.dense.weight"] = f"{dst}/output/kernel"
        m[f"{src}.output.dense.bias"] = f"{dst}/output/bias"
        m[f"{src}.output.LayerNorm.weight"] = f"{dst}/output_ln/scale"
        m[f"{src}.output.LayerNorm.bias"] = f"{dst}/output_ln/bias"
    return m


def load_hf_checkpoint(
    model_dir: Path,
    config: Optional[XLMRConfig] = None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Load HF xlm-roberta weights from a local directory into our tree.

    Supports ``model.safetensors`` or ``pytorch_model.bin``. Linear kernels
    are transposed (torch stores [out, in]; flax uses [in, out]).
    """
    model_dir = Path(model_dir)
    if config is None:
        config = XLMRConfig.from_hf_config(model_dir / "config.json")

    state: Dict[str, np.ndarray] = {}
    st_path = model_dir / "model.safetensors"
    pt_path = model_dir / "pytorch_model.bin"
    if st_path.exists():
        from safetensors.numpy import load_file

        state = load_file(st_path)
    elif pt_path.exists():
        import torch

        raw = torch.load(pt_path, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in raw.items()}
    else:
        raise FileNotFoundError(f"No checkpoint found in {model_dir}")

    # strip "roberta." prefix if present
    state = {k[len("roberta."):] if k.startswith("roberta.") else k: v
             for k, v in state.items()}

    key_map = _hf_key_map(config.num_layers)
    params: Dict[str, Any] = {}
    for hf_key, our_path in key_map.items():
        if hf_key not in state:
            raise KeyError(f"Missing weight in checkpoint: {hf_key}")
        arr = np.asarray(state[hf_key])
        if our_path.endswith("/kernel"):
            arr = arr.T
        node = params
        parts = our_path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr, dtype=dtype)
    return {"params": params}
