"""Text classification and regression heads.

Counterparts of the reference's inherited flair tasks
(``/root/reference/flair/models/text_classification_model.py`` (394 LoC) and
``text_regression_model.py`` (177)): a document embedding — CLS pooling over
the XLM-R encoder (the TPU-friendly analog of flair's document RNN/pool
embeddings) — followed by a linear head; CE for (multi-label) classification,
MSE for regression.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .xlmr import XLMRConfig, XLMREncoder


@dataclasses.dataclass(frozen=True)
class TextClassifierConfig:
    encoder: XLMRConfig
    num_labels: int
    multi_label: bool = False
    dropout: float = 0.1
    # "cls" | "mean" | "max" | "min" | "min_max_mean" | "rnn" — the
    # reference's DocumentPoolEmbeddings pooling modes (mean/min/max,
    # embeddings.py:4198-4460) and DocumentRNNEmbeddings (:4462-4731)
    # re-homed over the encoder's token states
    pooling: str = "cls"
    rnn_hidden: int = 128


def _pool_tokens(hidden: jnp.ndarray, mask: jnp.ndarray,
                 mode: str) -> jnp.ndarray:
    """Masked pooling over the subtoken axis: [B, S, D] -> [B, D]."""
    m = mask.astype(jnp.float32)[:, :, None]
    if mode == "mean":
        return (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    if mode == "max":
        return jnp.where(m > 0, hidden, -jnp.inf).max(1)
    if mode == "min":
        return jnp.where(m > 0, hidden, jnp.inf).min(1)
    if mode == "min_max_mean":
        return jnp.concatenate(
            [_pool_tokens(hidden, mask, m_) for m_ in
             ("min", "max", "mean")], axis=-1)
    raise ValueError(f"unknown pooling {mode!r}")


class TextClassifier(nn.Module):
    config: TextClassifierConfig

    def setup(self):
        cfg = self.config
        self.encoder = XLMREncoder(cfg.encoder, name="encoder")
        self.head = nn.Dense(cfg.num_labels, dtype=jnp.float32, name="head")
        self.drop = nn.Dropout(cfg.dropout)
        if cfg.pooling == "rnn":
            self.doc_rnn = nn.RNN(nn.GRUCell(cfg.rnn_hidden),
                                  name="doc_rnn")

    def document_embedding(self, batch: Dict[str, jnp.ndarray],
                           deterministic: bool = True) -> jnp.ndarray:
        hidden, _ = self.encoder(
            batch["input_ids"], batch["attention_mask"],
            deterministic=deterministic)
        hidden = hidden.astype(jnp.float32)
        mode = self.config.pooling
        if mode == "cls":
            return hidden[:, 0]
        if mode == "rnn":
            lengths = batch["attention_mask"].sum(-1)
            out = self.doc_rnn(hidden, seq_lengths=lengths)
            last = jnp.maximum(lengths - 1, 0)
            return jnp.take_along_axis(
                out, last[:, None, None], axis=1)[:, 0]
        return _pool_tokens(hidden, batch["attention_mask"], mode)

    def logits(self, batch: Dict[str, jnp.ndarray],
               deterministic: bool = True) -> jnp.ndarray:
        doc = self.document_embedding(batch, deterministic)
        if not deterministic:
            doc = self.drop(doc, deterministic=False)
        return self.head(doc)

    def __call__(self, batch, deterministic: bool = True):
        return self.logits(batch, deterministic)

    def loss(self, batch: Dict[str, jnp.ndarray],
             deterministic: bool = False) -> jnp.ndarray:
        """CE against ``label_ids`` [B] (or BCE against ``label_multi``
        [B, L] for multi-label)."""
        logits = self.logits(batch, deterministic)
        if self.config.multi_label:
            targets = batch["label_multi"].astype(jnp.float32)
            return jnp.mean(
                optax_sigmoid_ce(logits, targets))
        logp = jax.nn.log_softmax(logits, axis=-1)
        gold = jnp.take_along_axis(
            logp, batch["label_ids"][:, None], axis=1)[:, 0]
        return -jnp.mean(gold)

    def predict(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        logits = self.logits(batch, deterministic=True)
        if self.config.multi_label:
            return (jax.nn.sigmoid(logits) > 0.5).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def optax_sigmoid_ce(logits, targets):
    # local implementation to avoid importing optax in a models module
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_not_p)


@dataclasses.dataclass(frozen=True)
class TextRegressorConfig:
    encoder: XLMRConfig
    dropout: float = 0.1


class TextRegressor(nn.Module):
    config: TextRegressorConfig

    def setup(self):
        self.encoder = XLMREncoder(self.config.encoder, name="encoder")
        self.head = nn.Dense(1, dtype=jnp.float32, name="head")

    def predict(self, batch: Dict[str, jnp.ndarray],
                deterministic: bool = True) -> jnp.ndarray:
        hidden, _ = self.encoder(
            batch["input_ids"], batch["attention_mask"],
            deterministic=deterministic)
        return self.head(hidden[:, 0].astype(jnp.float32))[:, 0]

    def __call__(self, batch, deterministic: bool = True):
        return self.predict(batch, deterministic)

    def loss(self, batch: Dict[str, jnp.ndarray],
             deterministic: bool = False) -> jnp.ndarray:
        pred = self.predict(batch, deterministic)
        return jnp.mean((pred - batch["targets"].astype(jnp.float32)) ** 2)


def encode_labels(records, label_dict, eb) -> None:
    """Attach ``label_ids`` [B] (first label) and ``label_multi`` [B, L]."""
    B = len(records)
    label_ids = np.zeros((B,), dtype=np.int32)
    multi = np.zeros((B, len(label_dict)), dtype=np.int32)
    for b, rec in enumerate(records):
        for i, lbl in enumerate(rec.labels):
            idx = label_dict.item2idx.get(lbl, 0)
            if i == 0:
                label_ids[b] = idx
            multi[b, idx] = 1
    eb.extra["label_ids"] = label_ids
    eb.extra["label_multi"] = multi


def build_label_dictionary(records) -> "Dictionary":
    from ..data.dictionary import Dictionary

    d = Dictionary()
    for rec in records:
        for lbl in rec.labels:
            d.add_item(lbl)
    return d
