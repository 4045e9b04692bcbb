"""Learned system-combination model (reference ``EnsembleModel``).

Counterpart of ``/root/reference/flair/models/ensemble_model.py:102-332``
trained by ``SWAFTrainer`` (``trainers/swaf_trainer.py:25-179``): given K
candidate systems' per-token predictions, learn per-token system weights
with a BCE objective (target: did system s predict this token correctly),
then combine predictions as a weighted vote at decode time.

Input features per token: concatenated one-hot label distributions of the K
systems (the reference feeds zeroed embeddings plus the system score matrix;
the score matrix is the informative part).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EnsembleConfig:
    num_systems: int
    num_labels: int
    hidden: int = 128


class EnsembleModel(nn.Module):
    config: EnsembleConfig

    @nn.compact
    def __call__(self, system_onehots: jnp.ndarray) -> jnp.ndarray:
        """[B, W, S, L] one-hot system predictions -> [B, W, S] weights."""
        B, W, S, L = system_onehots.shape
        x = system_onehots.reshape(B, W, S * L).astype(jnp.float32)
        h = jax.nn.relu(nn.Dense(self.config.hidden, name="hidden")(x))
        return nn.Dense(S, name="hidden2score")(h)

    def loss(self, system_onehots: jnp.ndarray, correct: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
        """BCE: predict per-system per-token correctness
        (ensemble_model.py:270-300)."""
        logits = self(system_onehots)  # [B, W, S]
        targets = correct.astype(jnp.float32)
        log_p = jax.nn.log_sigmoid(logits)
        log_np = jax.nn.log_sigmoid(-logits)
        per = -(targets * log_p + (1 - targets) * log_np).mean(-1)
        m = mask.astype(jnp.float32)
        return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

    def combine(self, system_onehots: jnp.ndarray) -> jnp.ndarray:
        """Weighted vote -> combined label ids [B, W]."""
        weights = jax.nn.sigmoid(self(system_onehots))  # [B, W, S]
        votes = jnp.einsum("bwsl,bws->bwl", system_onehots.astype(
            jnp.float32), weights)
        return jnp.argmax(votes, axis=-1).astype(jnp.int32)


def encode_system_predictions(
    all_system_tags: Sequence[Sequence[Sequence[str]]],
    gold_tags: Sequence[Sequence[str]],
    label_dict,
    word_bucket: int = 8,
) -> Dict[str, np.ndarray]:
    """systems' tag strings + gold -> arrays for EnsembleModel.

    Returns dict with ``system_onehots`` [B, W, S, L], ``correct``
    [B, W, S], ``mask`` [B, W], ``gold_ids`` [B, W]. The reference loads the
    same information from ``system_pred/{dev,test}.<name>.conllu`` files
    (config_parser.py:512-567).
    """
    S = len(all_system_tags)
    B = len(gold_tags)
    L = len(label_dict)
    W = max((len(g) for g in gold_tags), default=1)
    W = ((W + word_bucket - 1) // word_bucket) * word_bucket
    onehots = np.zeros((B, W, S, L), dtype=np.float32)
    correct = np.zeros((B, W, S), dtype=np.float32)
    mask = np.zeros((B, W), dtype=np.int32)
    gold_ids = np.zeros((B, W), dtype=np.int32)
    for b, gold in enumerate(gold_tags):
        for w, g in enumerate(gold[:W]):
            mask[b, w] = 1
            gid = label_dict.item2idx.get(g, 0)
            gold_ids[b, w] = gid
            for s in range(S):
                tags = all_system_tags[s][b]
                pid = label_dict.item2idx.get(
                    tags[w] if w < len(tags) else "O", 0)
                onehots[b, w, s, pid] = 1.0
                correct[b, w, s] = float(pid == gid)
    return {"system_onehots": onehots, "correct": correct, "mask": mask,
            "gold_ids": gold_ids}


class SWAFTrainer:
    """Trains the EnsembleModel on dev predictions, applies it to test
    (reference swaf_trainer.py:25-179)."""

    def __init__(self, model: EnsembleModel, params):
        self.model = model
        self.params = params

    def train(self, arrays: Dict[str, np.ndarray], steps: int = 200,
              lr: float = 1e-2) -> List[float]:
        import optax

        tx = optax.adam(lr)
        opt = tx.init(self.params)
        onehots = jnp.asarray(arrays["system_onehots"])
        correct = jnp.asarray(arrays["correct"])
        mask = jnp.asarray(arrays["mask"])
        model = self.model

        @jax.jit
        def step(p, o):
            loss, g = jax.value_and_grad(lambda pp: model.apply(
                pp, onehots, correct, mask, method=model.loss))(p)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, loss

        losses = []
        for _ in range(steps):
            self.params, opt, loss = step(self.params, opt)
            losses.append(float(loss))
        return losses

    def combine(self, arrays: Dict[str, np.ndarray]) -> np.ndarray:
        return np.asarray(self.model.apply(
            self.params, jnp.asarray(arrays["system_onehots"]),
            method=self.model.combine))
