"""Character language-model trainer (Flair-embedding pretraining).

Counterpart of ``/root/reference/flair/trainers/language_model_trainer.py``:
trains a :class:`~kbner_tpu.models.embedders.CharLMHead` on a plain-text
corpus with next-character cross-entropy; the trained LM params slot into
:class:`FlairLMEmbedder` stacks (forward or backward — backward models are
trained on reversed streams).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..data.dictionary import Dictionary
from ..models.embedders import CharLMHead


@dataclasses.dataclass
class LMTrainConfig:
    learning_rate: float = 1e-3
    batch_size: int = 16
    seq_len: int = 128
    max_steps: int = 1000
    grad_clip: float = 5.0
    seed: int = 0
    backward: bool = False  # train on reversed character streams
    log_every: int = 100


def build_char_stream(texts: List[str], vocab: Dictionary) -> np.ndarray:
    """Concatenate texts into one id stream (newline-separated)."""
    ids: List[int] = []
    nl = vocab.item2idx.get("\n", vocab.item2idx.get(" ", 0))
    for t in texts:
        for ch in t:
            ids.append(vocab.item2idx.get(ch, 0))
        ids.append(nl)
    return np.asarray(ids, dtype=np.int32)


class LanguageModelTrainer:
    def __init__(self, model: CharLMHead, params, vocab: Dictionary):
        self.model = model
        self.params = params
        self.vocab = vocab

    def train(self, texts: List[str], base_path: str | Path,
              config: LMTrainConfig) -> dict:
        base_path = Path(base_path)
        base_path.mkdir(parents=True, exist_ok=True)
        stream = build_char_stream(texts, self.vocab)
        if config.backward:
            stream = stream[::-1].copy()

        tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.learning_rate))
        opt_state = tx.init(self.params)
        model = self.model

        def step(params, opt_state, batch, mask):
            def loss_fn(p):
                return model.apply(p, batch, mask, method=model.loss)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda a, b: a + b, params,
                                            updates)
            return params, opt_state, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        rng = np.random.RandomState(config.seed)
        B, T = config.batch_size, config.seq_len
        losses = []
        t0 = time.time()
        for it in range(config.max_steps):
            if len(stream) <= T + 1:
                starts = np.zeros(B, dtype=np.int64)
            else:
                starts = rng.randint(0, len(stream) - T - 1, size=B)
            batch = np.stack([stream[s:s + T] for s in starts])
            mask = np.ones_like(batch)
            self.params, opt_state, loss = jstep(
                self.params, opt_state, jnp.asarray(batch),
                jnp.asarray(mask))
            losses.append(float(loss))
            if (it + 1) % config.log_every == 0:
                ppl = float(np.exp(np.mean(losses[-config.log_every:])))
                print(f"lm step {it + 1}: ppl {ppl:.2f} "
                      f"({time.time() - t0:.1f}s)")
        self.save(base_path / "char-lm.msgpack")
        return {"final_loss": losses[-1] if losses else None,
                "losses": losses}

    def save(self, path: str | Path) -> None:
        Path(path).write_bytes(serialization.to_bytes(self.params))

    def load(self, path: str | Path) -> None:
        self.params = serialization.from_bytes(
            self.params, Path(path).read_bytes())


def generate_text(
    model: CharLMHead,
    params,
    vocab: Dictionary,
    prefix: str = "\n",
    length: int = 100,
    temperature: float = 1.0,
    seed: int = 0,
) -> str:
    """Sample text from the char LM (reference ``LanguageModel.generate_text``).

    Host loop over single-step forwards — generation is a debugging /
    inspection tool, not a serving path, so simplicity beats speed here.
    """
    import jax

    ids = [vocab.item2idx.get(c, 0) for c in prefix] or [0]
    rng = jax.random.PRNGKey(seed)
    logits_fn = jax.jit(lambda p, s: model.apply(p, s)[0, -1])
    for _ in range(length):
        stream = jnp.asarray([ids], dtype=jnp.int32)
        logits = logits_fn(params, stream) / max(temperature, 1e-6)
        rng, key = jax.random.split(rng)
        nxt = int(jax.random.categorical(key, logits))
        ids.append(nxt)
    return "".join(vocab.get_item_for_index(i) for i in ids)
