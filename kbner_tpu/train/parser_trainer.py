"""Dependency-parsing trainer: the ``targets: dependency`` task surface.

The reference trains its biaffine parsers through the same ModelFinetuner
path as taggers (``train.py`` with ``targets: dependency/enhancedud``,
dataloader bucketing via kmeans ``parser/utils/data.py:48``); here a
focused trainer drives :class:`~kbner_tpu.models.biaffine.BiaffineParser`
with the same training recipe (two param groups, warmup, clipping) and
UAS/LAS model selection, reusing the tagger trainer's optimizer and
checkpoint formats.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.conll import SentenceRecord
from ..data.dictionary import Dictionary
from ..data.encode import encode_batch, make_batches
from ..models.biaffine import encode_dependency_arrays, mst_decode
from .optim import make_finetune_optimizer
from .trainer import TrainConfig

log = logging.getLogger("kbner_tpu")


def build_rel_dictionary(records: Sequence[SentenceRecord],
                         rel_layer: str = "deprel") -> Dictionary:
    d = Dictionary()
    for r in records:
        for rel in r.tags.get(rel_layer, []):
            d.add_item(rel)
    return d


class ParserTrainer:
    """Train/evaluate a BiaffineParser over a column corpus whose
    ``head``/``deprel`` layers hold CoNLL-U columns 6/7."""

    def __init__(self, model, params, corpus, tokenizer,
                 rel_dict: Dictionary, n_buckets: int = 0,
                 mst_repair: bool = True):
        self.model = model
        self.params = params
        self.corpus = corpus
        self.tokenizer = tokenizer
        self.rel_dict = rel_dict
        self.n_buckets = n_buckets
        self.mst_repair = mst_repair
        self._decode_fn = None

    # -- batches ---------------------------------------------------------------

    def _encode(self, records, batch_size: int, shuffle: bool, seed: int
                ) -> List:
        batches = make_batches(
            records, self.tokenizer, None, batch_size, shuffle=shuffle,
            seed=seed, n_buckets=self.n_buckets, keep_records=True)
        for eb in batches:
            encode_dependency_arrays(eb, rel_dict=self.rel_dict)
        return batches

    def _to_device(self, eb) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in eb.arrays().items()}

    # -- training ----------------------------------------------------------------

    def train(self, base_path: str | Path, config: TrainConfig
              ) -> Dict[str, float]:
        base_path = Path(base_path)
        base_path.mkdir(parents=True, exist_ok=True)
        train_records = list(self.corpus.train)
        n_batches = max(1, len(train_records) // max(config.batch_size, 1))
        total_steps = max(config.max_epochs * n_batches, 1)
        tx = make_finetune_optimizer(
            self.params, lr=config.learning_rate, lr_rate=config.lr_rate,
            warmup_steps=max(int(config.warmup_fraction * total_steps), 1),
            total_steps=total_steps, weight_decay=config.weight_decay,
            grad_clip=config.grad_clip,
            accumulation_steps=config.accumulation_steps)
        opt_state = tx.init(self.params)
        model = self.model

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                return model.apply(p, batch, deterministic=False,
                                   method=model.loss,
                                   rngs={"dropout": rng})

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda a, u: a + u, params, updates)
            return params, opt_state, loss

        rng = jax.random.PRNGKey(config.seed)
        best = {"uas": -1.0, "las": -1.0, "epoch": 0}
        history = []
        dev = [r for split in self.corpus.dev_list for r in split]
        # encode once (padded shapes are bucket-stable); epochs permute
        # batch order — re-encoding every epoch dominates toy-scale runs
        all_batches = self._encode(
            train_records, config.batch_size, shuffle=False,
            seed=config.seed)
        order_rng = np.random.RandomState(config.seed)
        for epoch in range(1, config.max_epochs + 1):
            t0 = time.time()
            batches = [all_batches[i]
                       for i in order_rng.permutation(len(all_batches))]
            losses = []
            for eb in batches:
                rng, sub = jax.random.split(rng)
                self.params, opt_state, loss = train_step(
                    self.params, opt_state, self._to_device(eb), sub)
                losses.append(float(loss))
            scores = (self.evaluate(dev, config.eval_batch_size)
                      if dev else {"uas": -np.mean(losses), "las": 0.0})
            history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                            **scores})
            log.info("epoch %d: loss %.4f dev UAS %.4f LAS %.4f (%.1fs)",
                     epoch, np.mean(losses), scores["uas"], scores["las"],
                     time.time() - t0)
            if scores["uas"] >= best["uas"]:
                best = {**scores, "epoch": epoch}
                self.save(base_path / "best-model.msgpack")
        self.save(base_path / "final-model.msgpack")
        (base_path / "history.json").write_text(json.dumps(history))
        return {"best_dev_uas": best["uas"], "best_dev_las": best["las"],
                "best_epoch": best["epoch"]}

    # -- evaluation -------------------------------------------------------------

    def predict(self, eb):
        """(heads, rels) [B, W] numpy — marginal/greedy decode + optional
        host MST repair (the reference decodes trees via MST/Eisner)."""
        if self._decode_fn is None:
            model = self.model

            @jax.jit
            def decode_fn(params, batch):
                heads, rels = model.apply(params, batch,
                                          method=model.decode)
                s_arc, _ = model.apply(params, batch, method=model.scores)
                return heads, rels, s_arc

            self._decode_fn = decode_fn
        batch = self._to_device(eb)
        heads, rels, s_arc = self._decode_fn(self.params, batch)
        heads, rels = np.array(heads), np.array(rels)  # writable copies
        if self.mst_repair:
            s_arc = np.asarray(s_arc)
            wm = np.asarray(eb.word_mask)
            for b in range(heads.shape[0]):
                n = int(wm[b].sum())
                hs = heads[b, :n]
                # repair only when greedy output is not a tree
                if _has_cycle_or_multiroot(hs):
                    heads[b, :n] = mst_decode(
                        s_arc[b: b + 1], wm[b: b + 1])[0, :n]
        return heads, rels

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        total = correct_h = correct_hl = 0
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            heads, rels = self.predict(eb)
            gold_h = eb.extra["heads"]
            gold_r = eb.extra["rel_ids"]
            wm = np.asarray(eb.word_mask) > 0
            total += int(wm.sum())
            hit = (heads == gold_h) & wm
            correct_h += int(hit.sum())
            correct_hl += int((hit & (rels == gold_r)).sum())
        if total == 0:
            return {"uas": 0.0, "las": 0.0}
        return {"uas": correct_h / total, "las": correct_hl / total}

    # -- persistence -------------------------------------------------------------

    def save(self, path: str | Path) -> None:
        from flax import serialization

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(serialization.to_bytes(self.params))

    def load(self, path: str | Path) -> None:
        from flax import serialization

        self.params = serialization.from_bytes(
            self.params, Path(path).read_bytes())


def _has_cycle_or_multiroot(heads: np.ndarray) -> bool:
    """True if the 1-indexed head assignment is not a single-root tree."""
    n = len(heads)
    if n == 0:
        return False
    if int((heads == 0).sum()) != 1:
        return True
    for d in range(1, n + 1):
        seen = set()
        x = d
        while x != 0:
            if x in seen or x > n:
                return True
            seen.add(x)
            x = int(heads[x - 1])
    return False
