"""Parsing-family task trainers: ``targets: dependency / enhancedud / ner_dp``.

The reference trains its biaffine parser family through the same
ModelFinetuner path as taggers (``train.py`` with ``targets:
dependency/enhancedud/ner_dp``, dataloader bucketing via kmeans
``parser/utils/data.py:48``); here a shared trainer loop drives the three
heads in :mod:`kbner_tpu.models.biaffine` with the same training recipe
(two param groups, warmup, clipping) and task-native model selection
(UAS/LAS for trees, labeled F1 for DAGs, span micro-F1 for NER-DP),
reusing the tagger trainer's optimizer and checkpoint formats.
"""

from __future__ import annotations

import functools
import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.conll import SentenceRecord
from ..data.dictionary import Dictionary
from ..data.encode import make_batches
from ..models.biaffine import mst_decode
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


def build_semdep_rel_dictionary(records: Sequence[SentenceRecord],
                                layer: str = "deps") -> Dictionary:
    """Relation labels out of enhanced-UD ``head:rel|head:rel`` columns."""
    d = Dictionary()
    d.add_item("<unk>")  # index 0: unscored slot in rel_matrix
    for r in records:
        for cell in r.tags.get(layer, []):
            for item in cell.split("|"):
                if ":" in item:
                    d.add_item(item.split(":", 1)[1])
    return d


class _TaskTrainer:
    """Shared encode/train/checkpoint loop; subclasses attach task arrays
    and define ``evaluate`` + ``score_key`` (higher = better)."""

    score_key = "score"

    def __init__(self, model, params, corpus, tokenizer,
                 n_buckets: int = 0):
        self.model = model
        self.params = params
        self.corpus = corpus
        self.tokenizer = tokenizer
        self.n_buckets = n_buckets
        self._decode_fn = None

    # -- task hooks -----------------------------------------------------------

    def _attach_arrays(self, eb) -> None:
        raise NotImplementedError

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        raise NotImplementedError

    # -- batches --------------------------------------------------------------

    def _encode(self, records, batch_size: int, shuffle: bool, seed: int
                ) -> List:
        batches = make_batches(
            records, self.tokenizer, None, batch_size, shuffle=shuffle,
            seed=seed, n_buckets=self.n_buckets, keep_records=True)
        for eb in batches:
            self._attach_arrays(eb)
        return batches

    def _to_device(self, eb) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in eb.arrays().items()}

    # -- training -------------------------------------------------------------

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

        # donating params/opt_state lets XLA update them in place —
        # no extra HBM copy of the model+optimizer per step
        @functools.partial(jax.jit, donate_argnums=(0, 1))
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

        rng = (jax.random.key(config.seed, impl=config.rng_impl)
               if config.rng_impl else jax.random.PRNGKey(config.seed))
        key = self.score_key
        best = {key: -float("inf"), "epoch": 0}
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
                # keep losses on device: a per-step host pull serializes
                # every step with the (remote-tunnel) round trip
                losses.append(loss)
            mean_loss = float(np.mean(
                [float(l) for l in jax.device_get(losses)])) \
                if losses else 0.0
            # dev-less runs select on train loss (lower = better)
            scores = (self.evaluate(dev, config.eval_batch_size)
                      if dev else {key: -mean_loss})
            history.append({"epoch": epoch, "loss": mean_loss, **scores})
            log.info("epoch %d: loss %.4f dev %s %.4f (%.1fs)",
                     epoch, mean_loss, key, scores[key],
                     time.time() - t0)
            if scores[key] >= best[key]:
                best = {**scores, "epoch": epoch}
                self.save(base_path / "best-model.msgpack")
        self.save(base_path / "final-model.msgpack")
        (base_path / "history.json").write_text(json.dumps(history))
        out = {f"best_dev_{k}": v for k, v in best.items() if k != "epoch"}
        out["best_epoch"] = best["epoch"]
        return out

    # -- persistence ----------------------------------------------------------

    def save(self, path: str | Path) -> None:
        from flax import serialization

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(serialization.to_bytes(self.params))

    def load(self, path: str | Path) -> None:
        from flax import serialization

        self.params = serialization.from_bytes(
            self.params, Path(path).read_bytes())


class ParserTrainer(_TaskTrainer):
    """Tree parsing (``targets: dependency``): CoNLL-U columns 6/7,
    UAS/LAS selection, marginal/greedy decode + host MST repair."""

    score_key = "uas"

    def __init__(self, model, params, corpus, tokenizer,
                 rel_dict: Dictionary, n_buckets: int = 0,
                 mst_repair: bool = True):
        super().__init__(model, params, corpus, tokenizer, n_buckets)
        self.rel_dict = rel_dict
        self.mst_repair = mst_repair

    def _attach_arrays(self, eb) -> None:
        from ..models.biaffine import encode_dependency_arrays

        encode_dependency_arrays(eb, rel_dict=self.rel_dict)

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

    def predict_records(self, records: Sequence[SentenceRecord],
                        batch_size: int = 32
                        ) -> List[Dict[str, List[str]]]:
        """Per-record ``{"head": [...], "deprel": [...]}`` string layers in
        the input order (the --parse output surface, CoNLL-U cols 6/7)."""
        out: Dict[int, Dict[str, List[str]]] = {}
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            heads, rels = self.predict(eb)
            W = heads.shape[1]
            for b, rec in enumerate(eb.records):
                # the subtoken budget can truncate a sentence (W < tokens);
                # pad the overflow with ROOT/dep so layers stay aligned
                n = min(len(rec.tokens), W)
                pad = len(rec.tokens) - n
                out[id(rec)] = {
                    "head": [str(int(h)) for h in heads[b, :n]]
                            + ["0"] * pad,
                    "deprel": [self.rel_dict.idx2item[int(r)]
                               if int(r) < len(self.rel_dict.idx2item)
                               else "dep" for r in rels[b, :n]]
                              + ["dep"] * pad,
                }
        return [out[id(r)] for r in records]

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        total = correct_h = correct_hl = 0
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            heads, rels = self.predict(eb)
            gold_h = eb.extra["heads"]
            gold_r = eb.extra["rel_ids"]
            # unannotated heads (-1, partial treebanks) don't score
            wm = (np.asarray(eb.word_mask) > 0) & (gold_h >= 0)
            total += int(wm.sum())
            hit = (heads == gold_h) & wm
            correct_h += int(hit.sum())
            correct_hl += int((hit & (rels == gold_r)).sum())
        if total == 0:
            return {"uas": 0.0, "las": 0.0}
        return {"uas": correct_h / total, "las": correct_hl / total}


class SemDepTrainer(_TaskTrainer):
    """Graph parsing (``targets: enhancedud``, the reference's DM/PAS/PSD
    SemanticDependencyParser surface): enhanced-UD ``head:rel|...`` cells,
    labeled-F1 selection over predicted arcs."""

    score_key = "lf1"

    def __init__(self, model, params, corpus, tokenizer,
                 rel_dict: Dictionary, n_buckets: int = 0,
                 dep_layer: str = "deps"):
        super().__init__(model, params, corpus, tokenizer, n_buckets)
        self.rel_dict = rel_dict
        self.dep_layer = dep_layer

    def _attach_arrays(self, eb) -> None:
        from ..models.biaffine import encode_semdep_arrays

        encode_semdep_arrays(eb, layer=self.dep_layer,
                             rel_dict=self.rel_dict)

    def predict(self, eb):
        """(arcs [B, W, W+1] 0/1, rels [B, W, W+1]) numpy."""
        if self._decode_fn is None:
            model = self.model

            @jax.jit
            def decode_fn(params, batch):
                return model.apply(params, batch, method=model.decode)

            self._decode_fn = decode_fn
        arcs, rels = self._decode_fn(self.params, self._to_device(eb))
        return np.asarray(arcs), np.asarray(rels)

    def predict_records(self, records: Sequence[SentenceRecord],
                        batch_size: int = 32
                        ) -> List[Dict[str, List[str]]]:
        """Per-record ``{"deps": ["h:rel|h:rel", ...]}`` enhanced-UD cells
        in the input order."""
        out: Dict[int, Dict[str, List[str]]] = {}
        names = self.rel_dict.idx2item
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            arcs, rels = self.predict(eb)
            W = arcs.shape[1]
            for b, rec in enumerate(eb.records):
                cells = []
                for w in range(len(rec.tokens)):
                    if w >= W:  # truncated by the subtoken budget
                        cells.append("_")
                        continue
                    hs = np.nonzero(arcs[b, w])[0]
                    cells.append("|".join(
                        f"{int(h)}:{names[int(rels[b, w, h])] if int(rels[b, w, h]) < len(names) else 'dep'}"
                        for h in hs) or "_")
                out[id(rec)] = {"deps": cells}
        return [out[id(r)] for r in records]

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        tp_u = tp_l = n_pred = n_gold = 0
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            arcs, rels = self.predict(eb)
            gold_a = eb.extra["arc_matrix"] > 0
            gold_r = eb.extra["rel_matrix"]
            pred = arcs > 0
            n_pred += int(pred.sum())
            n_gold += int(gold_a.sum())
            hit = pred & gold_a
            tp_u += int(hit.sum())
            tp_l += int((hit & (rels == gold_r)).sum())

        def f1(tp):
            p = tp / max(n_pred, 1)
            r = tp / max(n_gold, 1)
            return 2 * p * r / max(p + r, 1e-12)

        return {"uf1": f1(tp_u), "lf1": f1(tp_l)}


class BiaffineNERTrainer(_TaskTrainer):
    """Span NER as parsing (``targets: ner_dp``, the reference's
    BiaffineNERModel): BIOES gold spans vs greedily-selected
    non-overlapping predicted spans, span micro-F1 selection."""

    score_key = "micro_f1"

    def __init__(self, model, params, corpus, tokenizer,
                 label_dict: Dictionary, n_buckets: int = 0,
                 tag_layer: str = "ner"):
        super().__init__(model, params, corpus, tokenizer, n_buckets)
        self.label_dict = label_dict
        self.tag_layer = tag_layer

    def _attach_arrays(self, eb) -> None:
        from ..models.biaffine import encode_span_labels

        encode_span_labels(eb, tag_layer=self.tag_layer,
                           label_dict=self.label_dict)

    def predict(self, eb) -> List[List[tuple]]:
        """Per-sentence [(start, end_inclusive, label_id, score)]."""
        return self.model.apply(self.params, self._to_device(eb),
                                method=self.model.decode)

    def predict_records(self, records: Sequence[SentenceRecord],
                        batch_size: int = 32
                        ) -> List[Dict[str, List[str]]]:
        """Per-record ``{"ner": [BIOES tags]}`` from the selected spans."""
        out: Dict[int, Dict[str, List[str]]] = {}
        names = self.label_dict.idx2item
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            for b, (rec, chosen) in enumerate(
                    zip(eb.records, self.predict(eb))):
                tags = ["O"] * len(rec.tokens)
                for (i, j, lab, _s) in chosen:
                    if j >= len(tags):
                        continue
                    name = names[lab] if lab < len(names) else "MISC"
                    if i == j:
                        tags[i] = f"S-{name}"
                    else:
                        tags[i] = f"B-{name}"
                        for p in range(i + 1, j):
                            tags[p] = f"I-{name}"
                        tags[j] = f"E-{name}"
                out[id(rec)] = {"ner": tags}
        return [out[id(r)] for r in records]

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        tp = n_pred = n_gold = 0
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            gold = np.asarray(eb.extra["span_labels"])
            for b, chosen in enumerate(self.predict(eb)):
                pred = {(i, j, lab) for (i, j, lab, _s) in chosen}
                gi, gj = np.nonzero(gold[b])
                gspans = {(int(i), int(j), int(gold[b, i, j]))
                          for i, j in zip(gi, gj)}
                tp += len(pred & gspans)
                n_pred += len(pred)
                n_gold += len(gspans)
        p = tp / max(n_pred, 1)
        r = tp / max(n_gold, 1)
        return {"micro_f1": 2 * p * r / max(p + r, 1e-12),
                "precision": p, "recall": r}


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


class ClassificationTrainer(_TaskTrainer):
    """Document classification (``targets: classification``, the
    reference's TextClassifier task): CLS-pooled encoder + label head,
    accuracy (single-label) / micro-F1 (multi-label) model selection."""

    def __init__(self, model, params, corpus, tokenizer,
                 label_dict: Dictionary, multi_label: bool = False,
                 n_buckets: int = 0):
        super().__init__(model, params, corpus, tokenizer, n_buckets)
        self.label_dict = label_dict
        self.multi_label = multi_label
        self.score_key = "micro_f1" if multi_label else "accuracy"

    def _attach_arrays(self, eb) -> None:
        from ..models.classifier import encode_labels

        encode_labels(eb.records, self.label_dict, eb)

    def predict(self, eb) -> np.ndarray:
        if self._decode_fn is None:
            model = self.model

            @jax.jit
            def decode_fn(params, batch):
                return model.apply(params, batch, method=model.predict)

            self._decode_fn = decode_fn
        return np.asarray(self._decode_fn(self.params, self._to_device(eb)))

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        correct = total = 0
        tp = n_pred = n_gold = 0
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            pred = self.predict(eb)
            if self.multi_label:
                gold = eb.extra["label_multi"]
                hit = (pred > 0) & (gold > 0)
                tp += int(hit.sum())
                n_pred += int((pred > 0).sum())
                n_gold += int((gold > 0).sum())
            else:
                gold = eb.extra["label_ids"]
                correct += int((pred == gold).sum())
                total += len(gold)
        if self.multi_label:
            p = tp / max(n_pred, 1)
            r = tp / max(n_gold, 1)
            return {"micro_f1": 2 * p * r / max(p + r, 1e-12),
                    "precision": p, "recall": r}
        return {"accuracy": correct / max(total, 1)}

    def predict_records(self, records: Sequence[SentenceRecord],
                        batch_size: int = 32) -> List[List[str]]:
        """Per-record predicted label names in the input order."""
        names = self.label_dict.idx2item
        out: Dict[int, List[str]] = {}
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            pred = self.predict(eb)
            for b, rec in enumerate(eb.records):
                if self.multi_label:
                    out[id(rec)] = [names[i] for i in
                                    np.nonzero(pred[b])[0]]
                else:
                    out[id(rec)] = [names[int(pred[b])]]
        return [out[id(r)] for r in records]


class RegressionTrainer(_TaskTrainer):
    """Document regression (``targets: regression``, the reference's
    TextRegressor): numeric labels, negative-MSE model selection."""

    score_key = "neg_mse"

    def _attach_arrays(self, eb) -> None:
        vals = np.zeros((len(eb.records),), dtype=np.float32)
        for b, rec in enumerate(eb.records):
            try:
                vals[b] = float(rec.labels[0]) if rec.labels else 0.0
            except ValueError:
                vals[b] = 0.0
        eb.extra["targets"] = vals

    def predict(self, eb) -> np.ndarray:
        if self._decode_fn is None:
            model = self.model

            @jax.jit
            def decode_fn(params, batch):
                return model.apply(params, batch, method=model.predict)

            self._decode_fn = decode_fn
        return np.asarray(self._decode_fn(self.params, self._to_device(eb)))

    def evaluate(self, records: Sequence[SentenceRecord],
                 batch_size: int = 32) -> Dict[str, float]:
        se = n = 0.0
        for eb in self._encode(records, batch_size, shuffle=False, seed=0):
            pred = self.predict(eb)
            gold = eb.extra["targets"]
            se += float(((pred - gold) ** 2).sum())
            n += len(gold)
        mse = se / max(n, 1.0)
        return {"neg_mse": -mse, "mse": mse}
