"""Fine-tuning trainer: pjit data-parallel, reference training semantics.

TPU-native counterpart of ``ModelFinetuner``
(``/root/reference/flair/trainers/finetune_trainer.py:50-1330``):

  - two param groups (encoder lr vs head lr*lr_rate, ``:552-571``),
  - AdamW + linear warmup (``:664-691``), grad clip 5.0 (``:1010-1012``),
  - gradient accumulation (``:939-946,1007-1023``),
  - per-epoch dev evaluation as a dataset-level macro average over the
    per-language dev sets (``:1099-1130``),
  - best/final model convention (``:1280-1303``) with the tuned encoder
    exportable for multi-stage hand-off (``save_finetuned_embedding``,
    ``:1290-1313``),
  - language resampling / upsampling hooks for multilingual training
    (``:98-214``).

Design differences (TPU-first): the train step is one jitted pure function
over a device mesh; batches are length-bucketed static shapes; the model is
a Flax module + param tree, checkpointed with flax serialization (msgpack),
not pickled objects.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..data.conll import Corpus, ListCorpus, SentenceRecord, X_LABEL
from ..data.dictionary import Dictionary
from ..data.encode import EncodedBatch, encode_batch, make_batches
from ..data.subword import SubwordTokenizer
from ..eval.metrics import Metric, evaluate_spans
from ..models.tagger import SequenceTagger
from ..parallel.mesh import pad_batch_for_mesh, shard_batch
from .optim import make_finetune_optimizer

log = logging.getLogger("kbner_tpu")


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 5e-6
    lr_rate: float = 10000.0  # head lr multiplier
    batch_size: int = 16
    max_epochs: int = 10
    warmup_fraction: float = 0.1
    accumulation_steps: int = 1
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    use_inverse_sqrt: bool = False
    # store Adam's first moment in bfloat16: ~1.1 GB less HBM at 550M
    # params and half the mu read/write traffic per step; the second
    # moment stays f32 (its dynamic range is the unstable one)
    adam_mu_bf16: bool = False
    # PRNG implementation for dropout keys. threefry (jax's default) is
    # counter-based crypto-strength and costs ~100 ms/step at
    # xlmr-large B32xS256 on a v5e (1.2G draws: attention-probs +
    # hidden dropout masks); 'rbg'/'unsafe_rbg' use the TPU's hardware
    # RngBitGenerator (the standard large-model training recipe) and
    # cut that to ~34 ms. None = jax default (threefry).
    rng_impl: Optional[str] = "unsafe_rbg"
    seed: int = 0
    max_subtokens: int = 512
    eval_batch_size: int = 32
    save_finetuned_encoder: bool = False
    monitor_test: bool = False
    # corpus surgery (finetune_trainer.py:98-214)
    resample_smooth: Optional[float] = None  # language resampling p^0.7
    direct_upsample_rate: Optional[int] = None
    direct_upsample_max_size: Optional[int] = None
    down_sample_amount: Optional[int] = None
    clip_long_sentences: bool = False
    # multi-view cooperative training (CLNER/ITA)
    multi_view: bool = False
    mv_agreement_weight: float = 1.0
    mv_l2_weight: float = 0.0
    mv_kind: str = "kl"
    # first-epoch encoder freezing (finetune_trainer.py:693-695)
    freeze_first_epoch: bool = False
    # per-epoch checkpointing with optimizer state + resume
    checkpoint: bool = False
    resume: bool = False
    # profiler integration (SURVEY §5: the reference has none; a
    # production TPU trainer needs one): capture a TensorBoard/XPlane
    # trace of steps [profile_start, profile_start + profile_steps) of
    # the first epoch into <target_dir>/profile
    profile_steps: int = 0
    profile_start: int = 2  # skip compile + warmup steps


class FinetuneTrainer:
    def __init__(
        self,
        model: SequenceTagger,
        params: Any,
        corpus: ListCorpus | Corpus,
        tokenizer: SubwordTokenizer,
        tag_dict: Dictionary,
        mesh=None,
        tag_layer: str = "ner",
        stride_windows: bool = False,
        stride_max_subtokens: int = 510,
        stride_words: int = 16,
    ):
        self.model = model
        self.params = params
        if isinstance(corpus, Corpus):
            corpus = ListCorpus([corpus])
        self.corpus = corpus
        self.tokenizer = tokenizer
        self.tag_dict = tag_dict
        self.mesh = mesh
        self.tag_layer = tag_layer
        # sliding-window split + stitch for over-budget sentences at
        # predict/eval time (embeddings.py:3202-3227 semantics)
        self.stride_windows = stride_windows
        self.stride_max_subtokens = stride_max_subtokens
        self.stride_words = stride_words
        self._decode_fn = None
        self._x_tag = "S-" + X_LABEL
        # ACE: fixed embedder-selection mask injected into every batch
        # (set per episode by the reinforcement loop)
        self.selection: Optional[np.ndarray] = None
        # extra feature vocabularies for classic embedders (word/char ids)
        self.word_vocab = None
        self.char_vocab = None
        self.bpe_vocab = None

    # -- jitted steps ---------------------------------------------------------

    def _encoder_mask(self):
        """1.0 for encoder params, 0.0 elsewhere (first-epoch freezing)."""
        def is_enc(path):
            return 1.0 if any(
                getattr(k, "key", None) == "encoder" for k in path) else 0.0

        return jax.tree_util.tree_map_with_path(
            lambda p, _: is_enc(p), self.params)

    def _build_train_step(self, tx, config: "TrainConfig"):
        model = self.model
        enc_mask = self._encoder_mask()
        multi_view = config.multi_view
        mv_kwargs = dict(
            agreement_weight=config.mv_agreement_weight,
            l2_weight=config.mv_l2_weight, kind=config.mv_kind)

        def train_step(params, opt_state, batch, rng, freeze):
            def loss_fn(p):
                if multi_view:
                    return model.apply(
                        p, batch["ctx"], batch["orig"], deterministic=False,
                        method=model.multi_view_loss, rngs={"dropout": rng},
                        **mv_kwargs)
                return model.apply(
                    p, batch, deterministic=False, method=model.loss,
                    rngs={"dropout": rng})

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree_util.tree_map(
                lambda g, m: g * (1.0 - freeze * m), grads, enc_mask)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda a, b: a + b, params, updates)
            return params, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    def _decode(self, params, batch_arrays) -> Tuple[np.ndarray, np.ndarray]:
        if self._decode_fn is None:
            model = self.model

            def decode_fn(params, batch):
                return model.apply(params, batch, method=model.decode)

            self._decode_fn = jax.jit(decode_fn)
        tags, scores = self._decode_fn(params, batch_arrays)
        return np.asarray(tags), np.asarray(scores)

    # -- training -------------------------------------------------------------

    def _apply_corpus_surgery(self, config: TrainConfig) -> None:
        from ..data import corpus_ops

        if config.clip_long_sentences:
            removed = corpus_ops.clip_sentences(
                self.corpus, self.tokenizer, config.max_subtokens - 2)
            if removed:
                log.info("clipped %d over-budget train sentences", removed)
        if config.down_sample_amount:
            corpus_ops.down_sample(
                self.corpus, config.down_sample_amount, seed=config.seed)
        if config.direct_upsample_rate:
            corpus_ops.direct_upsample(
                self.corpus, config.direct_upsample_rate,
                config.direct_upsample_max_size)

    def _epoch_records(self, config: TrainConfig, epoch: int):
        from ..data import corpus_ops

        if config.resample_smooth:
            records = corpus_ops.resample_corpora(
                self.corpus, smooth=config.resample_smooth,
                seed=config.seed + epoch)
        else:
            records = self.corpus.train
        if self.stride_windows:
            # over-budget sentences train as overlapping window chunks
            from ..data.windows import split_long_record

            records = [
                chunk
                for rec in records
                for chunk, _ in split_long_record(
                    rec, self.tokenizer, self.stride_max_subtokens,
                    self.stride_words)
            ]
        return records

    def _make_train_batches(self, records, config: TrainConfig, epoch: int):
        """Encoded batches; multi-view mode pairs each context batch with
        the <EOS>-truncated view of the same sentences, in order."""
        from ..data.corpus_ops import make_orig_view

        batches = make_batches(
            records, self.tokenizer, self.tag_dict,
            config.batch_size, shuffle=True, seed=config.seed + epoch,
            tag_layer=self.tag_layer, max_subtokens=config.max_subtokens)
        if not config.multi_view:
            return batches
        paired = []
        for eb in batches:
            orig_records = [make_orig_view(r, self.tag_layer)
                            for r in eb.records]
            orig = encode_batch(
                orig_records, self.tokenizer, self.tag_dict,
                tag_layer=self.tag_layer, max_subtokens=config.max_subtokens)
            paired.append((eb, orig))
        return paired

    def train(self, base_path: str | Path, config: TrainConfig) -> Dict[str, Any]:
        base_path = Path(base_path)
        base_path.mkdir(parents=True, exist_ok=True)
        self.tag_dict.save(base_path / "tag_dictionary.json")

        self._apply_corpus_surgery(config)
        # Schedule horizon from the ACTUAL per-epoch record count: language
        # resampling and stride-window expansion change the epoch size, and
        # a horizon computed from the raw corpus would end the linear decay
        # early/late (reference computes it from the realized loader length,
        # finetune_trainer.py:679-688). Epoch 0's record count is the
        # per-epoch estimate (resampling keeps the size stable across
        # epochs; stride expansion is deterministic).
        steps_per_epoch = max(
            1, (len(self._epoch_records(config, 0)) + config.batch_size - 1)
            // config.batch_size)
        total_steps = steps_per_epoch * config.max_epochs
        warmup = int(total_steps * config.warmup_fraction)

        tx = make_finetune_optimizer(
            self.params, lr=config.learning_rate, lr_rate=config.lr_rate,
            warmup_steps=warmup, total_steps=total_steps,
            weight_decay=config.weight_decay, grad_clip=config.grad_clip,
            accumulation_steps=config.accumulation_steps,
            use_inverse_sqrt=config.use_inverse_sqrt,
            mu_dtype=jnp.bfloat16 if config.adam_mu_bf16 else None)
        opt_state = tx.init(self.params)
        train_step = self._build_train_step(tx, config)

        rng = (jax.random.key(config.seed, impl=config.rng_impl)
               if config.rng_impl else jax.random.PRNGKey(config.seed))
        best_score = -np.inf
        history = {"train_loss": [], "dev_score": []}

        start_epoch = 0
        ckpt_path = base_path / "checkpoint.msgpack"
        if config.resume and ckpt_path.exists():
            state = self._load_checkpoint(ckpt_path, opt_state)
            opt_state, start_epoch = state["opt_state"], state["epoch"] + 1
            best_score = state["best_score"]
            history = state["history"]
            log.info("resumed from checkpoint at epoch %d", start_epoch)

        loss_tsv = base_path / "loss.tsv"
        if start_epoch == 0:
            loss_tsv.write_text(
                "EPOCH\tTIMESTAMP\tTRAIN_LOSS\tDEV_SCORE\n")

        try:
            for epoch in range(start_epoch, config.max_epochs):
                t0 = time.time()
                records = self._epoch_records(config, epoch)
                batches = self._make_train_batches(records, config, epoch)
                freeze = jnp.asarray(
                    1.0 if (config.freeze_first_epoch and epoch == 0) else 0.0)
                losses = []
                profiling = False
                for i, item in enumerate(batches):
                    if (config.profile_steps and epoch == start_epoch
                            and i == config.profile_start):
                        jax.profiler.start_trace(str(base_path / "profile"))
                        profiling = True
                    if config.multi_view:
                        eb, orig = item
                        arrays = {"ctx": self._to_device(eb),
                                  "orig": self._to_device(orig)}
                    else:
                        arrays = self._to_device(item)
                    rng, step_rng = jax.random.split(rng)
                    self.params, opt_state, loss = train_step(
                        self.params, opt_state, arrays, step_rng, freeze)
                    # keep the loss on device: a per-step host pull
                    # serializes dispatch with the device (and with the
                    # remote tunnel's round trip); one sync per epoch
                    losses.append(loss)
                    if (profiling and i + 1 ==
                            config.profile_start + config.profile_steps):
                        jax.profiler.stop_trace()
                        profiling = False
                        log.info("wrote profiler trace to %s",
                                 base_path / "profile")
                if profiling:  # epoch shorter than the profile window
                    jax.profiler.stop_trace()
                train_loss = float(np.mean(
                    [float(l) for l in jax.device_get(losses)])) \
                    if losses else 0.0
                history["train_loss"].append(train_loss)

                # dataset-level macro-avg dev score
                # (finetune_trainer.py:1099-1130)
                dev_scores = []
                for dev_set in self.corpus.dev_list:
                    if dev_set:
                        metric, _ = self.evaluate(
                            dev_set, config.eval_batch_size)
                        dev_scores.append(metric.micro_avg_f_score())
                # Without dev sets, select on train loss — negated, so that
                # "higher selection score = better" still holds and the
                # best-model is the LOWEST-loss epoch, not the first.
                dev_score = (float(np.mean(dev_scores)) if dev_scores
                             else -train_loss)
                history["dev_score"].append(dev_score)
                log.info(
                    "epoch %d  loss %.4f  dev %.4f  (%.1fs)",
                    epoch + 1, train_loss, dev_score, time.time() - t0)
                with open(loss_tsv, "a") as f:
                    f.write(f"{epoch + 1}\t{time.strftime('%H:%M:%S')}\t"
                            f"{train_loss:.6f}\t{dev_score:.6f}\n")

                if dev_score >= best_score:
                    best_score = dev_score
                    self.save(base_path / "best-model.msgpack")
                    if config.save_finetuned_encoder:
                        self.save_encoder(
                            base_path / "finetuned-encoder.msgpack")
                if config.checkpoint:
                    self._save_checkpoint(
                        ckpt_path, opt_state, epoch, best_score, history)
        except KeyboardInterrupt:
            # the reference saves a final model on interrupt
            # (finetune_trainer.py:1314-1324)
            log.info("interrupted — saving final-model")
            self.save(base_path / "final-model.msgpack")
            raise

        self.save(base_path / "final-model.msgpack")
        (base_path / "history.json").write_text(json.dumps(history))
        return {"best_dev_score": best_score, "history": history}

    # -- checkpoint/resume (nn.py:69-141 semantics) ---------------------------

    def _save_checkpoint(self, path, opt_state, epoch, best_score, history):
        blob = {
            "params": self.params,
            "opt_state": opt_state,
            "meta": json.dumps({
                "epoch": epoch, "best_score": best_score,
                "history": history}),
        }
        Path(path).write_bytes(serialization.to_bytes(blob))

    def _load_checkpoint(self, path, opt_state_template):
        blob = {
            "params": self.params,
            "opt_state": opt_state_template,
            "meta": "",
        }
        restored = serialization.from_bytes(blob, Path(path).read_bytes())
        self.params = restored["params"]
        meta = json.loads(restored["meta"])
        return {
            "opt_state": restored["opt_state"],
            "epoch": meta["epoch"],
            "best_score": meta["best_score"],
            "history": meta["history"],
        }

    def evaluate_speed(self, records: Sequence[SentenceRecord],
                       batch_size: int = 32) -> float:
        """Decode throughput in sentences/s (reference --test_speed,
        train.py:147-156)."""
        # warmup (compile)
        self.predict(records[: min(len(records), batch_size)], batch_size)
        t0 = time.time()
        self.predict(records, batch_size)
        return len(records) / max(time.time() - t0, 1e-9)

    def _to_device(self, eb: EncodedBatch) -> Dict[str, jnp.ndarray]:
        if (self.word_vocab is not None or self.char_vocab is not None
                or self.bpe_vocab is not None) \
                and "word_ids" not in eb.extra and "char_ids" not in eb.extra \
                and "bpe_first_ids" not in eb.extra:
            from ..data.encode import add_classic_features

            add_classic_features(eb, self.word_vocab, self.char_vocab,
                                 bpe_vocab=self.bpe_vocab,
                                 elmo_bytes=getattr(
                                     self, "elmo_bytes", False))
        arrays = eb.arrays()
        if self.mesh is not None:
            arrays = pad_batch_for_mesh(arrays, self.mesh)
            out = shard_batch(arrays, self.mesh)
        else:
            out = {k: jnp.asarray(v) for k, v in arrays.items()}
        if self.selection is not None:
            # [N_embedders] mask, replicated (not batch-sharded)
            out["selection"] = jnp.asarray(self.selection)
        return out

    # -- evaluation -----------------------------------------------------------

    def predict(
        self,
        records: Sequence[SentenceRecord],
        batch_size: int = 32,
        sort_by_length: bool = True,
    ) -> List[List[str]]:
        """Predicted BIOES tag strings per sentence, in input order.

        Retrieved-context positions (gold S-X) are re-filled with S-X as the
        reference does after masked decode
        (sequence_tagger_model.py:1198-1208).
        """
        # tag_dict=None: prediction must not require gold tags to be
        # encodable (parse mode feeds raw BIO files, train.py:384-400)
        order_batches = make_batches(
            records, self.tokenizer, None, batch_size,
            shuffle=False, sort_by_length=sort_by_length,
            tag_layer=self.tag_layer)
        results: Dict[int, List[str]] = {}
        rec_index = {id(r): i for i, r in enumerate(records)}
        for eb in order_batches:
            arrays = self._to_device(eb)
            tags, _ = self._decode(self.params, arrays)
            for b, rec in enumerate(eb.records):
                n_words = int(eb.word_mask[b].sum())
                out = []
                for w in range(n_words):
                    if eb.crf_mask[b, w] == 0:
                        out.append(self._x_tag)
                    else:
                        out.append(self.tag_dict.get_item_for_index(
                            int(tags[b, w])))
                # words truncated by the subtoken budget get 'O'
                out.extend(["O"] * (len(rec.tokens) - n_words))
                results[rec_index[id(rec)]] = out
        return [results[i] for i in range(len(records))]

    def embed_texts(self, texts: Sequence[str], batch_size: int = 64):
        """Word-level encoder features for raw whitespace-tokenized texts:
        ``(emb [B, W, H] np.float32, mask [B, W] np.int32)`` in input
        order. The embedding source for BERTScore context reranking
        (``retrieval/rerank.py::rerank_by_bertscore``)."""
        if not texts:
            return (np.zeros((0, 0, 0), np.float32),
                    np.zeros((0, 0), np.int32))
        recs = [SentenceRecord(tokens=t.split() or ["."],
                               tags={self.tag_layer: []})
                for t in texts]
        for r in recs:
            r.tags[self.tag_layer] = ["O"] * len(r.tokens)
        order_batches = make_batches(
            recs, self.tokenizer, None, batch_size,
            shuffle=False, sort_by_length=True, tag_layer=self.tag_layer)
        rec_index = {id(r): i for i, r in enumerate(recs)}
        feats_by_i: Dict[int, np.ndarray] = {}
        mask_by_i: Dict[int, np.ndarray] = {}
        extract = type(self.model)._extract_features
        for eb in order_batches:
            arrays = self._to_device(eb)
            f = np.asarray(self.model.apply(
                self.params, arrays, True, method=extract))
            for b, rec in enumerate(eb.records):
                i = rec_index[id(rec)]
                n = int(eb.word_mask[b].sum())
                feats_by_i[i] = f[b, :n]
                mask_by_i[i] = np.asarray(eb.word_mask[b, :n])
        W = max(int(v.shape[0]) for v in feats_by_i.values())
        H = next(iter(feats_by_i.values())).shape[1]
        emb = np.zeros((len(recs), W, H), np.float32)
        mask = np.zeros((len(recs), W), np.int32)
        for i in range(len(recs)):
            n = feats_by_i[i].shape[0]
            emb[i, :n] = feats_by_i[i]
            mask[i, :n] = mask_by_i[i]
        return emb, mask

    def evaluate(
        self,
        records: Sequence[SentenceRecord],
        batch_size: int = 32,
        out_path: Optional[Path] = None,
    ) -> Tuple[Metric, List[List[str]]]:
        if self.stride_windows:
            from ..data.windows import predict_long

            preds = predict_long(
                self, records, max_subtokens=self.stride_max_subtokens,
                stride_words=self.stride_words, batch_size=batch_size)
        else:
            preds = self.predict(records, batch_size)
        gold = [r.tags[self.tag_layer] for r in records]
        metric = evaluate_spans(gold, preds, ignore_labels=(X_LABEL, "_", "NE"))
        if out_path is not None:
            with open(out_path, "w", encoding="utf-8") as f:
                for rec, pred in zip(records, preds):
                    for tok, g, p in zip(rec.tokens, rec.tags[self.tag_layer],
                                         pred):
                        f.write(f"{tok} {g} {p}\n")
                    f.write("\n")
        return metric, preds

    def final_test(self, base_path: str | Path, batch_size: int = 32):
        """Reload best model and evaluate per test set
        (finetune_trainer.py:2136-2282)."""
        base_path = Path(base_path)
        best = base_path / "best-model.msgpack"
        if best.exists():
            self.load(best)
        results = {}
        for name, test_set in zip(self.corpus.targets, self.corpus.test_list):
            if not test_set:
                continue
            metric, _ = self.evaluate(
                test_set, batch_size, out_path=base_path / f"test.{name}.tsv")
            results[name] = {
                "micro_f1": metric.micro_avg_f_score(),
                "macro_f1": metric.macro_avg_f_score(),
            }
            log.info("TEST %s: %s", name, results[name])
        (base_path / "test_results.json").write_text(json.dumps(results))
        return results

    # -- persistence ----------------------------------------------------------

    def save(self, path: str | Path) -> None:
        Path(path).write_bytes(serialization.to_bytes(self.params))

    def load(self, path: str | Path) -> None:
        self.params = serialization.from_bytes(
            self.params, Path(path).read_bytes())
        self._decode_fn = None

    def save_encoder(self, path: str | Path) -> None:
        """Export only the tuned encoder params — the multi-stage fine-tuning
        hand-off (reference ``save_finetuned_embedding``,
        finetune_trainer.py:1290-1313)."""
        encoder = self.params["params"]["encoder"]
        Path(path).write_bytes(serialization.to_bytes(encoder))

    def load_encoder(self, path: str | Path) -> None:
        encoder = self.params["params"]["encoder"]
        restored = serialization.from_bytes(encoder, Path(path).read_bytes())
        params = jax.tree_util.tree_map(lambda x: x, self.params)
        params["params"]["encoder"] = restored
        self.params = params
