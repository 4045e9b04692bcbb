"""YAML config system.

Keeps the *semantics* of the reference's config surface
(``/root/reference/flair/config_parser.py``: corpus blocks, embedding block,
model block, train block, trainer name) so reference configs translate 1:1,
but replaces reflection-on-class-names with explicit dataclasses.

Example::

    name: en-xlmr-crf
    corpora:
      - name: EN-English
        data_folder: data/EN-English_conll_rank_eos_doc_full_wiki_v3
        column_format: {0: text, 3: ner}
        comment_symbol: "# id"
    tag_layer: ner
    tokenizer: {type: hash, vocab_size: 50000}   # or {type: hf, dir: ...}
    model:
      encoder: base            # tiny | base | large | /path/to/hf_dir
      encoder_weights: null    # optional HF checkpoint dir
      use_crf: true
      locked_dropout: 0.5
      word_dropout: 0.05
    train:
      learning_rate: 5.0e-6
      lr_rate: 10000
      batch_size: 16
      max_epochs: 10
    target_dir: resources/taggers/en-xlmr-crf
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

from .data.conll import Corpus, ListCorpus, load_column_corpus
from .data.subword import HashTokenizer, HFTokenizer
from .models.xlmr import XLMRConfig
from .train.trainer import TrainConfig


@dataclasses.dataclass
class CorpusSpec:
    name: str
    data_folder: str
    column_format: Dict[int, str]
    comment_symbol: Optional[str] = None
    train_file: str = "train.txt"
    dev_file: str = "dev.txt"
    test_file: str = "test.txt"
    tag_to_bioes: Optional[str] = "ner"
    # "column" (CoNLL) or "fasttext" (__label__X text — classification/
    # regression corpora, the reference's ClassificationCorpus format)
    format: str = "column"


# trainer: key -> canonical kind. Reference class names are accepted as
# aliases (the reference selects its trainer the same way,
# /root/reference/train.py:105-131).
TRAINERS: Dict[str, str] = {
    "FinetuneTrainer": "finetune",
    "ModelFinetuner": "finetune",
    "DistillationTrainer": "distill",
    "ModelDistiller": "distill",
    "ReinforcementTrainer": "ace",
    "SWAFTrainer": "swaf",
    "LanguageModelTrainer": "lm",
    "ModelTrainer": "finetune",
}

_KNOWN_TOP_KEYS = {
    "name", "corpora", "tag_layer", "tokenizer", "model", "train", "data",
    "target_dir", "trainer", "targets", "teachers", "ace", "systems",
}


@dataclasses.dataclass
class ExperimentConfig:
    name: str
    corpora: List[CorpusSpec]
    tag_layer: str = "ner"
    tokenizer: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"type": "hash", "vocab_size": 50000})
    model: Dict[str, Any] = dataclasses.field(default_factory=dict)
    train: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # data-encoding policies (reference: TransformerWordEmbeddings flags)
    #   doc_context / v2_doc: embed each sentence inside a document window
    #     (embeddings.py:3657-3790); doc_window_budget = subtoken budget
    #   stride_windows: split + stitch over-budget sentences
    #     (embeddings.py:3202-3227); stride_words / max_subtokens tune it
    data: Dict[str, Any] = dataclasses.field(default_factory=dict)
    target_dir: Optional[str] = None
    trainer: str = "FinetuneTrainer"
    # task surface (reference train.py targets: ner / dependency / ...)
    targets: str = "ner"
    # KD: teacher experiment-config paths, one per corpus language (the
    # reference builds teachers from per-corpus configs,
    # config_parser.py:242-274)
    teachers: List[str] = dataclasses.field(default_factory=list)
    # ACE episode-loop settings (episodes, controller_lr, reward_kind)
    ace: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # SWAF: candidate systems' prediction files
    #   {dev: [...], test: [...]} of 'token gold pred' column files
    systems: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_file(cls, path: str | Path) -> "ExperimentConfig":
        raw = yaml.safe_load(Path(path).read_text())
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "ExperimentConfig":
        unknown = set(raw) - _KNOWN_TOP_KEYS
        if unknown:
            # a typoed key silently training with defaults is the config
            # bug class the reference never guarded against; fail loudly
            raise ValueError(
                f"unknown config keys: {sorted(unknown)}; "
                f"known: {sorted(_KNOWN_TOP_KEYS)}")
        trainer = raw.get("trainer", "FinetuneTrainer")
        if trainer not in TRAINERS:
            raise ValueError(
                f"unknown trainer: {trainer!r}; one of {sorted(TRAINERS)}")
        corpora = []
        for c in raw["corpora"]:
            if c.get("format") in ("fasttext", "conllu"):
                fmt = c["format"]
                suffix = "txt" if fmt == "fasttext" else "conllu"
                corpora.append(CorpusSpec(
                    name=c["name"], data_folder=c["data_folder"],
                    column_format={}, format=fmt,
                    train_file=c.get("train_file", f"train.{suffix}"),
                    dev_file=c.get("dev_file", f"dev.{suffix}"),
                    test_file=c.get("test_file", f"test.{suffix}")))
                continue
            if "column_format" not in c:
                # named corpus: resolve format/files from the registry
                # (the reference's datasets.py zoo, minus downloads)
                from .data.corpora import corpus_spec

                overrides = {
                    k: v for k, v in c.items()
                    if k in ("data_folder", "train_file", "dev_file",
                             "test_file", "comment_symbol", "tag_to_bioes")
                }
                corpora.append(corpus_spec(
                    c["name"], c.get("data_root", "."), **overrides))
                continue
            corpora.append(CorpusSpec(
                name=c["name"],
                data_folder=c["data_folder"],
                column_format={int(k): v
                               for k, v in c["column_format"].items()},
                comment_symbol=c.get("comment_symbol"),
                train_file=c.get("train_file", "train.txt"),
                dev_file=c.get("dev_file", "dev.txt"),
                test_file=c.get("test_file", "test.txt"),
                tag_to_bioes=c.get("tag_to_bioes", "ner"),
            ))
        return cls(
            name=raw.get("name", "experiment"),
            corpora=corpora,
            tag_layer=raw.get("tag_layer", "ner"),
            tokenizer=raw.get("tokenizer", {"type": "hash",
                                            "vocab_size": 50000}),
            model=raw.get("model", {}),
            train=raw.get("train", {}),
            data=raw.get("data", {}),
            target_dir=raw.get("target_dir"),
            trainer=trainer,
            targets=raw.get("targets", "ner"),
            teachers=list(raw.get("teachers", [])),
            ace=raw.get("ace", {}),
            systems=raw.get("systems", {}),
        )

    @property
    def trainer_kind(self) -> str:
        return TRAINERS[self.trainer]

    # -- factories -----------------------------------------------------------

    def load_corpus(self) -> ListCorpus:
        corpora = []
        for spec in self.corpora:
            if spec.format == "fasttext":
                from .data.conll import Corpus, read_fasttext_file

                folder = Path(spec.data_folder)

                def read(fname):
                    p = folder / fname
                    return read_fasttext_file(p) if p.exists() else []

                corpora.append(Corpus(
                    train=read(spec.train_file), dev=read(spec.dev_file),
                    test=read(spec.test_file), name=spec.name))
                continue
            if spec.format == "conllu":
                from .data.conll import load_conllu_corpus

                corpora.append(load_conllu_corpus(
                    spec.data_folder, train_file=spec.train_file,
                    dev_file=spec.dev_file, test_file=spec.test_file,
                    name=spec.name))
                continue
            corpora.append(load_column_corpus(
                spec.data_folder, spec.column_format,
                train_file=spec.train_file, dev_file=spec.dev_file,
                test_file=spec.test_file, comment_symbol=spec.comment_symbol,
                tag_to_bioes=spec.tag_to_bioes, name=spec.name,
            ))
        return ListCorpus(corpora)

    def prepare_corpus(self, corpus: ListCorpus, tokenizer) -> ListCorpus:
        """Apply the config's data-encoding policies to every split.

        ``doc_context: true`` (the reference's v2_doc) rewrites each
        sentence as a document window: neighbor sentences join as S-X
        context tokens, so they shape the encoder's attention but stay
        outside the CRF and the metrics (``data/doc_context.py``)."""
        if not self.data.get("doc_context", False):
            return corpus
        from .data.doc_context import make_doc_context_records

        budget = int(self.data.get("doc_window_budget", 510))
        new_corpora = []
        for c in corpus.corpora:
            splits = {}
            for split_name in ("train", "dev", "test"):
                recs = getattr(c, split_name)
                if recs:
                    windowed, _ = make_doc_context_records(
                        recs, tokenizer, budget=budget,
                        tag_layer=self.tag_layer)
                    splits[split_name] = windowed
                else:
                    splits[split_name] = recs
            new_corpora.append(Corpus(name=c.name, **splits))
        return ListCorpus(new_corpora)

    def make_tokenizer(self):
        t = dict(self.tokenizer)
        kind = t.pop("type", "hash")
        if kind == "hash":
            return HashTokenizer(**t)
        if kind == "hf":
            return HFTokenizer(t["dir"])
        raise ValueError(f"unknown tokenizer type {kind!r}")

    def make_encoder_config(self, tokenizer=None) -> XLMRConfig:
        # "size" accepted as an alias: a misspelled encoder key silently
        # training xlmr-base cost a debugging session once
        enc = self.model.get("encoder", self.model.get("size", "base"))
        kwargs: Dict[str, Any] = {}
        if (tokenizer is not None and self.tokenizer.get("type") == "hash"
                and enc in ("tiny", "base", "large")):
            # named sizes shrink to the hash vocab; a checkpoint PATH
            # encoder keeps its own vocab (hash ids are always smaller, so
            # they index the loaded embedding safely — the 550M rehearsal
            # pairs a hash tokenizer with a real-shaped checkpoint)
            kwargs["vocab_size"] = tokenizer.vocab_size
        # activation checkpointing (model.remat: true for xlmr-large on
        # 16 GB chips; model.remat_policy names a jax.checkpoint_policies
        # entry for selective remat, e.g. dots_with_no_batch_dims_saveable)
        if "remat" in self.model:
            kwargs["remat"] = bool(self.model["remat"])
        if self.model.get("remat_policy"):
            kwargs["remat_policy"] = str(self.model["remat_policy"])
        if enc == "tiny":
            return XLMRConfig.tiny(**kwargs)
        if enc == "base":
            return XLMRConfig.base(**kwargs)
        if enc == "large":
            return XLMRConfig.large(**kwargs)
        return XLMRConfig.from_hf_config(Path(enc) / "config.json", **kwargs)

    def make_train_config(self) -> TrainConfig:
        """The trainer's TrainConfig (DistillConfig for the KD trainer).

        Unknown ``train:`` keys raise — a typo like ``learing_rate`` must
        not silently train with defaults."""
        if self.trainer_kind == "lm":
            from .train.lm_trainer import LMTrainConfig

            cls_ = LMTrainConfig
        elif self.trainer_kind == "distill":
            from .train.distill import DistillConfig

            cls_ = DistillConfig
        else:
            cls_ = TrainConfig
        known = {f.name for f in dataclasses.fields(cls_)}
        unknown = set(self.train) - known
        if unknown:
            raise ValueError(
                f"unknown train keys for {self.trainer}: {sorted(unknown)}; "
                f"known: {sorted(known)}")
        return cls_(**self.train)

    def resolve_target_dir(self) -> Path:
        return Path(self.target_dir or f"resources/taggers/{self.name}")
