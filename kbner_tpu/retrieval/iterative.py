"""Iterative entity retrieval (v4) and the multi-stage fine-tuning driver.

The reference's full-pipeline loops (``README.md:276-359``):

  v4 loop: train on v3 (sentence-retrieval) contexts -> predict entities on
  the raw data -> re-query with entity title-boost clauses
  (``generate_data.py --with_entity``) -> fuse the new contexts -> retrain.

  Multi-stage fine-tuning: each stage exports its tuned encoder
  (``save_finetuned_embedding``) and the next stage initializes from it
  (monolingual stages on top of the multilingual stage).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

from ..data.conll import SentenceRecord
from ..data.subword import SubwordTokenizer
from .engine import RetrievalEngine
from .fusion import ContextMode, extract_entities, fuse_contexts
from .pipeline import retrieve_for_records


def strip_context(records: Sequence[SentenceRecord],
                  tag_layer: str = "ner") -> List[SentenceRecord]:
    """Original-view copies of possibly context-augmented records."""
    from ..data.corpus_ops import make_orig_view

    return [make_orig_view(r, tag_layer) for r in records]


def entity_retrieval_round(
    engine: RetrievalEngine,
    trainer,  # FinetuneTrainer with a trained model
    records: Sequence[SentenceRecord],
    tokenizer: SubwordTokenizer,
    k: int = 10,
    lang: str = "en",
    mode: ContextMode = "sentence_link",
    budget: int = 510,
    use_gold_entities: bool = False,
    tag_layer: str = "ner",
    drop_over_budget_train: bool = False,
) -> List[SentenceRecord]:
    """One v4 round: predict entities, re-query entity-boosted, fuse.

    ``use_gold_entities=True`` reproduces the train-split behavior (gold
    B-/I- surface forms, ``generate_data.py:100-109``); otherwise the model's
    predictions seed the queries (dev/test behavior).
    """
    base = strip_context(records, tag_layer)
    if use_gold_entities:
        entities = [extract_entities(r, tag_layer) for r in base]
    else:
        preds = trainer.predict(base)
        pred_records = [
            SentenceRecord(tokens=r.tokens, tags={tag_layer: p},
                           lang_id=r.lang_id)
            for r, p in zip(base, preds)
        ]
        entities = [extract_entities(r, tag_layer) for r in pred_records]
    results = retrieve_for_records(
        engine, base, k=k, lang=lang, with_entity=True, entities=entities,
        tag_layer=tag_layer)
    return fuse_contexts(
        base, results, tokenizer, mode=mode, budget=budget,
        tag_layer=tag_layer, drop_over_budget_train=drop_over_budget_train)


def run_multistage(
    stages: Sequence[dict],
    build_trainer,  # callable(config_dict, encoder_init: Optional[Path]) -> (trainer, train_config, target_dir)
) -> List[dict]:
    """Multi-stage fine-tuning: stage n+1 initializes its encoder from stage
    n's exported tuned encoder (finetune_trainer.py:1290-1313 hand-off).

    ``stages`` are experiment-config dicts; ``build_trainer`` constructs the
    trainer for a stage (dependency-injected to keep this driver free of
    config-system imports).
    """
    results = []
    encoder_init: Optional[Path] = None
    for i, stage_cfg in enumerate(stages):
        trainer, train_config, target_dir = build_trainer(
            stage_cfg, encoder_init)
        train_config.save_finetuned_encoder = True
        result = trainer.train(target_dir, train_config)
        results.append(result)
        exported = Path(target_dir) / "finetuned-encoder.msgpack"
        if exported.exists():
            encoder_init = exported
    return results
