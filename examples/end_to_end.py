"""End-to-end KB-NER walkthrough on toy data (CPU-runnable, no downloads).

Covers the full reference pipeline on miniature inputs:
  1. wiki paragraphs -> anchored, sentence-split KB JSONL (parse_text stage)
  2. KB JSONL -> BM25 text+title indices + doc store (build_kb stage)
  3. per-sentence retrieval + context fusion under a subtoken budget
     (generate_data + context_process stages)
  4. fine-tune an XLM-R+CRF tagger on the context-augmented data
  5. iterative (v4) entity-boosted retrieval with the trained model
  6. evaluate span F1 and render an HTML visualization

Run:  JAX_PLATFORMS=cpu python examples/end_to_end.py
(On a real TPU just drop the env var; for actual experiments swap the
HashTokenizer for a saved XLM-R tokenizer dir and load HF weights via
kbner_tpu.models.load_hf_checkpoint.)
"""

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp

from kbner_tpu.data import HashTokenizer, encode_batch, load_column_corpus
from kbner_tpu.models import TaggerConfig, XLMRConfig, init_tagger
from kbner_tpu.retrieval import DocStore, RetrievalEngine
from kbner_tpu.retrieval.fusion import fuse_contexts
from kbner_tpu.retrieval.iterative import entity_retrieval_round
from kbner_tpu.retrieval.pipeline import (
    build_kb_from_jsonl,
    retrieve_for_records,
)
from kbner_tpu.retrieval.wikitext import paragraphs_to_jsonl
from kbner_tpu.train import FinetuneTrainer, TrainConfig
from kbner_tpu.utils.html_viz import render_ner_html

WIKI = [
    {"title": "Berlin", "url": "wiki/Berlin",
     "paragraph": "Berlin is the capital of Germany. It is a big city."},
    {"title": "Paris", "url": "wiki/Paris",
     "paragraph": "Paris is the capital of France."},
    {"title": "Alice Smith", "url": "wiki/Alice_Smith",
     "paragraph": "Alice Smith is a fictional person."},
    {"title": "Acme Corp", "url": "wiki/Acme",
     "paragraph": "Acme Corp is a fictional company in cartoons."},
    {"title": "European Union", "url": "wiki/EU",
     "paragraph": "The European Union is a political union of states."},
]


def main():
    work = Path(tempfile.mkdtemp(prefix="kbner_demo_"))
    repo = Path(__file__).parent.parent

    # 1-2: KB construction
    kb_jsonl = work / "kb.jsonl"
    n = paragraphs_to_jsonl(WIKI, kb_jsonl, lang="en")
    text_index, store, title_index = build_kb_from_jsonl(kb_jsonl)
    engine = RetrievalEngine(text_index, store=store,
                             title_index=title_index, use_pallas=False)
    print(f"KB: {n} sentences indexed")

    # 3: retrieval + fusion for the toy corpus
    corpus = load_column_corpus(
        repo / "tests/fixtures/ner_toy", {0: "text", 1: "ner"},
        comment_symbol="# id")
    tokenizer = HashTokenizer(vocab_size=997)
    results = retrieve_for_records(engine, corpus.train, k=3)
    corpus.train[:] = fuse_contexts(
        corpus.train, results, tokenizer, mode="sentence_link")
    print("fused example:", " ".join(corpus.train[0].tokens))

    # 4: fine-tune
    tag_dict = corpus.make_tag_dictionary("ner")
    cfg = TaggerConfig.for_tag_dictionary(
        XLMRConfig.tiny(vocab_size=1000), tag_dict,
        locked_dropout=0.0, word_dropout=0.0)
    eb = encode_batch(corpus.train[:2], tokenizer, tag_dict)
    model, params = init_tagger(
        cfg, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in eb.arrays().items()})
    trainer = FinetuneTrainer(model, params, corpus, tokenizer, tag_dict)
    trainer.train(work / "run", TrainConfig(
        learning_rate=1e-3, lr_rate=1.0, batch_size=4, max_epochs=30))

    # 5: iterative (v4) round with predicted entities
    fused_v4 = entity_retrieval_round(
        engine, trainer, corpus.dev, tokenizer, k=3)
    print("v4 fused dev example:", " ".join(fused_v4[0].tokens))

    # 6: evaluate + visualize
    metric, preds = trainer.evaluate(corpus.train)
    print(f"train span F1: {metric.micro_avg_f_score():.3f}")
    html = render_ner_html(corpus.train[:3])
    (work / "ner.html").write_text(html)
    print(f"artifacts in {work}")


if __name__ == "__main__":
    main()
