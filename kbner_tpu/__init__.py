"""kbner_tpu — a TPU-native knowledge-based NER framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
SemEval-2022 MultiCoNER winning system (Alibaba-NLP/KB-NER): BM25 retrieval
over a sharded HBM-resident inverted index, retrieval-augmented XLM-R + CRF
sequence tagging, multi-stage fine-tuning, knowledge distillation and
majority-voting ensembling.

Layout:
  data/       host-side ingest: CoNLL parsing, tag schemes, batching -> arrays
  models/     Flax modules: XLM-R encoder, tagger heads, biaffine parser
  ops/        compute kernels: CRF (scan + Pallas), BM25 scoring, top-k
  retrieval/  analyzer, inverted index, sharded query engine, context fusion
  parallel/   mesh construction and sharding rules
  train/      trainers (fine-tune, distillation), optimizers, checkpointing
  eval/       span-F1 metrics, conlleval-compatible evaluation
"""

__version__ = "0.1.0"
