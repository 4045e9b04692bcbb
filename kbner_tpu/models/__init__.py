from .xlmr import XLMRConfig, XLMREncoder, load_hf_checkpoint
from .tagger import (
    SequenceTagger,
    StackedSequenceTagger,
    TaggerConfig,
    init_stacked_tagger,
    init_tagger,
)
from .embedders import (
    BPEmbEmbedder,
    BPEVocab,
    CharBiLSTMEmbedder,
    CharLM,
    CharLMHead,
    ELMoEmbedder,
    EmbedderSpec,
    FlairLMEmbedder,
    StackedEmbedder,
    TransformerWordEmbedder,
    WordEmbedder,
)

__all__ = [
    "XLMRConfig",
    "XLMREncoder",
    "load_hf_checkpoint",
    "SequenceTagger",
    "StackedSequenceTagger",
    "TaggerConfig",
    "init_tagger",
    "init_stacked_tagger",
    "WordEmbedder",
    "CharBiLSTMEmbedder",
    "CharLM",
    "CharLMHead",
    "FlairLMEmbedder",
    "StackedEmbedder",
    "TransformerWordEmbedder",
    "EmbedderSpec",
    "ELMoEmbedder",
    "BPEmbEmbedder",
    "BPEVocab",
]
