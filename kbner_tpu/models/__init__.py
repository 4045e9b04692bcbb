from .xlmr import XLMRConfig, XLMREncoder, load_hf_checkpoint
from .tagger import SequenceTagger, TaggerConfig, init_tagger

__all__ = [
    "XLMRConfig",
    "XLMREncoder",
    "load_hf_checkpoint",
    "SequenceTagger",
    "TaggerConfig",
    "init_tagger",
]
