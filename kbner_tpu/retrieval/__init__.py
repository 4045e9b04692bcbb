from .analyzer import cjk_analyze, get_analyzer, standard_analyze
from .index import BM25Index, BM25Params, quantize_doc_length
from .engine import DocStore, RetrievalEngine, RetrievedDoc, mix_search

__all__ = [
    "standard_analyze",
    "cjk_analyze",
    "get_analyzer",
    "BM25Index",
    "BM25Params",
    "quantize_doc_length",
    "DocStore",
    "RetrievalEngine",
    "RetrievedDoc",
    "mix_search",
]
