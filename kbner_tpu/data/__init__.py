from .dictionary import Dictionary, make_tag_dictionary
from .conll import (
    Corpus,
    ListCorpus,
    SentenceRecord,
    EOS_MARKER,
    X_LABEL,
    load_column_corpus,
    read_column_file,
    write_column_file,
)
from .subword import HashTokenizer, HFTokenizer, SubwordTokenizer, subtoken_length
from .encode import EncodedBatch, encode_batch, make_batches
from .tag_schemes import (
    TagSpan,
    bioes_to_bio,
    get_spans,
    iob2,
    iob_iobes,
    to_bioes,
)

__all__ = [
    "Dictionary",
    "make_tag_dictionary",
    "Corpus",
    "ListCorpus",
    "SentenceRecord",
    "EOS_MARKER",
    "X_LABEL",
    "load_column_corpus",
    "read_column_file",
    "write_column_file",
    "TagSpan",
    "bioes_to_bio",
    "get_spans",
    "iob2",
    "iob_iobes",
    "to_bioes",
]
