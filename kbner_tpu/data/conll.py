"""CoNLL column-format reading into array-friendly sentence records.

Replaces the reference's ``ColumnDataset``/``ColumnCorpus``
(``/root/reference/flair/datasets.py:21,852-1004``) with a plain-data design:
a sentence is a record of token strings + per-layer tag strings, not an
object graph. Tag-scheme conversion to BIOES happens at read time exactly as
the reference does (``datasets.py:921-924`` -> ``data.py:630-640``).

The ``<EOS>`` marker separates the original sentence from retrieved context
tokens (tagged ``B-X`` by the KB pipeline, ``kb/context_process.py:213-502``);
we record its position so models can build the two-view split and the X-mask
without re-scanning strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Union

from .dictionary import Dictionary, make_tag_dictionary
from .tag_schemes import to_bioes

EOS_MARKER = "<EOS>"
DOCSTART = "-DOCSTART-"
X_LABEL = "X"


@dataclass
class SentenceRecord:
    """One sentence: parallel lists of tokens and tag layers.

    ``eos_index`` is the token index of the ``<EOS>`` context separator, or
    -1 when the sentence carries no retrieved context. ``doc_id`` groups
    sentences into documents (from ``-DOCSTART-`` separators or comment ids),
    ``lang_id`` tags the source corpus for multilingual training
    (``finetune_trainer.py:158-167``).
    """

    tokens: List[str]
    tags: Dict[str, List[str]] = field(default_factory=dict)
    doc_id: int = -1
    lang_id: int = 0
    comment: Optional[str] = None
    # sentence-level label(s) for classification/regression tasks
    labels: List[str] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.tokens)

    @property
    def eos_index(self) -> int:
        try:
            return self.tokens.index(EOS_MARKER)
        except ValueError:
            return -1

    def original_tokens(self) -> List[str]:
        """Tokens of the original sentence (context stripped at <EOS>)."""
        eos = self.eos_index
        return self.tokens[:eos] if eos >= 0 else self.tokens

    def get_tags(self, layer: str) -> List[str]:
        return self.tags[layer]


def read_column_file(
    path: Union[str, Path],
    column_format: Dict[int, str],
    comment_symbol: Optional[str] = None,
    tag_to_bioes: Optional[str] = None,
    document_separator: str = DOCSTART,
    encoding: str = "utf-8",
    max_sentences: Optional[int] = None,
) -> List[SentenceRecord]:
    """Parse a whitespace-column CoNLL file.

    ``column_format`` maps column index -> layer name, e.g. ``{0: 'text',
    1: 'pos', 3: 'ner'}``; the 'text' column is required. ``tag_to_bioes``
    names the layer to convert IOB->BIOES (the reference converts the 'ner'
    layer, ``datasets.py:921-924``).
    """
    text_col = None
    for idx, name in column_format.items():
        if name == "text":
            text_col = idx
    if text_col is None:
        raise ValueError("column_format must map one column to 'text'")

    tag_layers = [name for idx, name in column_format.items() if name != "text"]
    sentences: List[SentenceRecord] = []
    doc_id = 0
    cur_tokens: List[str] = []
    cur_tags: Dict[str, List[str]] = {layer: [] for layer in tag_layers}
    cur_comment: Optional[str] = None

    def flush():
        nonlocal cur_tokens, cur_tags, cur_comment
        if cur_tokens:
            rec = SentenceRecord(
                tokens=cur_tokens,
                tags={k: v for k, v in cur_tags.items()},
                doc_id=doc_id,
                comment=cur_comment,
            )
            if tag_to_bioes and tag_to_bioes in rec.tags:
                rec.tags[tag_to_bioes] = to_bioes(rec.tags[tag_to_bioes])
            sentences.append(rec)
        cur_tokens = []
        cur_tags = {layer: [] for layer in tag_layers}
        cur_comment = None

    with open(path, encoding=encoding) as f:
        for line in f:
            line = line.rstrip("\n")
            if comment_symbol is not None and line.startswith(comment_symbol):
                cur_comment = line
                continue
            if not line.strip():
                flush()
                if max_sentences is not None and len(sentences) >= max_sentences:
                    return sentences[:max_sentences]
                continue
            fields = line.split()
            token = fields[text_col] if text_col < len(fields) else ""
            if token == document_separator:
                flush()
                doc_id += 1
                continue
            if not token:
                continue
            cur_tokens.append(token)
            for idx, name in column_format.items():
                if name == "text":
                    continue
                cur_tags[name].append(fields[idx] if idx < len(fields) else "O")
    flush()
    if max_sentences is not None:
        sentences = sentences[:max_sentences]
    return sentences


def write_column_file(
    path: Union[str, Path],
    sentences: Sequence[SentenceRecord],
    layers: Sequence[str] = ("ner",),
    encoding: str = "utf-8",
) -> None:
    """Write sentences back out in CoNLL column format (token + tag layers)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding=encoding) as f:
        for rec in sentences:
            if rec.comment:
                f.write(rec.comment + "\n")
            for i, tok in enumerate(rec.tokens):
                cols = [tok] + [rec.tags[l][i] for l in layers if l in rec.tags]
                f.write(" ".join(cols) + "\n")
            f.write("\n")


@dataclass
class Corpus:
    """train/dev/test splits of sentence records (reference ``Corpus``)."""

    train: List[SentenceRecord]
    dev: List[SentenceRecord]
    test: List[SentenceRecord]
    name: str = "corpus"

    def make_tag_dictionary(self, tag_type: str) -> Dictionary:
        def iter_tags() -> Iterator[List[str]]:
            for split in (self.train, self.dev, self.test):
                for rec in split:
                    if tag_type in rec.tags:
                        yield rec.tags[tag_type]

        return make_tag_dictionary(iter_tags())

    def downsample(self, fraction: float) -> "Corpus":
        def take(split: List[SentenceRecord]) -> List[SentenceRecord]:
            n = max(1, int(len(split) * fraction))
            return split[:n]

        return Corpus(take(self.train), take(self.dev), take(self.test), self.name)

    def __str__(self) -> str:
        return (
            f"Corpus({self.name}: {len(self.train)} train / "
            f"{len(self.dev)} dev / {len(self.test)} test)"
        )


def load_column_corpus(
    data_folder: Union[str, Path],
    column_format: Dict[int, str],
    train_file: str = "train.txt",
    dev_file: str = "dev.txt",
    test_file: str = "test.txt",
    comment_symbol: Optional[str] = None,
    tag_to_bioes: Optional[str] = "ner",
    name: Optional[str] = None,
) -> Corpus:
    """Load a ColumnCorpus-style folder (reference ``datasets.py:21``)."""
    folder = Path(data_folder)

    def read(fname: str) -> List[SentenceRecord]:
        p = folder / fname
        if not p.exists():
            return []
        return read_column_file(
            p, column_format, comment_symbol=comment_symbol,
            tag_to_bioes=tag_to_bioes,
        )

    return Corpus(
        train=read(train_file),
        dev=read(dev_file),
        test=read(test_file),
        name=name or folder.name,
    )


#: CoNLL-U layer names produced by :func:`read_conllu_file` (UD columns
#: LEMMA/UPOS/XPOS/HEAD/DEPREL/DEPS; FORM is the token text).
CONLLU_LAYERS = ("lemma", "upos", "pos", "head", "deprel", "deps")


def read_conllu_file(
    path: Union[str, Path],
    encoding: str = "utf-8",
    max_sentences: Optional[int] = None,
) -> List[SentenceRecord]:
    """Parse a CoNLL-U (Universal Dependencies) file.

    The 10-column tab-separated UD format (reference reader:
    ``/root/reference/flair/datasets.py:1006-1118``): comments skipped,
    multiword-token ranges (``1-2``) and empty nodes (``1.1``) skipped —
    heads always refer to the basic token ids. Produces layers ``lemma``,
    ``upos``, ``pos`` (XPOS), ``head``, ``deprel`` and ``deps``
    (enhanced-UD ``head:rel|head:rel`` cells), matching the column names
    the dependency/enhancedud trainers consume.
    """
    sentences: List[SentenceRecord] = []
    cur_tokens: List[str] = []
    cur_tags: Dict[str, List[str]] = {l: [] for l in CONLLU_LAYERS}
    cur_comment: Optional[str] = None

    def flush():
        nonlocal cur_tokens, cur_tags, cur_comment
        if cur_tokens:
            sentences.append(SentenceRecord(
                tokens=cur_tokens, tags=dict(cur_tags),
                comment=cur_comment))
        cur_tokens = []
        cur_tags = {l: [] for l in CONLLU_LAYERS}
        cur_comment = None

    with open(path, encoding=encoding) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                flush()
                if max_sentences is not None and \
                        len(sentences) >= max_sentences:
                    return sentences
                continue
            if line.startswith("#"):
                cur_comment = line
                continue
            fields = line.split("\t")
            if len(fields) < 2:
                fields = line.split()
            tok_id = fields[0]
            # multiword-token ranges and empty nodes carry no tree arcs
            if "-" in tok_id or "." in tok_id:
                continue
            cur_tokens.append(fields[1])
            get = lambda i: fields[i] if i < len(fields) else "_"
            cur_tags["lemma"].append(get(2))
            cur_tags["upos"].append(get(3))
            cur_tags["pos"].append(get(4))
            cur_tags["head"].append(get(6))
            cur_tags["deprel"].append(get(7))
            cur_tags["deps"].append(get(8))
    flush()
    if max_sentences is not None:
        sentences = sentences[:max_sentences]
    return sentences


def load_conllu_corpus(
    data_folder: Union[str, Path],
    train_file: str = "train.conllu",
    dev_file: str = "dev.conllu",
    test_file: str = "test.conllu",
    name: Optional[str] = None,
) -> Corpus:
    """Load a UD treebank folder of CoNLL-U files
    (reference ``UniversalDependenciesCorpus``)."""
    folder = Path(data_folder)

    def read(fname: str) -> List[SentenceRecord]:
        p = folder / fname
        return read_conllu_file(p) if p.exists() else []

    return Corpus(
        train=read(train_file), dev=read(dev_file), test=read(test_file),
        name=name or folder.name)


@dataclass
class ListCorpus:
    """Multi-corpus container keeping per-dataset lists, like the reference's
    ``ListCorpus`` (``/root/reference/flair/list_data.py:2-19``): concatenated
    splits for training plus per-target lists for dataset-level dev/test
    evaluation and language-id assignment."""

    corpora: List[Corpus]

    def __post_init__(self):
        for lang_id, corpus in enumerate(self.corpora):
            for split in (corpus.train, corpus.dev, corpus.test):
                for rec in split:
                    rec.lang_id = lang_id

    @property
    def targets(self) -> List[str]:
        return [c.name for c in self.corpora]

    @property
    def train(self) -> List[SentenceRecord]:
        return [rec for c in self.corpora for rec in c.train]

    @property
    def dev_list(self) -> List[List[SentenceRecord]]:
        return [c.dev for c in self.corpora]

    @property
    def test_list(self) -> List[List[SentenceRecord]]:
        return [c.test for c in self.corpora]

    def make_tag_dictionary(self, tag_type: str) -> Dictionary:
        def iter_tags():
            for c in self.corpora:
                for split in (c.train, c.dev, c.test):
                    for rec in split:
                        if tag_type in rec.tags:
                            yield rec.tags[tag_type]

        return make_tag_dictionary(iter_tags())


def read_fasttext_file(
    path: Union[str, Path],
    label_prefix: str = "__label__",
    encoding: str = "utf-8",
    max_sentences: Optional[int] = None,
) -> List[SentenceRecord]:
    """Read a fastText-format classification file: ``__label__X token ...``
    (the format of the reference's classification fixtures, e.g. ag_news)."""
    out: List[SentenceRecord] = []
    with open(path, encoding=encoding) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            labels = [p[len(label_prefix):] for p in parts
                      if p.startswith(label_prefix)]
            tokens = [p for p in parts if not p.startswith(label_prefix)]
            if not tokens:
                continue
            out.append(SentenceRecord(tokens=tokens, labels=labels))
            if max_sentences is not None and len(out) >= max_sentences:
                break
    return out
