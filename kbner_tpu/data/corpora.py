"""Named-corpus registry: the non-download half of the reference's
corpus zoo (``/root/reference/flair/datasets.py``'s ~100 ColumnCorpus
subclasses each pin a column format + file layout per well-known dataset;
the download machinery is out of scope in a zero-egress environment).

A registry entry resolves a dataset NAME to its column format, default
file names, and comment symbol, against a user-supplied local data root —
so a reference config that says ``CONLL_03`` works here once the data is
on disk, exactly like the reference's "obtain the corpus ... and point
base_path at it" contract (``datasets.py:1654-1657``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class CorpusEntry:
    column_format: Dict[int, str]
    folder: str  # default subfolder under the data root
    train_file: str = "train.txt"
    dev_file: str = "dev.txt"
    test_file: str = "test.txt"
    comment_symbol: Optional[str] = None
    tag_layer: str = "ner"
    format: str = "column"  # or "conllu" (UD treebanks)


def _ud(treebank: str) -> CorpusEntry:
    """UD treebank entry (CoNLL-U files under the canonical release
    naming, e.g. ``ud_english/en_ewt-ud-train.conllu``) — the parsing
    targets' data source (reference ``flair/datasets.py:1006`` +
    UD_* corpus classes)."""
    code = treebank.split("_")[0]
    lang = {"en": "english", "de": "german", "fr": "french",
            "it": "italian", "nl": "dutch", "es": "spanish",
            "pt": "portuguese", "ja": "japanese"}.get(code, code)
    return CorpusEntry(
        column_format={}, folder=f"ud_{lang}",
        train_file=f"{treebank}-ud-train.conllu",
        dev_file=f"{treebank}-ud-dev.conllu",
        test_file=f"{treebank}-ud-test.conllu",
        tag_layer=None, format="conllu")


def _multiconer(lang: str) -> CorpusEntry:
    """SemEval-2022 MultiCoNER track layout (the KB-NER target datasets;
    reference config blocks, ``config/test.yaml:46-120``).

    Language tracks are 'XX-Name' (code before '-'); the MIX/MULTI
    tracks are 'MIX_Code_mixed'/'MULTI_Multilingual' (code before '_'),
    shipping as mix_train.conll / multi_train.conll."""
    code = lang.split("-")[0].split("_")[0].lower()
    return CorpusEntry(
        column_format={0: "text", 1: "pos", 2: "upos", 3: "ner"},
        folder=lang,
        train_file=f"{code}_train.conll",
        dev_file=f"{code}_dev.conll",
        test_file=f"{code}_test.conll",
        comment_symbol="# id",
    )


MULTICONER_TRACKS = [
    "BN-Bangla", "DE-German", "EN-English", "ES-Spanish", "FA-Farsi",
    "HI-Hindi", "KO-Korean", "NL-Dutch", "RU-Russian", "TR-Turkish",
    "ZH-Chinese", "MIX_Code_mixed", "MULTI_Multilingual",
]

CORPUS_REGISTRY: Dict[str, CorpusEntry] = {
    # CoNLL-02/03 NER (datasets.py:1646-2150)
    "CONLL_03": CorpusEntry(
        {0: "text", 1: "pos", 2: "chunk", 3: "ner"}, "conll_03",
        "eng.train", "eng.testa", "eng.testb"),
    "CONLL_03_GERMAN": CorpusEntry(
        {0: "text", 1: "lemma", 2: "pos", 3: "chunk", 4: "ner"},
        "conll_03_german", "deu.train", "deu.testa", "deu.testb"),
    "CONLL_03_DUTCH": CorpusEntry(
        {0: "text", 1: "pos", 2: "ner"}, "conll_03_dutch",
        "ned.train", "ned.testa", "ned.testb"),
    "CONLL_03_SPANISH": CorpusEntry(
        {0: "text", 1: "ner"}, "conll_03_spanish",
        "esp.train", "esp.testa", "esp.testb"),
    # WNUT emerging entities
    "WNUT_17": CorpusEntry(
        {0: "text", 1: "ner"}, "wnut_17",
        "wnut17train.conll", "emerging.dev.conll",
        "emerging.test.annotated"),
    # WikiAnn / PAN-X per-language silver NER
    "PANX": CorpusEntry({0: "text", 1: "ner"}, "panx"),
    # UD treebanks for the parsing targets (reference upos/dependency
    # corpus lists, config/test.yaml + flair/datasets.py:1006)
    "UD_ENGLISH": _ud("en_ewt"),
    "UD_GERMAN": _ud("de_gsd"),
    "UD_FRENCH": _ud("fr_gsd"),
    "UD_ITALIAN": _ud("it_isdt"),
    "UD_DUTCH": _ud("nl_alpino"),
    "UD_SPANISH": _ud("es_gsd"),
    "UD_PORTUGUESE": _ud("pt_bosque"),
    "UD_JAPANESE": _ud("ja_gsd"),
}
for _track in MULTICONER_TRACKS:
    CORPUS_REGISTRY[f"MULTICONER_{_track}"] = _multiconer(_track)
    CORPUS_REGISTRY[_track] = _multiconer(_track)


def corpus_spec(name: str, data_root: str | Path, **overrides):
    """Resolve a registry name to a ``config.CorpusSpec``.

    ``data_root`` is the local directory holding the dataset folders (the
    stand-in for the reference's flair cache). Keyword overrides replace
    any entry field (e.g. ``train_file``).
    """
    from ..config import CorpusSpec

    key = name.upper() if name.upper() in CORPUS_REGISTRY else name
    if key not in CORPUS_REGISTRY:
        raise KeyError(
            f"unknown corpus {name!r}; known: {sorted(CORPUS_REGISTRY)}")
    e = CORPUS_REGISTRY[key]
    fields = dict(
        name=name,
        data_folder=str(Path(data_root) / e.folder),
        column_format=dict(e.column_format),
        comment_symbol=e.comment_symbol,
        train_file=e.train_file,
        dev_file=e.dev_file,
        test_file=e.test_file,
        tag_to_bioes=e.tag_layer,
        format=e.format,
    )
    fields.update(overrides)
    return CorpusSpec(**fields)
