"""String <-> integer id mapping with persistence.

Plays the role of the reference's ``flair.data.Dictionary``
(``/root/reference/flair/data.py:21-101``) but persists as JSON instead of
pickle so artifacts are portable and inspectable.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Union


class Dictionary:
    """Bidirectional item<->index map.

    Mirrors the semantics of the reference Dictionary: items are appended in
    insertion order; an optional ``<unk>`` item occupies index 0 when
    ``add_unk=True`` (the reference default for text dictionaries; tag
    dictionaries are built without it).
    """

    UNK = "<unk>"

    def __init__(self, add_unk: bool = False):
        self.item2idx: Dict[str, int] = {}
        self.idx2item: List[str] = []
        if add_unk:
            self.add_item(self.UNK)

    def add_item(self, item: str) -> int:
        if item not in self.item2idx:
            self.item2idx[item] = len(self.idx2item)
            self.idx2item.append(item)
        return self.item2idx[item]

    def get_idx_for_item(self, item: str) -> int:
        idx = self.item2idx.get(item)
        if idx is None:
            if self.UNK in self.item2idx:
                return self.item2idx[self.UNK]
            raise KeyError(
                f"Item {item!r} not in dictionary (and no <unk> fallback)."
            )
        return idx

    def get_item_for_index(self, idx: int) -> str:
        return self.idx2item[idx]

    def get_items(self) -> List[str]:
        return list(self.idx2item)

    def __len__(self) -> int:
        return len(self.idx2item)

    def __contains__(self, item: str) -> bool:
        return item in self.item2idx

    def __eq__(self, other) -> bool:
        return isinstance(other, Dictionary) and self.idx2item == other.idx2item

    def __repr__(self) -> str:
        return f"Dictionary({len(self)} items)"

    # -- persistence ---------------------------------------------------------

    def save(self, path: Union[str, Path]) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps({"items": self.idx2item}))

    @classmethod
    def load(cls, path: Union[str, Path]) -> "Dictionary":
        data = json.loads(Path(path).read_text())
        d = cls(add_unk=False)
        for item in data["items"]:
            d.add_item(item)
        return d

    @classmethod
    def from_items(cls, items: Iterable[str], add_unk: bool = False) -> "Dictionary":
        d = cls(add_unk=add_unk)
        for item in items:
            d.add_item(item)
        return d


def make_tag_dictionary(
    sentences_tags: Iterable[Iterable[str]],
    extra_tags: Optional[Iterable[str]] = None,
) -> Dictionary:
    """Build a tag dictionary the way the reference does.

    Order matters for checkpoint compatibility and mirrors
    ``Corpus.make_tag_dictionary`` (``/root/reference/flair/data.py:1083-1104``):
    'O' first, then tags in corpus order, then '<START>' and '<STOP>'.
    """
    d = Dictionary(add_unk=False)
    d.add_item("O")
    for tags in sentences_tags:
        for tag in tags:
            d.add_item(tag)
    if extra_tags:
        for tag in extra_tags:
            d.add_item(tag)
    d.add_item("<START>")
    d.add_item("<STOP>")
    return d
