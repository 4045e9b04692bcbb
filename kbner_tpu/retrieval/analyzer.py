"""Text analysis: tokenize + normalize, reproducing Lucene analyzers.

The reference indexes with Elasticsearch's ``standard`` analyzer for all
languages except Chinese, which uses ``ik_max_word``/``ik_smart``
(``/root/reference/kb/build_kb.py:17-22``). Recall parity with ES is measured
at recall@k, so the analyzer must tokenize closely enough to Lucene's
StandardTokenizer (UAX#29 word boundaries) + LowerCaseFilter.

Approximation implemented here (host-side, index-build and query time only):

  - runs of Unicode word characters (letters/digits/underscore removed)
    form tokens; apostrophes inside words are kept split off (Lucene splits
    on them for most cases via UAX#29 mid-letter rules -- we approximate by
    keeping ASCII apostrophe-joined parts as separate tokens),
  - CJK ideographs are emitted as single-character tokens (UAX#29 assigns
    each Han character its own word boundary; this is also a usable stand-in
    for ik_smart's coarse segmentation at the recall level),
  - lowercase via str.lower() (Lucene uses Unicode lowercase; Python's agrees
    for the languages in the KB).

ES ``standard`` applies no stopword removal by default, so neither do we.
"""

from __future__ import annotations

import re
from typing import List

# CJK unified ideographs + extensions + Hiragana/Katakana + Hangul syllables
_CJK_RANGES = (
    (0x2E80, 0x2EFF), (0x3040, 0x30FF), (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF), (0xAC00, 0xD7AF), (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF),
)

_WORD_RE = re.compile(r"[\w]+", re.UNICODE)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def standard_analyze(text: str) -> List[str]:
    """Lucene standard-analyzer-like tokenization + lowercasing."""
    tokens: List[str] = []
    for m in _WORD_RE.finditer(text):
        word = m.group(0)
        # underscore is a word char in \w but a boundary in UAX#29
        for part in word.split("_"):
            if not part:
                continue
            # split runs containing CJK chars into per-char tokens, keeping
            # non-CJK runs intact
            buf = []
            for ch in part:
                if _is_cjk(ch):
                    if buf:
                        tokens.append("".join(buf).lower())
                        buf = []
                    tokens.append(ch)
                else:
                    buf.append(ch)
            if buf:
                tokens.append("".join(buf).lower())
    return tokens


def cjk_analyze(text: str) -> List[str]:
    """Chinese analyzer stand-in for ik_max_word: single chars + bigrams.

    ik_max_word emits overlapping dictionary words; char bigrams are the
    classic dictionary-free approximation with similar recall behavior.
    """
    base = standard_analyze(text)
    out: List[str] = []
    prev_cjk = None
    for tok in base:
        out.append(tok)
        if len(tok) == 1 and _is_cjk(tok):
            if prev_cjk is not None:
                out.append(prev_cjk + tok)
            prev_cjk = tok
        else:
            prev_cjk = None
    return out


def get_analyzer(lang: str = "en"):
    """Per-language analyzer selection (build_kb.py:17-22: zh -> ik)."""
    if lang == "zh":
        return cjk_analyze
    return standard_analyze
