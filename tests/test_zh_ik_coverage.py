"""zh analyzer fidelity: cjk_analyze's recall vs dictionary segmentation.

VERDICT r2 missing #6 — the reference indexes zh with Elasticsearch's
``ik_max_word``/``ik_smart`` dictionary analyzers
(/root/reference/kb/build_kb.py:17-22). No ik/JVM exists here, so the
claim to pin down is STRUCTURAL: ``cjk_analyze`` (unigrams + overlapping
bigrams over Han runs) token-covers ANY dictionary segmentation —

  * every 1-char dictionary word is an emitted unigram,
  * every n>=2-char dictionary word is covered by its bigrams, all of
    which are emitted for any contiguous Han run containing the word,

so a query containing a dictionary word always shares at least one term
with every document containing that word: dictionary-retrieval recall is
a floor, measured here against a toy-dictionary max-match segmenter on a
frozen zh fixture. Scores differ (bigram df statistics vs word df) —
that divergence is what the ranking comparison bounds.
"""

import numpy as np

from kbner_tpu.retrieval import BM25Index, RetrievalEngine
from kbner_tpu.retrieval.analyzer import cjk_analyze

# toy dictionary + corpus (frozen fixture). Words chosen to include
# overlapping-segmentation cases (ik_max_word emits overlapping words).
DICT = ["北京", "大学", "北京大学", "学生", "研究", "研究生", "生活",
        "中国", "人民", "中国人", "银行", "人民银行", "科学", "技术",
        "科学技术", "发展"]

DOCS = [
    "北京大学的学生在研究科学技术",
    "中国人民银行支持科学发展",
    "研究生的生活在北京",
    "人民银行的技术发展很快",
    "中国的大学重视科学研究",
    "学生的生活与技术无关",
    "北京的银行支持研究生",
    "科学技术是发展的基础",
]


def max_match_segment(text: str, dictionary) -> list:
    """Greedy forward maximum matching — the classic dictionary-segmenter
    shape ik derives from. Single chars fall through as unigrams."""
    words = sorted(dictionary, key=len, reverse=True)
    out, i = [], 0
    while i < len(text):
        for w in words:
            if text.startswith(w, i):
                out.append(w)
                i += len(w)
                break
        else:
            out.append(text[i])
            i += 1
    return out


def test_bigram_cover_property():
    """Every dictionary word's unigrams/bigrams are emitted for any text
    containing it — the structural recall guarantee."""
    for doc in DOCS:
        toks = set(cjk_analyze(doc))
        for w in DICT:
            if w in doc:
                if len(w) == 1:
                    assert w in toks
                else:
                    for i in range(len(w) - 1):
                        assert w[i:i + 2] in toks, (doc, w, w[i:i + 2])


def test_dictionary_retrieval_recall_floor():
    """Docs retrievable under dictionary segmentation are retrievable
    under cjk_analyze: for each dictionary word, the bigram index finds a
    superset of the word-index's matching documents."""
    index = BM25Index.build(DOCS, analyzer=cjk_analyze, pad_docs_to=8)
    eng = RetrievalEngine(index, use_pallas=False, block_d=8)
    for w in DICT:
        want = {i for i, d in enumerate(DOCS) if w in d}
        if not want:
            continue
        res = eng.search([w], k=len(DOCS))[0]
        got = {d.doc_id for d in res}
        assert want <= got, (w, want - got)


def test_ranking_agreement_with_dictionary_index():
    """Ranking divergence bound: for full-sentence queries, the bigram
    index's top-1 matches a dictionary-segmented (max-match) index's
    top-1 on the frozen fixture — the self-document dominates under both
    statistics."""
    dict_analyzer = lambda t: max_match_segment(t, DICT)
    idx_big = BM25Index.build(DOCS, analyzer=cjk_analyze, pad_docs_to=8)
    idx_dic = BM25Index.build(DOCS, analyzer=dict_analyzer, pad_docs_to=8)
    eng_big = RetrievalEngine(idx_big, use_pallas=False, block_d=8)
    eng_dic = RetrievalEngine(idx_dic, use_pallas=False, block_d=8)
    top1_agree = 0
    overlaps = []
    for qi, q in enumerate(DOCS):
        rb = eng_big.search([q], k=3)[0]
        rd = eng_dic.search([q], k=3)[0]
        top1_agree += rb[0].doc_id == rd[0].doc_id
        overlaps.append(len({d.doc_id for d in rb}
                            & {d.doc_id for d in rd}) / 3.0)
    assert top1_agree == len(DOCS)
    assert np.mean(overlaps) >= 0.7, overlaps  # frozen-fixture bound


def test_ik_analyzer_max_word_emission(tmp_path):
    """Production ik mode (VERDICT r3 #5): ik_max_word-style overlapping
    emission over Han runs from a loadable dictionary file."""
    from kbner_tpu.retrieval.analyzer import IkAnalyzer, get_analyzer

    dict_path = tmp_path / "main.dic"
    dict_path.write_text("\n".join(["# toy ik dictionary"] + DICT),
                         encoding="utf-8")
    ik = get_analyzer("zh", dict_path=dict_path)
    assert isinstance(ik, IkAnalyzer)

    toks = ik("北京大学的学生")
    # overlapping emission: the compound AND its parts
    for w in ("北京大学", "北京", "大学", "学生"):
        assert w in toks, toks
    assert "的" in toks  # uncovered char falls through as a unigram
    # covered chars do NOT fall through as unigrams (ik_max_word shape)
    assert "北" not in toks

    # mixed-script text: non-Han tokens pass through the standard rules
    toks2 = ik("ACL 2022 在北京大学举行")
    assert "acl" in toks2 and "2022" in toks2
    assert "北京大学" in toks2

    # ik_smart: greedy non-overlapping max-match
    smart = get_analyzer("zh", dict_path=dict_path, smart=True)
    toks3 = smart("北京大学的学生")
    assert toks3 == ["北京大学", "的", "学生"]


def test_ik_analyzer_matches_max_match_reference():
    """ik_smart mode == the classic forward max-match segmentation on
    the frozen fixture (the reference segmenter used to bound the
    bigram analyzer above)."""
    from kbner_tpu.retrieval.analyzer import IkAnalyzer

    smart = IkAnalyzer(DICT, smart=True)
    for doc in DOCS:
        assert smart(doc) == max_match_segment(doc, DICT), doc


def test_ik_index_retrieval_vs_bigram():
    """Dictionary-mode retrieval parity on the frozen fixture: the
    ik_max_word index finds every dictionary-word match the bigram
    index finds, and full-sentence top-1 agrees (self-document)."""
    from kbner_tpu.retrieval.analyzer import IkAnalyzer

    ik = IkAnalyzer(DICT)
    idx_ik = BM25Index.build(DOCS, analyzer=ik, pad_docs_to=8)
    idx_big = BM25Index.build(DOCS, analyzer=cjk_analyze, pad_docs_to=8)
    eng_ik = RetrievalEngine(idx_ik, use_pallas=False, block_d=8)
    eng_big = RetrievalEngine(idx_big, use_pallas=False, block_d=8)
    for w in DICT:
        want = {i for i, d in enumerate(DOCS) if w in d}
        if not want:
            continue
        got = {d.doc_id for d in eng_ik.search([w], k=len(DOCS))[0]}
        assert want <= got, (w, want - got)
    for q in DOCS:
        assert (eng_ik.search([q], k=1)[0][0].doc_id
                == eng_big.search([q], k=1)[0][0].doc_id)


def test_builtin_lexicon_loads_and_segments():
    """The shipped zh lexicon (VERDICT r4 #6): a few-thousand-word
    facts-of-language list making the production ik mode exercisable out
    of the box."""
    from kbner_tpu.retrieval.analyzer import (IkAnalyzer, builtin_zh_lexicon,
                                              get_analyzer)

    ik = get_analyzer("zh", dict_path="builtin")
    assert isinstance(ik, IkAnalyzer)
    assert len(ik.words) >= 3000, len(ik.words)
    assert builtin_zh_lexicon().exists()

    toks = ik("北京大学的学生使用互联网研究人工智能技术")
    for w in ("北京", "大学", "学生", "互联网", "研究", "人工智能", "技术"):
        assert w in toks, (w, toks)
    # mixed zh/Latin: Latin passes through the standard rules
    toks2 = ik("Google 和百度的工程师在上海开会")
    assert "google" in toks2 and "工程师" in toks2 and "上海" in toks2


def test_ik_vs_bigram_ranking_delta_mixed_zh_latin():
    """Measured ranking delta of ik_max_word (builtin lexicon) vs the
    char-bigram fallback on mixed zh/Latin sentences: the bigram analyzer
    emits spurious CROSS-WORD bigrams (query [北京][大学] also emits 京大,
    which matches documents about 南京大学), narrowing the gold document's
    score margin; the dictionary mode emits only real words. Both must
    still retrieve the gold document (the bigram recall floor), but ik's
    relative margin over the trap document must be strictly larger."""
    from kbner_tpu.retrieval.analyzer import get_analyzer

    docs = [
        "北京大学的学生在 Wikipedia 上研究科学技术",      # gold
        "南京大学的学生在 Wikipedia 上研究科学技术",      # boundary trap
        "上海的银行支持人民币投资和金融发展",
        "Google 的工程师在首尔开发人工智能系统",
        "研究生活在农村的人口与经济变化",
    ]
    query = "北京大学的学生研究科学技术"
    ik = get_analyzer("zh", dict_path="builtin")
    results = {}
    for name, analyzer in (("ik", ik), ("bigram", cjk_analyze)):
        idx = BM25Index.build(docs, analyzer=analyzer, pad_docs_to=8)
        eng = RetrievalEngine(idx, use_pallas=False, block_d=8)
        res = eng.search([query], k=len(docs))[0]
        by_id = {d.doc_id: d.score for d in res}
        assert res[0].doc_id == 0, (name, res)  # gold top-1 under BOTH
        results[name] = (by_id[0] - by_id[1]) / by_id[0]
    # the measured delta: ik's gold-over-trap margin beats bigram's
    assert results["ik"] > results["bigram"] + 0.05, results


def test_cli_index_ik_builtin_roundtrip(tmp_path):
    """Production wiring: `cli index --lang zh --ik_dict builtin` builds
    an ik-analyzed KB, copies the lexicon into the index dir, and
    `load_kb` restores the exact analyzer for serving."""
    import json as _json

    from kbner_tpu import cli
    from kbner_tpu.retrieval.analyzer import IkAnalyzer
    from kbner_tpu.retrieval.engine import RetrievalEngine as Eng
    from kbner_tpu.retrieval.pipeline import load_kb

    docs = [
        "北京大学的学生研究人工智能", "上海的银行支持金融发展",
        "Google 的工程师开发互联网系统", "研究生在图书馆学习历史文化",
        "中国的高速铁路技术出口海外", "医生在医院治疗病人",
    ]
    kb = tmp_path / "zh.jsonl"
    with open(kb, "w", encoding="utf-8") as f:
        for i, s in enumerate(docs):
            f.write(_json.dumps({"sentence": s, "paragraph": s,
                                 "title": f"T{i}", "url": "u"},
                                ensure_ascii=False) + "\n")
    out = tmp_path / "idx"
    cli.main(["index", "--kb", str(kb), "--out", str(out),
              "--lang", "zh", "--ik_dict", "builtin"])
    assert (out / "ik.dic").exists()
    meta = _json.loads((out / "meta.json").read_text())
    assert meta["ik_dict"] == "ik.dic" and meta["lang"] == "zh"

    text_index, store, title_index, lang = load_kb(out)
    assert lang == "zh" and isinstance(text_index.analyzer, IkAnalyzer)
    eng = Eng(text_index, store=store, title_index=title_index,
              use_pallas=False, block_d=8)
    res = eng.search(["北京大学的人工智能研究"], k=3)[0]
    assert res and res[0].doc_id == 0
