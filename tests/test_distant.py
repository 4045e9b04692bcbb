"""Distant-supervision extras (context_process.py:542-657 parity):
entity-match scoring, Jaccard context ranking, silver-span projection."""

from kbner_tpu.data.conll import SentenceRecord
from kbner_tpu.retrieval import (distant_supervision, match_entity_count,
                                 rank_contexts_jaccard)
from kbner_tpu.retrieval.distant import named_entity_labels
from kbner_tpu.retrieval.engine import RetrievedDoc


def test_match_entity_count():
    assert match_entity_count(
        ["berlin"], "Berlin is big. I love berlin.") == 2
    assert match_entity_count(["x y"], "x y z x y") == 2
    # non-overlapping counting (the reference's re.finditer semantics)
    assert match_entity_count(["aa"], "aaaa") == 2
    assert match_entity_count([""], "anything") == 0
    assert match_entity_count(["zz"], "nothing") == 0


def test_rank_contexts_jaccard():
    q = "the beatles played in hamburg"
    ctxs = ["hamburg concerts of the beatles",   # high overlap
            "completely unrelated words here",   # zero -> dropped
            "beatles discography"]               # some overlap
    ranked, removed = rank_contexts_jaccard(q, ctxs)
    assert removed == 0
    assert ranked[0] == "hamburg concerts of the beatles"
    assert "completely unrelated words here" not in ranked
    # all-dropped increments the removed counter (reference :572-575)
    ranked, removed = rank_contexts_jaccard("zzz qqq", ["aaa bbb"])
    assert ranked == [] and removed == 1
    # stopwords don't count as overlap
    ranked, _ = rank_contexts_jaccard("the of and", ["the of and thing"])
    assert ranked == []


def test_named_entity_labels():
    rec = SentenceRecord(
        tokens=["John", "Smith", "visited", "Berlin"],
        tags={"ner": ["B-PER", "E-PER", "O", "S-LOC"]})
    d = named_entity_labels(rec)
    assert d == {"john smith": ["B-PER", "E-PER"], "berlin": ["S-LOC"]}


def test_distant_supervision_projection():
    rec = SentenceRecord(
        tokens=["John", "Smith", "visited", "Berlin"],
        tags={"ner": ["B-PER", "E-PER", "O", "S-LOC"]})
    docs = [
        RetrievedDoc(doc_id=0, score=1.0,
                     sentence="Mayor of Berlin greets John Smith warmly"),
        RetrievedDoc(doc_id=1, score=0.9, sentence="no entities here"),
        RetrievedDoc(doc_id=2, score=0.8, sentence=" ".join(["w"] * 200)),
    ]
    silver = distant_supervision([rec], [docs])
    assert len(silver) == 1
    s = silver[0]
    assert s.tokens == ["Mayor", "of", "Berlin", "greets", "John",
                        "Smith", "warmly"]
    assert s.tags["ner"] == ["B-X", "B-X", "S-LOC", "B-X", "B-PER",
                             "E-PER", "B-X"]


def test_distant_supervision_skips_overlap():
    # 'a b' and 'b c' overlap on token b in the context -> context skipped
    rec = SentenceRecord(
        tokens=["a", "b", "b", "c"],
        tags={"ner": ["B-PER", "E-PER", "B-LOC", "E-LOC"]})
    docs = [RetrievedDoc(doc_id=0, score=1.0, sentence="x a b c y")]
    silver = distant_supervision([rec], [docs])
    assert silver == []
