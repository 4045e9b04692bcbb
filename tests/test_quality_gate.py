"""Trained-quality gate: the trainer must LEARN, not just run.

VERDICT r2 next #4 — the missing "does it actually learn" evidence
(reference analogue: README.md:178's dev-F1~100 sanity convention).
"""

import numpy as np

from kbner_tpu.data.quality_fixture import make_quality_corpus, run_quality_gate


def test_quality_corpus_is_deterministic_and_well_formed():
    a = make_quality_corpus(seed=3)
    b = make_quality_corpus(seed=3)
    assert [r.tokens for r in a.train] == [r.tokens for r in b.train]
    assert len(a.train) == 240 and len(a.test_list[0]) == 96
    labels = set()
    for rec in a.train:
        assert len(rec.tokens) == len(rec.tags["ner"])
        for t in rec.tags["ner"]:
            if t != "O":
                labels.add(t.split("-", 1)[1])
    assert labels == {"PER", "LOC", "ORG"}
    # entity vocabularies are disjoint -> the task is unambiguous
    toks_by_label = {"PER": set(), "LOC": set(), "ORG": set()}
    for rec in a.train:
        for tok, tag in zip(rec.tokens, rec.tags["ner"]):
            if tag != "O":
                toks_by_label[tag.split("-", 1)[1]].add(tok)
    assert not (toks_by_label["PER"] & toks_by_label["LOC"])
    assert not (toks_by_label["PER"] & toks_by_label["ORG"])
    assert not (toks_by_label["LOC"] & toks_by_label["ORG"])


def test_trained_f1_gate():
    """Held-out span F1 >= 0.95 after a short CPU training run — catches
    quality regressions that compile-and-run tests cannot."""
    f1 = run_quality_gate()
    assert f1 >= 0.95, f"quality gate failed: held-out span F1 {f1:.4f}"


def test_parser_quality_corpus_structure():
    from kbner_tpu.data.quality_fixture import make_parser_quality_corpus

    a = make_parser_quality_corpus(seed=5)
    b = make_parser_quality_corpus(seed=5)
    assert [r.tokens for r in a.train] == [r.tokens for r in b.train]
    for rec in a.train:
        heads = [int(h) for h in rec.tags["head"]]
        assert len(heads) == len(rec.tokens) == len(rec.tags["deprel"])
        assert heads.count(0) == 1  # exactly one root
        for i, h in enumerate(heads, start=1):
            assert 0 <= h <= len(heads) and h != i  # in range, no self-arc


def test_trained_classifier_gate():
    """Held-out accuracy >= 0.95 on the topic corpus — the
    classification-family 'does it learn' gate."""
    from kbner_tpu.data.quality_fixture import run_classifier_quality_gate

    acc = run_classifier_quality_gate()
    assert acc >= 0.95, f"classifier gate failed: held-out acc {acc:.4f}"


def test_trained_uas_gate():
    """Held-out UAS >= 0.9 on the pattern treebank — the parser-family
    'does it learn' gate (biaffine arcs + rels + decode + MST repair)."""
    from kbner_tpu.data.quality_fixture import run_parser_quality_gate

    uas = run_parser_quality_gate()
    assert uas >= 0.9, f"parser quality gate failed: held-out UAS {uas:.4f}"
