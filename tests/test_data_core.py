"""Data-core tests: dictionary, tag schemes, CoNLL reading, span metrics."""

from pathlib import Path

import pytest

from kbner_tpu.data import (
    Dictionary,
    EOS_MARKER,
    get_spans,
    iob2,
    iob_iobes,
    load_column_corpus,
    make_tag_dictionary,
    read_column_file,
    to_bioes,
    write_column_file,
)
from kbner_tpu.eval import Metric, evaluate_spans

FIX = Path(__file__).parent / "fixtures"


# -- Dictionary ---------------------------------------------------------------

def test_dictionary_roundtrip(tmp_path):
    d = Dictionary(add_unk=True)
    d.add_item("hello")
    d.add_item("world")
    d.add_item("hello")
    assert len(d) == 3
    assert d.get_idx_for_item("hello") == 1
    assert d.get_idx_for_item("missing") == 0  # <unk>
    p = tmp_path / "dict.json"
    d.save(p)
    d2 = Dictionary.load(p)
    assert d == d2


def test_make_tag_dictionary_order():
    tags = [["O", "B-PER", "I-PER"], ["B-LOC", "O"]]
    d = make_tag_dictionary(tags)
    # Reference order: O first, then corpus order, then <START>/<STOP>
    # (flair/data.py:1083-1104).
    assert d.get_items() == ["O", "B-PER", "I-PER", "B-LOC", "<START>", "<STOP>"]


# -- Tag schemes --------------------------------------------------------------

def test_iob1_to_iob2():
    # IOB1: entity-initial I- becomes B-
    assert iob2(["I-PER", "I-PER", "O", "I-LOC"]) == [
        "B-PER", "I-PER", "O", "B-LOC"]
    assert iob2(["B-PER", "I-PER"]) == ["B-PER", "I-PER"]
    assert iob2(["Q-PER"]) is None


def test_iob_to_bioes():
    assert iob_iobes(["B-PER", "I-PER", "O", "B-LOC"]) == [
        "B-PER", "E-PER", "O", "S-LOC"]
    assert iob_iobes(["B-ORG", "I-ORG", "I-ORG"]) == ["B-ORG", "I-ORG", "E-ORG"]


def test_to_bioes_b_x_context_tokens_become_s_x():
    # KB context tokens are each tagged B-X; consecutive B-X (no I-) convert
    # to S-X, which is what remove_x masking keys on
    # (sequence_tagger_model.py:2448-2506).
    assert to_bioes(["B-X", "B-X", "B-X"]) == ["S-X", "S-X", "S-X"]


def test_get_spans_basic():
    spans = get_spans(["B-PER", "E-PER", "O", "S-LOC"])
    assert [(s.start, s.end, s.label) for s in spans] == [
        (0, 2, "PER"), (3, 4, "LOC")]


def test_get_spans_adjacent_singles():
    spans = get_spans(["S-LOC", "S-LOC"])
    assert [(s.start, s.end, s.label) for s in spans] == [
        (0, 1, "LOC"), (1, 2, "LOC")]


def test_get_spans_x_filter():
    spans = get_spans(["S-PER", "O", "S-X", "S-X"], ignore_labels=("X",))
    assert [(s.start, s.end, s.label) for s in spans] == [(0, 1, "PER")]


def test_get_spans_majority_label():
    # mixed labels inside a run: majority vote, start tag weighted 1.1
    spans = get_spans(["B-PER", "I-LOC", "I-LOC", "E-LOC"])
    assert len(spans) == 1
    assert spans[0].label == "LOC"


# -- CoNLL reading ------------------------------------------------------------

def test_read_column_file_toy():
    recs = read_column_file(
        FIX / "ner_toy" / "train.txt", {0: "text", 1: "ner"},
        comment_symbol="# id", tag_to_bioes="ner",
    )
    assert len(recs) == 8
    assert recs[0].tokens == ["Alice", "Smith", "visited", "Berlin", "."]
    assert recs[0].tags["ner"] == ["B-PER", "E-PER", "O", "S-LOC", "O"]
    assert recs[0].comment == "# id toy-train-1"


def test_load_column_corpus_and_tag_dictionary():
    corpus = load_column_corpus(
        FIX / "ner_toy", {0: "text", 1: "ner"}, comment_symbol="# id",
    )
    assert len(corpus.train) == 8
    assert len(corpus.dev) == 2
    assert len(corpus.test) == 2
    tag_dict = corpus.make_tag_dictionary("ner")
    items = tag_dict.get_items()
    assert items[0] == "O"
    assert items[-2:] == ["<START>", "<STOP>"]
    assert "B-PER" in items and "S-LOC" in items


def test_eos_context_sentences():
    recs = read_column_file(
        FIX / "ner_ctx" / "train.txt", {0: "text", 1: "ner"},
        comment_symbol="# id", tag_to_bioes="ner",
    )
    assert len(recs) == 2
    rec = recs[0]
    assert rec.eos_index == 3
    assert rec.original_tokens() == ["Alice", "visited", "Berlin"]
    # all context tokens incl. <EOS> became S-X
    assert all(t == "S-X" for t in rec.tags["ner"][3:])


def test_write_column_file_roundtrip(tmp_path):
    recs = read_column_file(
        FIX / "ner_toy" / "dev.txt", {0: "text", 1: "ner"},
        comment_symbol="# id", tag_to_bioes="ner",
    )
    out = tmp_path / "out.txt"
    write_column_file(out, recs, layers=("ner",))
    back = read_column_file(out, {0: "text", 1: "ner"}, comment_symbol="# id")
    assert [r.tokens for r in back] == [r.tokens for r in recs]
    assert [r.tags["ner"] for r in back] == [r.tags["ner"] for r in recs]


# -- Metrics ------------------------------------------------------------------

def test_metric_math():
    m = Metric("test")
    for _ in range(3):
        m.add_tp("PER")
    m.add_fp("PER")
    m.add_fn("PER")
    assert m.precision("PER") == pytest.approx(0.75)
    assert m.recall("PER") == pytest.approx(0.75)
    assert m.f_score("PER") == pytest.approx(0.75)


def test_evaluate_spans_perfect_and_miss():
    gold = [["B-PER", "E-PER", "O", "S-LOC"]]
    pred_perfect = [["B-PER", "E-PER", "O", "S-LOC"]]
    m = evaluate_spans(gold, pred_perfect)
    assert m.micro_avg_f_score() == pytest.approx(1.0)

    pred_miss = [["B-PER", "E-PER", "O", "O"]]
    m2 = evaluate_spans(gold, pred_miss)
    assert m2.get_tp("PER") == 1
    assert m2.get_fn("LOC") == 1
    assert m2.micro_avg_f_score() == pytest.approx(2 / 3)


def test_evaluate_spans_filters_x():
    gold = [["S-PER", "S-X", "S-X"]]
    pred = [["S-PER", "S-X", "O"]]  # X disagreement must not count
    m = evaluate_spans(gold, pred)
    assert m.micro_avg_f_score() == pytest.approx(1.0)
