"""Majority-voting ensemble tests."""

from kbner_tpu.eval.ensemble import (
    collect_votes,
    ensemble_predictions,
    select_spans,
    spans_to_bioes,
)


def test_unanimous_agreement_passes_through():
    tags = ["B-PER", "E-PER", "O", "S-LOC"]
    out = ensemble_predictions([[tags], [tags], [tags]])
    assert out == [tags]


def test_majority_wins():
    sys1 = ["S-PER", "O", "O"]
    sys2 = ["S-PER", "O", "O"]
    sys3 = ["O", "O", "S-LOC"]
    out = ensemble_predictions([[sys1], [sys2], [sys3]])
    # PER has 2/3 votes >= 1.5 threshold; LOC has 1 < 1.5
    assert out == [["S-PER", "O", "O"]]


def test_overlap_resolved_by_votes_then_length():
    # two systems vote for the long span, one for a sub-span
    long = ["B-ORG", "I-ORG", "E-ORG"]
    short = ["O", "O", "S-ORG"]
    out = ensemble_predictions([[long], [long], [short], [short]])
    # votes tie at 2; longer span wins, overlapping short span dropped
    assert out == [["B-ORG", "I-ORG", "E-ORG"]]


def test_threshold_override():
    sys1 = ["S-PER"]
    sys2 = ["O"]
    sys3 = ["O"]
    assert ensemble_predictions([[sys1], [sys2], [sys3]]) == [["O"]]
    assert ensemble_predictions(
        [[sys1], [sys2], [sys3]], threshold=1) == [["S-PER"]]


def test_x_spans_ignored():
    sys1 = ["S-PER", "S-X"]
    sys2 = ["S-PER", "S-X"]
    out = ensemble_predictions([[sys1], [sys2]])
    assert out == [["S-PER", "O"]]


def test_spans_to_bioes_roundtrip():
    spans = [(0, 2, "PER"), (3, 4, "LOC")]
    assert spans_to_bioes(spans, 5) == ["B-PER", "E-PER", "O", "S-LOC", "O"]


def test_select_spans_greedy():
    votes = {(0, 3, "ORG"): 3, (1, 2, "PER"): 3, (4, 5, "LOC"): 2}
    chosen = select_spans(votes, threshold=2)
    # ORG (len 3) beats PER (len 1) on the tie; LOC independent
    assert chosen == [(0, 3, "ORG"), (4, 5, "LOC")]
