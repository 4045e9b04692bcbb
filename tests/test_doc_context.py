"""Document-window (v2_doc) context tests."""

from kbner_tpu.data import HashTokenizer, encode_batch
from kbner_tpu.data.conll import SentenceRecord
from kbner_tpu.data.doc_context import (
    make_doc_context_records,
    strip_doc_context,
)

TOK = HashTokenizer(vocab_size=997)


def doc_records():
    sents = [
        (["First", "sentence", "here"], ["O", "O", "O"]),
        (["Alice", "visited", "Berlin"], ["S-PER", "O", "S-LOC"]),
        (["Third", "sentence", "follows"], ["O", "O", "O"]),
        (["Fourth", "one"], ["O", "O"]),
    ]
    return [
        SentenceRecord(tokens=t, tags={"ner": g}, doc_id=0)
        for t, g in sents
    ]


def test_window_includes_neighbors_and_masks_them():
    recs = doc_records()
    windowed, offsets = make_doc_context_records(recs, TOK, budget=510)
    w1 = windowed[1]
    # window contains left and right neighbors
    assert "First" in w1.tokens and "Third" in w1.tokens
    off = offsets[1]
    assert w1.tokens[off:off + 3] == ["Alice", "visited", "Berlin"]
    # context positions are S-X, target tags preserved
    assert w1.tags["ner"][off:off + 3] == ["S-PER", "O", "S-LOC"]
    assert all(t == "S-X" for t in w1.tags["ner"][:off])
    assert all(t == "S-X" for t in w1.tags["ner"][off + 3:])


def test_window_respects_budget():
    recs = doc_records()
    # budget fits the target sentence plus roughly one neighbor
    target_len = 3 * 1  # hash tokenizer: short words -> 1 subtoken each
    windowed, offsets = make_doc_context_records(recs, TOK, budget=7)
    w1 = windowed[1]
    assert len(w1.tokens) < sum(len(r.tokens) for r in recs)


def test_encode_masks_window_context():
    recs = doc_records()
    windowed, offsets = make_doc_context_records(recs, TOK)
    eb = encode_batch(windowed, TOK, None)
    off = offsets[1]
    n = len(windowed[1].tokens)
    crf = eb.crf_mask[1]
    assert (crf[off:off + 3] == 1).all()
    assert (crf[:off] == 0).all()
    assert (crf[off + 3:n] == 0).all()


def test_strip_doc_context_roundtrip():
    recs = doc_records()
    windowed, offsets = make_doc_context_records(recs, TOK)
    preds = [list(w.tags["ner"]) for w in windowed]
    stripped = strip_doc_context(preds, recs, offsets)
    assert stripped[1] == ["S-PER", "O", "S-LOC"]
    assert all(len(s) == len(r.tokens) for s, r in zip(stripped, recs))


def test_documents_do_not_leak_across_doc_ids():
    recs = doc_records()
    recs[3].doc_id = 1  # different document
    windowed, _ = make_doc_context_records(recs, TOK)
    assert "Fourth" not in windowed[1].tokens
    assert "Alice" not in windowed[3].tokens
