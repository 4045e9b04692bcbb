"""Context fusion tests: <EOS>/B-X emission, budget enforcement, entity
extraction for iterative retrieval."""

from kbner_tpu.data import EOS_MARKER, SentenceRecord, to_bioes
from kbner_tpu.data.subword import HashTokenizer
from kbner_tpu.retrieval.engine import RetrievedDoc
from kbner_tpu.retrieval.fusion import extract_entities, fuse_contexts


def rec(tokens, tags):
    return SentenceRecord(tokens=tokens, tags={"ner": tags})


def docs(*sentences, title="T"):
    return [RetrievedDoc(doc_id=i, score=10.0 - i, sentence=s, title=title)
            for i, s in enumerate(sentences)]


def test_fuse_appends_eos_and_bx_tags():
    tok = HashTokenizer()
    records = [rec(["Alice", "visited", "Berlin"], ["B-PER", "O", "B-LOC"])]
    results = [docs("Berlin is the capital", title="Berlin")]
    fused = fuse_contexts(records, results, tok, mode="sentence_link",
                          budget=510)
    f = fused[0]
    assert EOS_MARKER in f.tokens
    eos = f.tokens.index(EOS_MARKER)
    assert f.tokens[:eos] == ["Alice", "visited", "Berlin"]
    # sentence_link mode: [ title ] sentence
    assert f.tokens[eos + 1:eos + 4] == ["[", "Berlin", "]"]
    assert all(t == "B-X" for t in f.tags["ner"][eos:])
    # original tags intact
    assert f.tags["ner"][:eos] == ["B-PER", "O", "B-LOC"]


def test_fuse_budget_limits_contexts():
    tok = HashTokenizer()
    records = [rec(["Hello"], ["O"])]
    long_ctx = " ".join(["word"] * 50)
    results = [docs(long_ctx, long_ctx, long_ctx)]
    # budget fits roughly one context only
    fused = fuse_contexts(records, results, tok, mode="sentence",
                          budget=60)
    f = fused[0]
    n_ctx_tokens = len(f.tokens) - 2  # minus original + <EOS>
    assert n_ctx_tokens == 50  # exactly one context admitted


def test_fuse_no_context_when_budget_too_small():
    tok = HashTokenizer()
    records = [rec(["Hello"], ["O"])]
    results = [docs(" ".join(["word"] * 100))]
    fused = fuse_contexts(records, results, tok, budget=20, mode="sentence")
    assert fused[0].tokens == ["Hello"]
    assert EOS_MARKER not in fused[0].tokens


def test_fuse_drops_over_budget_train_sentences():
    tok = HashTokenizer()
    records = [rec(["w"] * 300, ["O"] * 300), rec(["ok"], ["O"])]
    results = [[], []]
    fused = fuse_contexts(records, results, tok, budget=100,
                          drop_over_budget_train=True, mode="sentence")
    assert len(fused) == 1
    assert fused[0].tokens == ["ok"]


def test_fused_record_roundtrips_through_bioes():
    tok = HashTokenizer()
    records = [rec(["Alice", "visited", "Berlin"], ["B-PER", "O", "B-LOC"])]
    results = [docs("Berlin capital of Germany")]
    fused = fuse_contexts(records, results, tok, mode="sentence")
    bioes = to_bioes(fused[0].tags["ner"])
    # context B-X tags become S-X after conversion
    eos = fused[0].tokens.index(EOS_MARKER)
    assert all(t == "S-X" for t in bioes[eos:])


def test_extract_entities_bioes_and_bio():
    r1 = rec(["Alice", "Smith", "visited", "Berlin"],
             ["B-PER", "E-PER", "O", "S-LOC"])
    assert extract_entities(r1) == ["Alice Smith", "Berlin"]
    r2 = rec(["The", "European", "Union", "met"],
             ["O", "B-ORG", "I-ORG", "O"])
    assert extract_entities(r2) == ["European Union"]


def test_extract_entities_stops_at_eos():
    r = rec(["Alice", EOS_MARKER, "Berlin"], ["S-PER", "S-X", "S-X"])
    assert extract_entities(r) == ["Alice"]
