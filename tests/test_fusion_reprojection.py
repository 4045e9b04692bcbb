"""Wiki-Sent anchor re-projection parity (VERDICT r1 item #10).

Reference-schema retrieval rows (``/root/reference/README.md:248-272``)
store a PLAIN matched sentence beside its anchored paragraph; Wiki-Sent
(``--use_paragraph_entity``) recovers the sentence's ``<e:...>`` markup
via ``match_origin_paragraph`` (``kb/context_process.py:153-184``).

Golden strategy as in test_conlleval_parity: execute the reference's own
function (extracted by ast from the read-only upstream file at test time)
and assert our implementation agrees on crafted edge cases and randomized
anchored paragraphs; plus an end-to-end check that ``fuse_contexts``
mode="sentence" re-projects markup when reading reference-schema rows.
"""

import ast
import re
from pathlib import Path

import numpy as np
import pytest

from kbner_tpu.data.conll import EOS_MARKER, SentenceRecord
from kbner_tpu.data.subword import HashTokenizer
from kbner_tpu.retrieval.engine import RetrievedDoc
from kbner_tpu.retrieval.fusion import (
    context_tokens,
    fuse_contexts,
    match_origin_paragraph,
)

REF = Path("/root/reference/kb/context_process.py")


@pytest.fixture(scope="module")
def ref_fn():
    """The reference's match_origin_paragraph, extracted without importing
    the (script-style, argparse-at-import) module."""
    import warnings

    with warnings.catch_warnings():
        # the reference source carries invalid escape sequences ('\.'
        # inside a regex literal); that's its bug, not ours
        warnings.simplefilter("ignore", SyntaxWarning)
        tree = ast.parse(REF.read_text())
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and \
                    node.name == "match_origin_paragraph":
                mod = ast.Module(body=[node], type_ignores=[])
                ns = {"re": re, "pdb": None}
                exec(compile(mod, str(REF), "exec"), ns)
                return ns["match_origin_paragraph"]
    raise AssertionError("reference function not found")


CASES = [
    # entity in the middle
    ("a compilation album by a singer .",
     "a <e:Compilation album>compilation album</e> by a singer ."
     " next sentence here ."),
    # entity at sentence start
    ("studio albums debuted at number one .",
     "intro words . <e:Album>studio albums</e> debuted at number one ."),
    # back-to-back entities and one spanning to the final period
    ("she covered sway in germany",
     "she covered <e:Sway (song)>sway</e> in <e:Germany>germany</e>"),
    # sentence is the whole paragraph
    ("all tracks by bic runga .",
     "all tracks by <e:Bic Runga>bic runga</e> ."),
    # sentence not present -> plain fallback
    ("completely different text .",
     "a <e:X>b</e> c ."),
    # second sentence of a multi-sentence paragraph
    ("the album was released in 1997 .",
     "<e:Drive>drive</e> is an album . the album was released in "
     "<e:1997>1997</e> . it went platinum ."),
]


@pytest.mark.parametrize("sentence,paragraph", CASES)
def test_matches_reference_on_crafted_cases(ref_fn, sentence, paragraph):
    ours = match_origin_paragraph(sentence, paragraph)
    theirs = ref_fn(sentence, paragraph)
    assert ours == theirs
    # round-trip: stripping markup recovers the plain sentence (when found)
    stripped = re.sub(r"<e:[^>]*>|</e>", "", ours)
    if sentence in re.sub(r"<e:[^>]*>|</e>", "", paragraph):
        assert stripped == sentence


def test_matches_reference_on_random_paragraphs(ref_fn):
    rng = np.random.RandomState(0)
    words = ["alpha", "beta", "gamma", "delta", "runga", "album",
             "zealand", "nineteen", "x1", "y2"]
    for trial in range(200):
        # build an anchored paragraph of 1-4 sentences
        sents_plain, sents_anchored = [], []
        for _ in range(rng.randint(1, 5)):
            n = rng.randint(3, 9)
            toks = [words[rng.randint(len(words))] for _ in range(n)]
            plain, anchored = [], []
            i = 0
            while i < n:
                if rng.rand() < 0.35 and i < n:
                    span = min(1 + rng.randint(2), n - i)
                    surf = " ".join(toks[i:i + span])
                    title = surf.title()
                    anchored.append(f"<e:{title}>{surf}</e>")
                    plain.append(surf)
                    i += span
                else:
                    anchored.append(toks[i])
                    plain.append(toks[i])
                    i += 1
            sents_plain.append(" ".join(plain) + " .")
            sents_anchored.append(" ".join(anchored) + " .")
        paragraph = " ".join(sents_anchored)
        # query each sentence of the paragraph
        for s in sents_plain:
            ours = match_origin_paragraph(s, paragraph)
            theirs = ref_fn(s, paragraph)
            assert ours == theirs, (s, paragraph, ours, theirs)


def test_context_tokens_reprojects_reference_schema_rows():
    doc = RetrievedDoc(
        doc_id=-1, score=90.0,
        sentence="all tracks by bic runga .",
        paragraph="all tracks by <e:Bic Runga>bic runga</e> . more text .",
        title="Drive (Bic Runga album)")
    toks = context_tokens(doc, "sentence")
    assert toks == ["all", "tracks", "by", "<e:Bic", "Runga>bic",
                    "runga</e>", "."]
    # self-built KBs already store anchored sentences: no double work
    doc2 = RetrievedDoc(
        doc_id=1, score=1.0,
        sentence="by <e:Bic Runga>bic runga</e> .",
        paragraph="by <e:Bic Runga>bic runga</e> . more .")
    assert context_tokens(doc2, "sentence") == doc2.sentence.split()


def test_fuse_contexts_sentence_mode_end_to_end():
    tok = HashTokenizer(vocab_size=997)
    rec = SentenceRecord(tokens=["bic", "runga", "sings"],
                         tags={"ner": ["B-PER", "E-PER", "O"]})
    docs = [RetrievedDoc(
        doc_id=-1, score=90.0,
        sentence="all tracks by bic runga .",
        paragraph="all tracks by <e:Bic Runga>bic runga</e> . more text .",
        title="Drive")]
    fused = fuse_contexts([rec], [docs], tok, mode="sentence", budget=510)
    toks = fused[0].tokens
    assert toks[:3] == ["bic", "runga", "sings"]
    assert toks[3] == EOS_MARKER
    assert "<e:Bic" in toks and "runga</e>" in toks
    # every context token is tagged B-X
    assert set(fused[0].tags["ner"][4:]) == {"B-X"}
