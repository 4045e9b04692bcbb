"""Golden parity with the reference's own runnable conlleval.

SURVEY §7 gate #2: the span-F1 harness must match conlleval on prediction
files. ``/root/reference/conlleval_perl.py`` needs no downloads, so the
test runs it as a subprocess on generated prediction files — including
S-X context tokens, BIOES edge cases, and label conflicts — and asserts
``eval/conlleval.py`` reproduces its counts and per-class/overall F1
exactly. A second test pins the relationship to the in-training flair
Metric (eval/metrics.py): equal on well-formed BIOES.
"""

import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from kbner_tpu.eval.conlleval import conll_evaluate
from kbner_tpu.eval.metrics import evaluate_spans

REF_EVAL = Path("/root/reference/conlleval_perl.py")

TYPES = ["PER", "LOC", "ORG", "PROD", "CW"]


def random_bioes(rng, n, types=TYPES, malformed=False):
    """Random BIOES tag sequence; optionally with scheme violations."""
    tags = []
    i = 0
    while i < n:
        if rng.rand() < 0.5:
            tags.append("O")
            i += 1
            continue
        ty = types[rng.randint(len(types))]
        span_len = min(1 + rng.randint(4), n - i)
        if span_len == 1:
            tags.append(f"S-{ty}")
        else:
            body = [f"B-{ty}"] + [f"I-{ty}"] * (span_len - 2) + [f"E-{ty}"]
            tags.extend(body)
        i += span_len
    if malformed:
        # inject label conflicts and orphan continuations
        for _ in range(max(1, n // 8)):
            j = rng.randint(n)
            ty = types[rng.randint(len(types))]
            tags[j] = rng.choice(["I-", "E-", "B-"]) + ty
    return tags[:n]


def make_sentences(rng, n_sents, with_x=False, malformed=False):
    gold, pred = [], []
    for _ in range(n_sents):
        n = 3 + rng.randint(12)
        g = random_bioes(rng, n, malformed=malformed)
        # prediction: gold with random corruptions (drop/flip/shift spans)
        p = random_bioes(rng, n, malformed=malformed)
        keep = rng.rand(n) < 0.6
        p = [gt if k else pt for gt, pt, k in zip(g, p, keep)]
        if with_x:
            # context tokens after <EOS>: S-X in gold AND pred (the decode
            # path re-fills masked positions with S-X, trainer.py:397-398)
            n_ctx = rng.randint(5)
            g = g + ["S-X"] * n_ctx
            p = p + ["S-X"] * n_ctx
        gold.append(g)
        pred.append(p)
    return gold, pred


def run_reference_conlleval(gold, pred, remove_x=False):
    """Write 'token gold pred' lines, run the reference evaluator, parse."""
    lines = []
    for g_sent, p_sent in zip(gold, pred):
        for i, (g, p) in enumerate(zip(g_sent, p_sent)):
            lines.append(f"tok{i} {g} {p}")
        lines.append("")
    cmd = [sys.executable, str(REF_EVAL)]
    if remove_x:
        cmd.append("--remove_x")
    out = subprocess.run(
        cmd, input="\n".join(lines), capture_output=True, text=True,
        check=True).stdout
    m = re.search(
        r"processed (\d+) tokens with (\d+) phrases; found: (\d+) phrases; "
        r"correct: (\d+)", out)
    n_tokens, n_gold, n_pred, n_correct = map(int, m.groups())
    m = re.search(r"accuracy: *([\d.]+)%; precision: *([\d.]+)%; "
                  r"recall: *([\d.]+)%; FB1: *([\d.]+)", out)
    acc, prec, rec, f1 = map(float, m.groups())
    per_type = {}
    for m in re.finditer(
            r"^ *(\S+): precision: *([\d.]+)%; recall: *([\d.]+)%; "
            r"FB1: *([\d.]+) +(\d+)$", out, re.M):
        per_type[m.group(1)] = (
            float(m.group(2)), float(m.group(3)), float(m.group(4)),
            int(m.group(5)))
    return {
        "n_tokens": n_tokens, "n_gold": n_gold, "n_pred": n_pred,
        "n_correct": n_correct, "accuracy": acc, "precision": prec,
        "recall": rec, "f1": f1, "per_type": per_type,
    }


needs_reference = pytest.mark.skipif(
    not REF_EVAL.exists(), reason="reference conlleval not mounted")


@needs_reference
@pytest.mark.parametrize("malformed,with_x,remove_x", [
    (False, False, False),   # clean BIOES
    (True, False, False),    # label conflicts / orphan I-/E- tags
    (False, True, True),     # S-X context tokens with --remove_x
    (True, True, True),      # everything at once
])
def test_conll_evaluate_matches_reference(malformed, with_x, remove_x):
    rng = np.random.RandomState(hash((malformed, with_x)) % 2**31)
    gold, pred = make_sentences(
        rng, 60, with_x=with_x, malformed=malformed)
    want = run_reference_conlleval(gold, pred, remove_x=remove_x)
    got = conll_evaluate(gold, pred, remove_x=remove_x)

    assert got.n_tokens == want["n_tokens"]
    assert sum(got.gold_chunks.values()) == want["n_gold"]
    assert sum(got.pred_chunks.values()) == want["n_pred"]
    assert sum(got.correct_chunks.values()) == want["n_correct"]
    assert 100 * got.accuracy() == pytest.approx(want["accuracy"], abs=6e-3)
    prec, rec, f1 = got.overall()
    assert 100 * prec == pytest.approx(want["precision"], abs=6e-3)
    assert 100 * rec == pytest.approx(want["recall"], abs=6e-3)
    assert 100 * f1 == pytest.approx(want["f1"], abs=6e-3)
    mine = got.per_type()
    assert set(mine) == set(want["per_type"])
    for ty, (wp, wr, wf, wfound) in want["per_type"].items():
        p, r, f = mine[ty]
        assert 100 * p == pytest.approx(wp, abs=6e-3), ty
        assert 100 * r == pytest.approx(wr, abs=6e-3), ty
        assert 100 * f == pytest.approx(wf, abs=6e-3), ty
        assert got.pred_chunks.get(ty, 0) == wfound, ty


def make_wellformed_pair(rng, n_sents):
    """(gold, pred) where BOTH are valid BIOES: pred corrupts gold at the
    span level (drop / relabel / keep), never token-wise."""
    gold, pred = [], []
    for _ in range(n_sents):
        n = 3 + rng.randint(12)
        g, p = [], []
        i = 0
        while i < n:
            if rng.rand() < 0.5:
                g.append("O")
                # sometimes hallucinate a single-token span in pred
                p.append(f"S-{TYPES[rng.randint(len(TYPES))]}"
                         if rng.rand() < 0.1 else "O")
                i += 1
                continue
            ty = TYPES[rng.randint(len(TYPES))]
            span_len = min(1 + rng.randint(4), n - i)
            r = rng.rand()
            p_ty = (ty if r < 0.6 else
                    TYPES[rng.randint(len(TYPES))] if r < 0.85 else None)
            for side, t in ((g, ty), (p, p_ty)):
                if t is None:
                    side.extend(["O"] * span_len)
                elif span_len == 1:
                    side.append(f"S-{t}")
                else:
                    side.extend([f"B-{t}"] + [f"I-{t}"] * (span_len - 2)
                                + [f"E-{t}"])
            i += span_len
        n_ctx = rng.randint(5)
        gold.append(g + ["S-X"] * n_ctx)
        pred.append(p + ["S-X"] * n_ctx)
    return gold, pred


def test_flair_metric_equals_conlleval_on_wellformed():
    """On valid BIOES output (the CRF-decode case) the in-training span
    metric and conlleval agree per class and overall."""
    rng = np.random.RandomState(7)
    gold, pred = make_wellformed_pair(rng, 80)
    metric = evaluate_spans(gold, pred)
    ce = conll_evaluate(gold, pred, remove_x=True)
    assert metric.micro_avg_f_score() == pytest.approx(ce.micro_f1())
    assert metric.macro_avg_f_score() == pytest.approx(ce.macro_f1())
    for ty, (p, r, f) in ce.per_type().items():
        assert metric.f_score(ty) == pytest.approx(f), ty
        assert metric.precision(ty) == pytest.approx(p), ty
        assert metric.recall(ty) == pytest.approx(r), ty
