"""First-order projective dependency tree CRF (inside algorithm).

The probabilistic counterpart of Eisner decoding for the biaffine parser
family: partition function, marginal arc probabilities, and (partial-
annotation) tree CRF loss. Behavioral spec:
``/root/reference/flair/parser/utils/alg.py:92-179`` (``crf`` + ``inside``)
— there a torch chart loop with autograd marginals; here the O(n) width
recurrence runs under ``lax.scan`` with flat gather/scatter index maps, so
one compiled body serves every width and the whole op jits with static
shapes and differentiates cleanly (marginals ARE ``jax.grad`` of logZ).

Chart layout (per batch row): a single [n, n] table per chart,
``s_c[x, y]`` = log-sum of complete spans headed at x covering through y
(x < y rightward, x > y leftward), ``s_i`` likewise for incomplete spans
— the classic Eisner four-chart scheme folded into two triangles, same as
the reference. Position 0 is ROOT; the root takes exactly ONE child (the
reference's ``s_c[0, w][lens.ne(w)] = -inf``, :176).

All masking uses a finite ``NEG`` sentinel instead of -inf so gradients
(marginals) stay NaN-free.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def _lse(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    m = jnp.max(x, axis=axis)
    return m + jnp.log(
        jnp.sum(jnp.exp(x - jnp.expand_dims(m, axis)), axis=axis))


def tree_crf_inside(
    scores: jnp.ndarray,  # [B, n, n] scores[b, d, h] (grid incl. ROOT=0)
    word_mask: jnp.ndarray,  # [B, n-1] 1 for real words (grid pos 1..n-1)
    arc_mask: Optional[jnp.ndarray] = None,  # [B, n, n] allowed arcs (d, h)
) -> jnp.ndarray:
    """log partition over single-root projective trees, [B].

    ``scores[b, d, h]`` is the arc score head h -> dependent d, matching
    ``BiaffineParser.scores`` orientation. ``arc_mask`` restricts the sum
    to trees whose arcs are all allowed (partial-annotation support,
    reference ``inside``'s ``cands``).
    """
    B, n, _ = scores.shape
    A = jnp.swapaxes(scores, 1, 2).astype(jnp.float32)  # A[b, h, d]
    if arc_mask is not None:
        A = jnp.where(jnp.swapaxes(arc_mask, 1, 2), A, NEG)
    ext = jnp.concatenate(
        [jnp.ones((B, 1), bool), word_mask.astype(bool)], axis=1)  # [B, n]
    lens = jnp.sum(word_mask.astype(jnp.int32), axis=1)  # last word index

    a_idx = jnp.arange(n)  # span starts
    m_idx = jnp.arange(n)  # split offsets (masked to < w per step)
    A_flat = A.reshape(B, n * n)

    def take(flat, idx):  # [B, n*n] gathered by a traced [n, n] index map
        return jnp.take(flat, jnp.clip(idx, 0, n * n - 1).ravel(),
                        axis=1).reshape((B,) + idx.shape)

    def step(carry, w):
        s_i, s_c = carry  # flat [B, n*n]
        a = a_idx[:, None]  # [n, 1]
        m = m_idx[None, :]  # [1, n]
        j = a_idx + w  # [n] span ends (may exceed n-1)
        m_ok = (m < w)
        # flat scatter targets; spans running past the grid go to an
        # explicitly out-of-range slot so mode="drop" discards them (the
        # raw flat index a*n + j can land IN range when j >= n and would
        # clobber a cell of the other triangle)
        oob = n * n
        at_left = jnp.where(j < n, j * n + a_idx, oob)  # cell (j, a)
        at_right = jnp.where(j < n, a_idx * n + j, oob)  # cell (a, j)

        # span validity: both endpoints inside the (root-extended) sentence
        end_in = (j < n)
        end_mask = jnp.take(
            ext, jnp.clip(j, 0, n - 1), axis=1) & end_in  # [B, n]
        diag = ext[:, a_idx] & end_mask  # [B, n]

        # ilr[b, a, m] = C(a -> a+m) + C(j -> a+m+1)
        c1 = take(s_c, a * n + jnp.clip(a + m, 0, n - 1))
        c2 = take(s_c, jnp.clip(a + w, 0, n - 1) * n
                  + jnp.clip(a + m + 1, 0, n - 1))
        ilr = _lse(jnp.where(m_ok, c1 + c2, NEG), -1)  # [B, n]

        # I(j -> a) and I(a -> j)
        il = ilr + jnp.take(
            A_flat, jnp.clip(j, 0, n - 1) * n + a_idx, axis=1)
        ir = ilr + jnp.take(
            A_flat, a_idx * n + jnp.clip(j, 0, n - 1), axis=1)
        s_i = s_i.at[:, at_left].set(
            jnp.where(diag, il, NEG), mode="drop")
        s_i = s_i.at[:, at_right].set(
            jnp.where(diag, ir, NEG), mode="drop")

        # C(j -> a) = lse_m C(a+m -> a) + I(j -> a+m)
        c3 = take(s_c, jnp.clip(a + m, 0, n - 1) * n + a)
        c4 = take(s_i, jnp.clip(a + w, 0, n - 1) * n
                  + jnp.clip(a + m, 0, n - 1))
        cl = _lse(jnp.where(m_ok, c3 + c4, NEG), -1)
        # C(a -> j) = lse_m I(a -> a+m+1) + C(a+m+1 -> j)
        c5 = take(s_i, a * n + jnp.clip(a + m + 1, 0, n - 1))
        c6 = take(s_c, jnp.clip(a + m + 1, 0, n - 1) * n
                  + jnp.clip(a + w, 0, n - 1))
        cr = _lse(jnp.where(m_ok, c5 + c6, NEG), -1)
        # single-root: C(0 -> w) only exists when it spans the sentence
        root_ok = (a_idx[None, :] > 0) | (lens[:, None] == w)
        s_c = s_c.at[:, at_left].set(
            jnp.where(diag, cl, NEG), mode="drop")
        s_c = s_c.at[:, at_right].set(
            jnp.where(diag & root_ok, cr, NEG), mode="drop")
        return (s_i, s_c), None

    s_i0 = jnp.full((B, n * n), NEG, jnp.float32)
    s_c0 = jnp.full((B, n * n), NEG, jnp.float32)
    diag_pos = jnp.arange(n) * n + jnp.arange(n)
    s_c0 = s_c0.at[:, diag_pos].set(0.0)

    if n > 1:
        (s_i0, s_c0), _ = jax.lax.scan(
            step, (s_i0, s_c0), jnp.arange(1, n))
    # logZ = C(0 -> last word)
    return jnp.take_along_axis(s_c0, lens[:, None], axis=1)[:, 0]


def tree_crf_marginals(
    scores: jnp.ndarray,
    word_mask: jnp.ndarray,
    arc_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """P(arc h -> d | sentence) as [B, n, n] in ``scores`` orientation —
    the reference computes these as ``autograd.grad(logZ, scores)``
    (``alg.py:101-104``); here literally ``jax.grad``."""
    def f(s):
        return jnp.sum(tree_crf_inside(s, word_mask, arc_mask))

    return jax.grad(f)(scores)


def tree_crf_loss(
    scores: jnp.ndarray,  # [B, n, n] (d, h)
    word_mask: jnp.ndarray,  # [B, n-1]
    heads: jnp.ndarray,  # [B, n-1] gold head grid index per word; < 0 = unannotated
    partial: bool = False,
) -> jnp.ndarray:
    """Per-sentence tree CRF negative log-likelihood, [B].

    Full supervision: ``logZ - score(gold tree)``. With ``partial=True``,
    unannotated words (head < 0) are marginalized: the gold term becomes
    the log-sum over all trees consistent with the annotated arcs
    (a second constrained inside pass, reference ``crf``'s ``partial``
    branch, ``alg.py:105-110``).
    """
    B, n, _ = scores.shape
    wm = word_mask.astype(jnp.float32)
    logZ = tree_crf_inside(scores, word_mask)
    if partial:
        d_grid = jnp.arange(1, n)[None, :, None]  # word rows of the grid
        h_grid = jnp.arange(n)[None, None, :]
        annotated = (heads >= 0) & word_mask.astype(bool)  # [B, n-1]
        allow_words = jnp.where(
            annotated[:, :, None],
            h_grid == jnp.maximum(heads, 0)[:, :, None],
            jnp.ones((1, 1, n), bool))  # [B, n-1, n]
        del d_grid
        arc_mask = jnp.concatenate(
            [jnp.ones((B, 1, n), bool), allow_words], axis=1)
        logZ_gold = tree_crf_inside(scores, word_mask, arc_mask)
        return logZ - logZ_gold
    gold = jnp.take_along_axis(
        scores[:, 1:, :], jnp.maximum(heads, 0)[:, :, None], axis=2)[..., 0]
    gold = jnp.sum(gold * wm, axis=1)
    return logZ - gold
