"""Linear-chain CRF ops: forward NLL, Viterbi decode, posterior marginals.

TPU-first reimplementation of the reference CRF
(``/root/reference/flair/models/sequence_tagger_model.py``):

  - ``_forward_alg`` (:1329-1394)  -> :func:`crf_forward` (lax.scan logsumexp)
  - ``_score_sentence`` (:2544-2591) -> :func:`crf_gold_score` (vectorized)
  - ``_viterbi_decode`` (:1248-1327) -> :func:`crf_decode` (scan + backtrace,
    batched; the reference decodes per-sentence on host)
  - forward-backward posterior (:1182-1192) -> :func:`crf_marginals`

Masking design: the reference removes retrieved-context tokens (gold ``S-X``)
by *compacting* features/tags to masked lengths before the CRF
(``sequence_tagger_model.py:2448-2506``). Compaction is a dynamic-shape
operation, hostile to XLA. We instead use **transition-skip masking**: at a
masked step the forward variables carry through unchanged, so position t-1
connects directly to the next unmasked position — mathematically identical to
compaction, with static shapes. Padding and X-masking use the same mechanism.

Conventions:
  - ``transitions[i, j]`` = score of moving FROM tag i TO tag j.
  - The tag dictionary includes ``<START>`` and ``<STOP>`` as its last two
    items (see ``data.make_tag_dictionary``); pass their indices explicitly.
  - ``mask[b, 0]`` must be 1 (the first token of a sentence is never padding
    and never a retrieved-context token — context follows ``<EOS>``).
  - All CRF math runs in float32: K is small (tens of tags), so the CRF is
    negligible compute next to the encoder; numerics matter more than speed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _masked_step(alpha, step_val, mask_t):
    """Select scan output vs carried-through alpha per batch element."""
    return jnp.where(mask_t[:, None], step_val, alpha)


def _trans3(transitions: jnp.ndarray, B: int) -> jnp.ndarray:
    """Normalize transitions to [B, K, K] (per-sentence matrices support the
    reference's enhanced per-language CRF, sequence_tagger_model.py:391-415,
    set_enhanced_transitions :1054-1063)."""
    transitions = transitions.astype(jnp.float32)
    if transitions.ndim == 2:
        return jnp.broadcast_to(transitions[None], (B,) + transitions.shape)
    return transitions


def crf_forward(
    emissions: jnp.ndarray,  # [B, T, K] float
    mask: jnp.ndarray,  # [B, T] bool/int
    transitions: jnp.ndarray,  # [K, K] float
    start_idx: int,
    stop_idx: int,
) -> jnp.ndarray:
    """Log partition function log Z per sentence. Returns [B]."""
    emissions = emissions.astype(jnp.float32)
    mask = mask.astype(bool)
    B, T, K = emissions.shape
    trans = _trans3(transitions, B)  # [B, K, K]

    # alpha_0: START -> tag + first emission
    alpha0 = trans[:, start_idx, :] + emissions[:, 0, :]

    def step(alpha, inputs):
        emit_t, mask_t = inputs  # [B, K], [B]
        # scores[b, i, j] = alpha[b, i] + trans[b, i, j] + emit[b, j]
        scores = alpha[:, :, None] + trans + emit_t[:, None, :]
        new_alpha = jax.nn.logsumexp(scores, axis=1)
        return _masked_step(alpha, new_alpha, mask_t), None

    xs = (
        jnp.moveaxis(emissions[:, 1:, :], 1, 0),  # [T-1, B, K]
        jnp.moveaxis(mask[:, 1:], 1, 0),  # [T-1, B]
    )
    alpha, _ = jax.lax.scan(step, alpha0, xs)
    return jax.nn.logsumexp(alpha + trans[:, :, stop_idx], axis=1)


def crf_gold_score(
    emissions: jnp.ndarray,  # [B, T, K]
    tags: jnp.ndarray,  # [B, T] int
    mask: jnp.ndarray,  # [B, T]
    transitions: jnp.ndarray,  # [K, K]
    start_idx: int,
    stop_idx: int,
) -> jnp.ndarray:
    """Score of the gold path, skipping masked positions. Returns [B].

    Equivalent to the reference's ``_score_sentence`` on compacted sequences
    (``sequence_tagger_model.py:2544-2591``).
    """
    emissions = emissions.astype(jnp.float32)
    mask = mask.astype(bool)
    B, T, K = emissions.shape
    trans = _trans3(transitions, B)
    batch_ix = jnp.arange(B)

    emit_scores = jnp.take_along_axis(emissions, tags[:, :, None], axis=2)[..., 0]
    emit_total = jnp.sum(jnp.where(mask, emit_scores, 0.0), axis=1)

    # previous unmasked tag for each position: scan carrying last real tag,
    # initialized to START.
    def prev_step(carry, inputs):
        tag_t, mask_t = inputs
        out = carry
        new_carry = jnp.where(mask_t, tag_t, carry)
        return new_carry, out

    last_tag, prev_tags = jax.lax.scan(
        prev_step,
        jnp.full((B,), start_idx, dtype=tags.dtype),
        (jnp.moveaxis(tags, 1, 0), jnp.moveaxis(mask, 1, 0)),
    )
    prev_tags = jnp.moveaxis(prev_tags, 0, 1)  # [B, T]: tag before position t

    trans_scores = trans[batch_ix[:, None], prev_tags, tags]  # [B, T]
    trans_total = jnp.sum(jnp.where(mask, trans_scores, 0.0), axis=1)
    stop_score = trans[batch_ix, last_tag, stop_idx]
    return emit_total + trans_total + stop_score


def crf_neg_log_likelihood(
    emissions: jnp.ndarray,
    tags: jnp.ndarray,
    mask: jnp.ndarray,
    transitions: jnp.ndarray,
    start_idx: int,
    stop_idx: int,
) -> jnp.ndarray:
    """Per-sentence CRF negative log-likelihood. Returns [B].

    The reference averages this over the batch
    (``sequence_tagger_model.py:2490-2506``); callers decide the reduction.
    """
    log_z = crf_forward(emissions, mask, transitions, start_idx, stop_idx)
    gold = crf_gold_score(emissions, tags, mask, transitions, start_idx, stop_idx)
    return log_z - gold


def crf_decode(
    emissions: jnp.ndarray,  # [B, T, K]
    mask: jnp.ndarray,  # [B, T]
    transitions: jnp.ndarray,  # [K, K]
    start_idx: int,
    stop_idx: int,
    pad_tag: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Viterbi decode with transition-skip masking.

    Returns ``(best_tags [B, T] int32, best_score [B] float32)``. Masked
    positions are filled with ``pad_tag``; the caller overwrites
    retrieved-context positions with the X tag when writing predictions, as
    the reference re-pads decoded sequences (``:1198-1208``).
    """
    emissions = emissions.astype(jnp.float32)
    mask = mask.astype(bool)
    B, T, K = emissions.shape
    trans = _trans3(transitions, B)
    identity_bp = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))

    alpha0 = trans[:, start_idx, :] + emissions[:, 0, :]

    def step(alpha, inputs):
        emit_t, mask_t = inputs
        scores = alpha[:, :, None] + trans  # [B, K, K]
        best_prev = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [B, K]
        best_score = jnp.max(scores, axis=1) + emit_t  # [B, K]
        new_alpha = _masked_step(alpha, best_score, mask_t)
        bp = jnp.where(mask_t[:, None], best_prev, identity_bp)
        return new_alpha, bp

    xs = (
        jnp.moveaxis(emissions[:, 1:, :], 1, 0),
        jnp.moveaxis(mask[:, 1:], 1, 0),
    )
    alpha, bps = jax.lax.scan(step, alpha0, xs)  # bps: [T-1, B, K]

    final = alpha + trans[:, :, stop_idx]
    last_tag = jnp.argmax(final, axis=1).astype(jnp.int32)  # [B]
    best_score = jnp.max(final, axis=1)

    def backtrace(tag_next, bp_t):
        tag_t = jnp.take_along_axis(bp_t, tag_next[:, None], axis=1)[:, 0]
        return tag_t, tag_next

    # bps[i] maps the tag at position i+1 to the best tag at position i, so
    # the reverse scan emits tags for positions 1..T-1 and its final carry is
    # the position-0 tag.
    first_tag, tags_rev = jax.lax.scan(backtrace, last_tag, bps, reverse=True)
    if T > 1:
        tags = jnp.concatenate([first_tag[None, :], tags_rev], axis=0)
    else:
        tags = last_tag[None, :]
    tags = jnp.moveaxis(tags, 0, 1)  # [B, T]
    tags = jnp.where(mask, tags, pad_tag)
    return tags.astype(jnp.int32), best_score


def crf_marginals(
    emissions: jnp.ndarray,  # [B, T, K]
    mask: jnp.ndarray,  # [B, T]
    transitions: jnp.ndarray,  # [K, K]
    start_idx: int,
    stop_idx: int,
) -> jnp.ndarray:
    """Posterior tag marginals p(y_t = k | x) via forward-backward.

    Returns [B, T, K]; rows at masked positions are uniform (they carry no
    probability mass in the chain). Used for posterior distillation and the
    multi-view agreement losses (``sequence_tagger_model.py:1182-1192``).
    """
    emissions = emissions.astype(jnp.float32)
    mask = mask.astype(bool)
    B, T, K = emissions.shape
    trans = _trans3(transitions, B)

    # Forward pass, keeping all alphas.
    alpha0 = trans[:, start_idx, :] + emissions[:, 0, :]

    def fstep(alpha, inputs):
        emit_t, mask_t = inputs
        scores = alpha[:, :, None] + trans + emit_t[:, None, :]
        new_alpha = _masked_step(alpha, jax.nn.logsumexp(scores, axis=1), mask_t)
        return new_alpha, new_alpha

    xs = (
        jnp.moveaxis(emissions[:, 1:, :], 1, 0),
        jnp.moveaxis(mask[:, 1:], 1, 0),
    )
    alphaT, alphas_rest = jax.lax.scan(fstep, alpha0, xs)
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T, B, K]

    # Backward pass: beta_t[k] = log sum over paths from t (in state k) to STOP.
    betaT = trans[:, :, stop_idx]  # [B, K]

    def bstep(beta, inputs):
        emit_next, mask_next = inputs  # emission at t+1, mask at t+1
        scores = trans + (emit_next + beta)[:, None, :]
        new_beta = _masked_step(beta, jax.nn.logsumexp(scores, axis=2), mask_next)
        # reverse scan at element i consumes beta_{i+1} and produces beta_i;
        # emit the produced value so ys = [beta_0 .. beta_{T-2}].
        return new_beta, new_beta

    _, betas_rev = jax.lax.scan(
        bstep,
        betaT,
        (
            jnp.moveaxis(emissions[:, 1:, :], 1, 0),
            jnp.moveaxis(mask[:, 1:], 1, 0),
        ),
        reverse=True,
    )
    betas = jnp.concatenate([betas_rev, betaT[None]], axis=0)  # [T, B, K]

    log_z = jax.nn.logsumexp(alphaT + trans[:, :, stop_idx], axis=1)
    log_marg = alphas + betas - log_z[None, :, None]  # [T, B, K]
    marg = jnp.exp(jnp.moveaxis(log_marg, 0, 1))  # [B, T, K]
    uniform = jnp.full_like(marg, 1.0 / K)
    return jnp.where(mask[:, :, None], marg, uniform)


def crf_decode_nbest(
    emissions: jnp.ndarray,  # [B, T, K]
    mask: jnp.ndarray,  # [B, T]
    transitions: jnp.ndarray,  # [K, K]
    start_idx: int,
    stop_idx: int,
    n_best: int = 5,
    pad_tag: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """N-best Viterbi (reference ``_viterbi_decode_nbest``,
    sequence_tagger_model.py:1660 / CRF.py:29-418).

    Returns ``(tags [B, N, T] int32, scores [B, N] float32)``, best first.
    State is [B, K, N]: the N best path scores ending in each tag; each scan
    step takes a top-N over the (prev tag x prev rank) axis per next tag.
    """
    emissions = emissions.astype(jnp.float32)
    transitions = transitions.astype(jnp.float32)
    mask = mask.astype(bool)
    B, T, K = emissions.shape
    N = n_best

    alpha0 = jnp.full((B, K, N), NEG_INF)
    alpha0 = alpha0.at[:, :, 0].set(
        transitions[start_idx][None, :] + emissions[:, 0, :])

    # identity backpointers for masked steps
    id_tag = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, N))
    id_rank = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, K, N))

    def step(alpha, inputs):
        emit_t, mask_t = inputs  # [B, K], [B]
        # cand[b, k', k, n] = alpha[b, k, n] + trans[k, k']
        cand = alpha[:, None, :, :] + jnp.moveaxis(
            transitions, 0, 1)[None, :, :, None]  # [B, K', K, N]
        flat = cand.reshape(B, K, K * N)
        vals, idx = jax.lax.top_k(flat, N)  # [B, K', N]
        new_alpha = vals + emit_t[:, :, None]
        prev_tag = (idx // N).astype(jnp.int32)
        prev_rank = (idx % N).astype(jnp.int32)
        alpha_out = jnp.where(mask_t[:, None, None], new_alpha, alpha)
        bp_tag = jnp.where(mask_t[:, None, None], prev_tag, id_tag)
        bp_rank = jnp.where(mask_t[:, None, None], prev_rank, id_rank)
        return alpha_out, (bp_tag, bp_rank)

    xs = (
        jnp.moveaxis(emissions[:, 1:, :], 1, 0),
        jnp.moveaxis(mask[:, 1:], 1, 0),
    )
    alphaT, (bp_tags, bp_ranks) = jax.lax.scan(step, alpha0, xs)

    final = alphaT + transitions[:, stop_idx][None, :, None]  # [B, K, N]
    flat = final.reshape(B, K * N)
    best_scores, best_idx = jax.lax.top_k(flat, N)  # [B, N]
    cur_tag = (best_idx // N).astype(jnp.int32)
    cur_rank = (best_idx % N).astype(jnp.int32)

    def backtrace(carry, bps):
        tag_next, rank_next = carry  # [B, N] each
        bp_tag_t, bp_rank_t = bps  # [B, K, N]
        flat_idx = tag_next * N + rank_next
        tag_t = jnp.take_along_axis(
            bp_tag_t.reshape(B, K * N), flat_idx, axis=1)
        rank_t = jnp.take_along_axis(
            bp_rank_t.reshape(B, K * N), flat_idx, axis=1)
        return (tag_t, rank_t), tag_next

    (first_tag, _), tags_rev = jax.lax.scan(
        backtrace, (cur_tag, cur_rank), (bp_tags, bp_ranks), reverse=True)
    if T > 1:
        tags = jnp.concatenate([first_tag[None], tags_rev], axis=0)
    else:
        tags = cur_tag[None]
    tags = jnp.moveaxis(tags, 0, 1)  # [B, T?, N] -> actually [B, T, N]
    tags = jnp.swapaxes(tags, 1, 2)  # [B, N, T]
    tags = jnp.where(mask[:, None, :], tags, pad_tag)
    return tags.astype(jnp.int32), best_scores
