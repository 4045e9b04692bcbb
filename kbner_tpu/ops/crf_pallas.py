"""Pallas CRF kernels: fused forward (log-partition) over the time loop.

The lax.scan CRF in ``ops/crf.py`` is compiled by XLA into a sequential loop
whose [B, K] state round-trips through HBM each step. This kernel keeps the
whole recurrence in VMEM: emissions arrive time-major [T, B, K], the
transition matrix and running alpha stay resident, and the T-step loop runs
inside one kernel launch.

Tag count K is padded to the 128-lane dimension with -inf emissions so the
padded states never contribute. Batch B is padded to a sublane multiple.

On CPU (tests) the kernel runs in interpreter mode; parity with the scan
implementation is asserted in tests either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _crf_forward_kernel(em_ref, mask_ref, trans_ref, out_ref, alpha_ref):
    """Sequential-grid step t: alpha update in VMEM scratch.

    Block shapes: em [1, B, K] (step t), mask [1, B], trans [K, K] resident,
    out [B, K] (same block every step — written at the last step only).
    Mosaic executes the 1-D grid sequentially, so the scratch carry is the
    recurrence state; this is the canonical time-loop pattern (an in-kernel
    fori_loop over a 3-D ref compiles pathologically slowly).
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        alpha_ref[:, :] = em_ref[0]  # START->k + e_0, baked by caller

    @pl.when(t > 0)
    def _():
        alpha = alpha_ref[:, :]
        emit_t = em_ref[0]  # [B, K]
        m = mask_ref[0]  # [B, K] (mask broadcast across lanes upstream)
        scores = (alpha[:, :, None] + trans_ref[:, :][None, :, :]
                  + emit_t[:, None, :])
        mx = jnp.max(scores, axis=1)  # [B, K]
        new_alpha = mx + jnp.log(
            jnp.sum(jnp.exp(scores - mx[:, None, :]), axis=1))
        alpha_ref[:, :] = jnp.where(m > 0, new_alpha, alpha)

    @pl.when(t == n_t - 1)
    def _():
        out_ref[:, :] = alpha_ref[:, :]


@functools.partial(jax.jit, static_argnames=("start_idx", "stop_idx"))
def crf_forward_pallas(
    emissions: jnp.ndarray,  # [B, T, K]
    mask: jnp.ndarray,  # [B, T]
    transitions: jnp.ndarray,  # [K, K]
    start_idx: int,
    stop_idx: int,
) -> jnp.ndarray:
    """Drop-in replacement for ``crf_forward`` backed by the fused kernel."""
    emissions = emissions.astype(jnp.float32)
    transitions = transitions.astype(jnp.float32)
    B, T, K = emissions.shape
    Kp = _round_up(K, 128)
    Bp = _round_up(B, 8)

    em = jnp.full((B, T, Kp), NEG, jnp.float32).at[:, :, :K].set(emissions)
    # bake START->k into step 0 so the kernel's alpha init is just em[0]
    em = em.at[:, 0, :K].add(transitions[start_idx])
    tr = jnp.full((Kp, Kp), NEG, jnp.float32).at[:K, :K].set(transitions)

    em_t = jnp.moveaxis(em, 1, 0)  # [T, B, K]
    if Bp != B:
        em_t = jnp.pad(em_t, ((0, 0), (0, Bp - B), (0, 0)),
                       constant_values=NEG)
    mask_t = jnp.moveaxis(mask.astype(jnp.int32), 1, 0)
    if Bp != B:
        mask_t = jnp.pad(mask_t, ((0, 0), (0, Bp - B)))
    # broadcast over lanes so the block shape (1, Bp, Kp) is tile-aligned
    mask_t = jnp.broadcast_to(mask_t[:, :, None], (T, Bp, Kp))

    alpha = pl.pallas_call(
        _crf_forward_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Kp), jnp.float32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, Kp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Kp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, Kp), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Bp, Kp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(em_t, mask_t, tr)

    alpha = alpha[:B, :K]
    return jax.nn.logsumexp(
        alpha + transitions[:, stop_idx][None, :], axis=1)


def _crf_viterbi_kernel(em_ref, mask_ref, trans_ref, bp_ref, alpha_out_ref,
                        alpha_ref):
    """Sequential-grid Viterbi step: max-product alpha update in VMEM
    scratch, per-step backpointers written to the [T, B, K] output."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    B, K = alpha_ref.shape

    @pl.when(t == 0)
    def _():
        alpha_ref[:, :] = em_ref[0]
        bp_ref[0] = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)

    @pl.when(t > 0)
    def _():
        alpha = alpha_ref[:, :]
        emit_t = em_ref[0]
        m = mask_ref[0]  # [B, K] lane-broadcast mask
        scores = alpha[:, :, None] + trans_ref[:, :][None, :, :]
        best_prev = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [B, K]
        best_score = jnp.max(scores, axis=1) + emit_t
        identity = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        bp_ref[0] = jnp.where(m > 0, best_prev, identity)
        alpha_ref[:, :] = jnp.where(m > 0, best_score, alpha)

    @pl.when(t == n_t - 1)
    def _():
        alpha_out_ref[:, :] = alpha_ref[:, :]


@functools.partial(jax.jit, static_argnames=("start_idx", "stop_idx",
                                             "pad_tag"))
def crf_decode_pallas(
    emissions: jnp.ndarray,  # [B, T, K]
    mask: jnp.ndarray,  # [B, T]
    transitions: jnp.ndarray,  # [K, K]
    start_idx: int,
    stop_idx: int,
    pad_tag: int = 0,
):
    """Viterbi decode with the max-product recurrence fused in one kernel
    (backtrace stays in XLA — it is a cheap [T, B] gather chain)."""
    emissions = emissions.astype(jnp.float32)
    transitions = transitions.astype(jnp.float32)
    B, T, K = emissions.shape
    Kp = _round_up(K, 128)
    Bp = _round_up(B, 8)

    em = jnp.full((B, T, Kp), NEG, jnp.float32).at[:, :, :K].set(emissions)
    em = em.at[:, 0, :K].add(transitions[start_idx])
    tr = jnp.full((Kp, Kp), NEG, jnp.float32).at[:K, :K].set(transitions)
    em_t = jnp.moveaxis(em, 1, 0)
    if Bp != B:
        em_t = jnp.pad(em_t, ((0, 0), (0, Bp - B), (0, 0)),
                       constant_values=NEG)
    mask_t = jnp.moveaxis(mask.astype(jnp.int32), 1, 0)
    if Bp != B:
        mask_t = jnp.pad(mask_t, ((0, 0), (0, Bp - B)))
    mask_b = jnp.broadcast_to(mask_t[:, :, None], (T, Bp, Kp))

    bps, alpha = pl.pallas_call(
        _crf_viterbi_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, Kp), jnp.float32),
        ),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, Kp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, Kp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Bp, Kp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Kp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((Bp, Kp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(em_t, mask_b, tr)

    alpha = alpha[:B, :K]
    bps = bps[:, :B, :K]  # [T, B, K]
    final = alpha + transitions[:, stop_idx][None, :]
    last_tag = jnp.argmax(final, axis=1).astype(jnp.int32)
    best_score = jnp.max(final, axis=1)

    def backtrace(tag_next, bp_t):
        tag_t = jnp.take_along_axis(bp_t, tag_next[:, None], axis=1)[:, 0]
        return tag_t, tag_next

    # bps[t] maps tag at position t to best tag at t-1 (bps[0] is identity)
    _, tags = jax.lax.scan(backtrace, last_tag, bps[1:], reverse=True)
    if T > 1:
        first = jnp.take_along_axis(
            bps[1], tags[0][:, None], axis=1)[:, 0]
        tags = jnp.concatenate([first[None], tags], axis=0)
    else:
        tags = last_tag[None]
    tags = jnp.moveaxis(tags, 0, 1)
    tags = jnp.where(mask.astype(bool), tags, pad_tag)
    return tags.astype(jnp.int32), best_score
