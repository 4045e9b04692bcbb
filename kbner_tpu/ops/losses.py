"""Distillation and multi-view agreement losses.

Pure-function counterparts of the reference's KD and cooperative-training
losses in ``/root/reference/flair/models/sequence_tagger_model.py``:

  - temperature-softmax distillation (MSE or CE over logits),
    ``_calculate_distillation_loss`` (:2384-2400),
  - posterior distillation over CRF marginals (forward-backward),
    used by posterior KD and by the CLNER/ITA multi-view objective,
  - multi-view agreement: the retrieval-context view teaches the
    context-free view (detached teacher side), with optional L2 feature
    matching, ``_calculate_multi_view_loss`` (:1958-2110),
  - token CE + entropy for unlabeled data (:2517-2538).

All take explicit [B, W] masks and mean over unmasked positions.
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp


def _masked_mean(per_token: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_token * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def distillation_loss(
    student_logits: jnp.ndarray,  # [B, W, K]
    teacher_logits: jnp.ndarray,  # [B, W, K]
    mask: jnp.ndarray,  # [B, W]
    temperature: float = 1.0,
    kind: Literal["ce", "mse"] = "ce",
) -> jnp.ndarray:
    """Logit distillation with temperature (teacher side stopped)."""
    t = temperature
    teacher = jax.lax.stop_gradient(teacher_logits)
    if kind == "mse":
        per = jnp.mean(
            (jax.nn.softmax(teacher / t, -1)
             - jax.nn.softmax(student_logits / t, -1)) ** 2, axis=-1)
    else:
        p_teacher = jax.nn.softmax(teacher / t, axis=-1)
        logq = jax.nn.log_softmax(student_logits / t, axis=-1)
        per = -jnp.sum(p_teacher * logq, axis=-1) * (t * t)
    return _masked_mean(per, mask)


def posterior_distillation_loss(
    student_marginals: jnp.ndarray,  # [B, W, K], rows sum to 1
    teacher_marginals: jnp.ndarray,  # [B, W, K]
    mask: jnp.ndarray,  # [B, W]
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Cross-entropy between teacher and student posterior tag marginals
    (the posterior-constraint loss, sequence_tagger_model.py:2457-2470)."""
    teacher = jax.lax.stop_gradient(teacher_marginals)
    per = -jnp.sum(teacher * jnp.log(student_marginals + eps), axis=-1)
    return _masked_mean(per, mask)


def multi_view_loss(
    context_marginals: jnp.ndarray,  # [B, W, K] from the context view
    orig_marginals: jnp.ndarray,  # [B, W, K] from the context-free view
    mask: jnp.ndarray,  # [B, W] original-sentence positions only
    kind: Literal["kl", "ce"] = "kl",
    eps: float = 1e-8,
) -> jnp.ndarray:
    """CLNER/ITA agreement: the context view (detached) teaches the
    context-free view on the shared original-sentence positions."""
    teacher = jax.lax.stop_gradient(context_marginals)
    if kind == "ce":
        per = -jnp.sum(teacher * jnp.log(orig_marginals + eps), axis=-1)
    else:
        per = jnp.sum(
            teacher * (jnp.log(teacher + eps) - jnp.log(orig_marginals + eps)),
            axis=-1)
    return _masked_mean(per, mask)


def feature_l2_loss(
    context_features: jnp.ndarray,  # [B, W, H]
    orig_features: jnp.ndarray,  # [B, W, H]
    mask: jnp.ndarray,  # [B, W]
) -> jnp.ndarray:
    """Optional L2 feature matching between the two views
    (``calculate_l2_loss`` in the ITA configs)."""
    teacher = jax.lax.stop_gradient(context_features)
    per = jnp.sum((teacher - orig_features) ** 2, axis=-1)
    return _masked_mean(per, mask)


def token_ce_entropy_loss(
    logits: jnp.ndarray,  # [B, W, K]
    tags: Optional[jnp.ndarray],  # [B, W] or None for unlabeled
    mask: jnp.ndarray,  # [B, W]
    entropy_weight: float = 0.0,
) -> jnp.ndarray:
    """Plain token CE (+ confidence entropy penalty for unlabeled data,
    sequence_tagger_model.py:2517-2538)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = 0.0
    if tags is not None:
        gold = jnp.take_along_axis(logp, tags[..., None], axis=-1)[..., 0]
        loss = -_masked_mean(gold, mask)
    if entropy_weight > 0:
        p = jnp.exp(logp)
        ent = -jnp.sum(p * logp, axis=-1)
        loss = loss + entropy_weight * _masked_mean(ent, mask)
    return loss
