"""Mean-field variational inference over second-order CRF potentials.

TPU-native counterpart of the reference's ``MFVI`` module
(``/root/reference/flair/variational_inference.py:15-264``) with the
low-rank Quadrilinear factorization (``flair/linear_functions.py:15-175``):

  binary potential for adjacent positions (t, t+1):
      phi[b, t, k, k'] = sum_r (f_t U)_r (f_{t+1} V)_r (W1[k])_r (W2[k'])_r

  mean-field updates (``iterations`` fixed-point steps, fully vectorized —
  the reference loops in torch, here it is one lax.fori_loop of einsums):
      q <- softmax(unary + msg_left + msg_right)

The result is a per-token distribution; training uses token-level CE
against gold tags (the reference's second-order path replaces the CRF).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuadrilinearPotentials(nn.Module):
    """Low-rank factorized pairwise potentials for adjacent tokens."""

    num_tags: int
    rank: int = 64

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats [B, T, H] -> binary potentials [B, T-1, K, K]."""
        H = feats.shape[-1]
        u = nn.Dense(self.rank, use_bias=False, name="U")(feats)  # [B,T,R]
        v = nn.Dense(self.rank, use_bias=False, name="V")(feats)
        w1 = self.param("W1", nn.initializers.normal(0.02),
                        (self.num_tags, self.rank))
        w2 = self.param("W2", nn.initializers.normal(0.02),
                        (self.num_tags, self.rank))
        left = u[:, :-1]  # [B, T-1, R]
        right = v[:, 1:]
        pair = left * right  # [B, T-1, R]
        return jnp.einsum("btr,kr,lr->btkl", pair, w1, w2)


def mean_field_iterate(
    unary: jnp.ndarray,  # [B, T, K] emission scores
    binary: jnp.ndarray,  # [B, T-1, K, K]
    mask: jnp.ndarray,  # [B, T]
    iterations: int = 3,
) -> jnp.ndarray:
    """Fixed-point mean-field updates; returns final q [B, T, K]."""
    mask_f = mask.astype(jnp.float32)[:, :, None]
    # zero messages across masked boundaries
    pair_mask = (mask_f[:, :-1] * mask_f[:, 1:])[..., None]  # [B,T-1,1,1]
    binary = binary * pair_mask[:, :, 0:1, :]

    def step(_, q):
        # message into t from t-1: sum_k q[t-1,k] * binary[t-1,k,k']
        msg_from_left = jnp.einsum("btk,btkl->btl", q[:, :-1], binary)
        # message into t from t+1: sum_k' q[t+1,k'] * binary[t,k,k']
        msg_from_right = jnp.einsum("btl,btkl->btk", q[:, 1:], binary)
        total = unary
        total = total.at[:, 1:].add(msg_from_left)
        total = total.at[:, :-1].add(msg_from_right)
        return jax.nn.softmax(total, axis=-1)

    q0 = jax.nn.softmax(unary, axis=-1)
    return jax.lax.fori_loop(0, iterations, step, q0)


class MFVIHead(nn.Module):
    """Second-order decoding head: unary emissions + quadrilinear binaries
    + mean-field iterations. Drop-in alternative to the CRF."""

    num_tags: int
    rank: int = 64
    iterations: int = 3

    def setup(self):
        self.potentials = QuadrilinearPotentials(
            self.num_tags, self.rank, name="potentials")

    def posteriors(self, feats: jnp.ndarray, unary: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
        binary = self.potentials(feats)
        return mean_field_iterate(unary, binary, mask, self.iterations)

    def loss(self, feats: jnp.ndarray, unary: jnp.ndarray,
             tags: jnp.ndarray, mask: jnp.ndarray,
             eps: float = 1e-8) -> jnp.ndarray:
        q = self.posteriors(feats, unary, mask)
        gold = jnp.take_along_axis(
            jnp.log(q + eps), tags[:, :, None], axis=2)[..., 0]
        m = mask.astype(jnp.float32)
        return -jnp.sum(gold * m) / jnp.maximum(jnp.sum(m), 1.0)

    def decode(self, feats: jnp.ndarray, unary: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
        q = self.posteriors(feats, unary, mask)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)
