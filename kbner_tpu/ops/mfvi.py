"""Mean-field variational inference over second/third-order CRF potentials.

TPU-native counterpart of the reference's ``MFVI`` module
(``/root/reference/flair/variational_inference.py:15-264``) with the
low-rank Quadrilinear and Hexalinear factorizations
(``flair/linear_functions.py:15-175``):

  binary potential for adjacent positions (t, t+1):
      phi[b, t, k, k'] = sum_r (f_t U)_r (f_{t+1} V)_r (W1[k])_r (W2[k'])_r
  ternary potential for (t, t+1, t+2):
      psi[b, t, a, b', c] = sum_r g[b, t]_r (T1[a])_r (T2[b'])_r (T3[c])_r
      with g = (f_t W1)(f_{t+1} W2)(f_{t+2} W3) / sqrt(rank)

  mean-field updates (``iterations`` fixed-point steps, fully vectorized —
  the reference loops in torch, here it is one lax.fori_loop of einsums):
      q <- softmax(unary + msg_2nd + msg_3rd)

Third-order messages are computed IN RANK SPACE (q projected through the
tag factors, elementwise products, projected back) — mathematically equal
to the reference's dense ``nsabc`` einsums over the materialized
[B, T-2, K, K, K] tensor (``variational_inference.py:230-246``) but
O(K*R) per position instead of O(K^3), which is what makes third order
practical on the MXU. A dense path exists for parity tests.

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


class HexalinearPotentials(nn.Module):
    """Low-rank factorized ternary potentials for position triples
    (t, t+1, t+2) — the reference's ``HexaLinearScore``
    (``linear_functions.py:90-175``). Returns the RANK-SPACE pieces
    (g [B, T-2, R], t1/t2/t3 [K, R]); :func:`ternary_messages` consumes
    them without materializing the [B, T-2, K, K, K] tensor, and
    :func:`dense_ternary` materializes it for small-K parity tests."""

    num_tags: int
    rank: int = 64
    temb: int = 20

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        g1 = nn.Dense(self.rank, use_bias=False, name="W1")(feats[:, :-2])
        g2 = nn.Dense(self.rank, use_bias=False, name="W2")(feats[:, 1:-1])
        g3 = nn.Dense(self.rank, use_bias=False, name="W3")(feats[:, 2:])
        tag_emb = self.param("tag_emb", nn.initializers.normal(0.02),
                             (self.num_tags, self.temb))
        t1 = nn.Dense(self.rank, use_bias=False, name="T1")(tag_emb)
        t2 = nn.Dense(self.rank, use_bias=False, name="T2")(tag_emb)
        t3 = nn.Dense(self.rank, use_bias=False, name="T3")(tag_emb)
        g = g1 * g2 * g3 / jnp.sqrt(float(self.rank))  # [B, T-2, R]
        return g, t1, t2, t3


def dense_ternary(factors) -> jnp.ndarray:
    """[B, T-2, K, K, K] materialization of the factored potentials —
    exactly the reference's ``nmk,abck->nmabc`` product. Tests only."""
    g, t1, t2, t3 = factors
    return jnp.einsum("ntr,ar,br,cr->ntabc", g, t1, t2, t3)


def ternary_messages(q: jnp.ndarray, factors, triple_mask: jnp.ndarray
                     ) -> jnp.ndarray:
    """Third-order mean-field messages in rank space.

    Equal to the reference's three dense einsums
    (``variational_inference.py:234-239``):
      into t   (sum over t-2, t-1):  nsa,nsb,nsabc->nsc
      into t+1 (sum over t-2, t+2):  nsa,nsc,nsabc->nsb
      into t+2 (sum over t+1, t+2 as left pair): nsb,nsc,nsabc->nsa
    ``triple_mask`` [B, T-2] zeroes triples crossing padding.
    """
    g, t1, t2, t3 = factors
    g = g * triple_mask[..., None]
    qa = q[:, :-2] @ t1  # [B, T-2, R]
    qb = q[:, 1:-1] @ t2
    qc = q[:, 2:] @ t3
    msg = jnp.zeros_like(q)
    msg = msg.at[:, 2:].add((qa * qb * g) @ t3.T)  # left_sum
    msg = msg.at[:, 1:-1].add((qa * qc * g) @ t2.T)  # middle_sum
    msg = msg.at[:, :-2].add((qb * qc * g) @ t1.T)  # right_sum
    return msg


def mean_field_iterate(
    unary: jnp.ndarray,  # [B, T, K] emission scores
    binary: jnp.ndarray,  # [B, T-1, K, K]
    mask: jnp.ndarray,  # [B, T]
    iterations: int = 3,
    ternary_factors=None,  # (g [B,T-2,R], t1, t2, t3 [K,R]) or None
) -> jnp.ndarray:
    """Fixed-point mean-field updates; returns final q [B, T, K]."""
    mask_f = mask.astype(jnp.float32)[:, :, None]
    # zero messages across masked boundaries
    pair_mask = (mask_f[:, :-1] * mask_f[:, 1:])[..., None]  # [B,T-1,1,1]
    binary = binary * pair_mask[:, :, 0:1, :]
    triple_mask = None
    if ternary_factors is not None:
        triple_mask = (mask_f[:, :-2] * mask_f[:, 1:-1]
                       * mask_f[:, 2:])[..., 0]  # [B, T-2]

    def step(_, q):
        # message into t from t-1: sum_k q[t-1,k] * binary[t-1,k,k']
        msg_from_left = jnp.einsum("btk,btkl->btl", q[:, :-1], binary)
        # message into t from t+1: sum_k' q[t+1,k'] * binary[t,k,k']
        msg_from_right = jnp.einsum("btl,btkl->btk", q[:, 1:], binary)
        total = unary
        total = total.at[:, 1:].add(msg_from_left)
        total = total.at[:, :-1].add(msg_from_right)
        if ternary_factors is not None:
            total = total + ternary_messages(
                q, ternary_factors, triple_mask)
        return jax.nn.softmax(total, axis=-1)

    q0 = jax.nn.softmax(unary, axis=-1)
    return jax.lax.fori_loop(0, iterations, step, q0)


class MFVIHead(nn.Module):
    """Second(/third)-order decoding head: unary emissions + quadrilinear
    binaries (+ hexalinear ternaries) + mean-field iterations. Drop-in
    alternative to the CRF (reference MFVI config block:
    ``use_second_order`` / ``use_third_order`` + ``use_hexalinear``)."""

    num_tags: int
    rank: int = 64
    iterations: int = 3
    use_third_order: bool = False

    def setup(self):
        self.potentials = QuadrilinearPotentials(
            self.num_tags, self.rank, name="potentials")
        if self.use_third_order:
            self.ternary = HexalinearPotentials(
                self.num_tags, self.rank, name="ternary")

    def posteriors(self, feats: jnp.ndarray, unary: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
        binary = self.potentials(feats)
        factors = self.ternary(feats) if self.use_third_order else None
        return mean_field_iterate(unary, binary, mask, self.iterations,
                                  ternary_factors=factors)

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
