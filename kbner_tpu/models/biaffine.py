"""Biaffine parsing heads: dependency parsing and span-NER-as-parsing.

TPU-first re-design of the reference's parsing surface
(``/root/reference/flair/models/dependency_model.py:172``,
``dependency_model_1.py:176``, ``biaffine_dp.py:19``, ``flair/parser/``):

  - :class:`BiaffineParser` — Dozat-Manning arc/rel scorer over encoder word
    features: head/dep MLPs + biaffine attention; a learned ROOT vector is
    prepended so arcs live on a [W+1, W+1] grid; loss is masked CE over
    heads + CE over relations at gold heads; decode is argmax with an
    optional host-side Chu-Liu/Edmonds MST repair (the reference's
    ``maximum_spanning_tree.py``/``alg.py`` path),
  - :class:`BiaffineNER` — span classification via start/end biaffine
    scoring (NER-DP, ``biaffine_dp.py``): every (start <= end) span gets a
    label distribution; decode keeps top-scoring non-overlapping spans.

Everything on-device is a fixed-shape einsum; only final tree repair and
span selection run on host.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .xlmr import XLMRConfig, XLMREncoder


@dataclasses.dataclass(frozen=True)
class BiaffineConfig:
    encoder: XLMRConfig
    num_rels: int
    arc_dim: int = 256
    rel_dim: int = 64
    dropout: float = 0.1
    # arc loss: "ce" (head classification, the reference's default) or
    # "crf" (first-order projective tree CRF, reference ``alg.py:92``);
    # ``partial`` marginalizes unannotated heads (< 0) under "crf"
    arc_loss: str = "ce"
    partial: bool = False


class Biaffine(nn.Module):
    """Bilinear scorer with optional bias terms: x W y^T (+ Ux + Vy)."""

    out_features: int = 1
    bias_x: bool = True
    bias_y: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # x: [B, Wx, D], y: [B, Wy, D] -> [B, out, Wx, Wy]
        if self.bias_x:
            x = jnp.concatenate(
                [x, jnp.ones((*x.shape[:-1], 1), x.dtype)], axis=-1)
        if self.bias_y:
            y = jnp.concatenate(
                [y, jnp.ones((*y.shape[:-1], 1), y.dtype)], axis=-1)
        w = self.param(
            "weight", nn.initializers.zeros,
            (self.out_features, x.shape[-1], y.shape[-1]))
        return jnp.einsum("bxi,oij,byj->boxy", x, w, y)


class BiaffineParser(nn.Module):
    config: BiaffineConfig

    def setup(self):
        cfg = self.config
        self.encoder = XLMREncoder(cfg.encoder, name="encoder")
        self.root_emb = self.param(
            "root", nn.initializers.normal(0.02),
            (cfg.encoder.hidden_size,))
        self.mlp_arc_h = nn.Dense(cfg.arc_dim, name="mlp_arc_h")
        self.mlp_arc_d = nn.Dense(cfg.arc_dim, name="mlp_arc_d")
        self.mlp_rel_h = nn.Dense(cfg.rel_dim, name="mlp_rel_h")
        self.mlp_rel_d = nn.Dense(cfg.rel_dim, name="mlp_rel_d")
        self.arc_attn = Biaffine(1, bias_x=True, bias_y=False,
                                 name="arc_attn")
        self.rel_attn = Biaffine(cfg.num_rels, bias_x=True, bias_y=True,
                                 name="rel_attn")

    def _features(self, batch: Dict[str, jnp.ndarray],
                  deterministic: bool) -> jnp.ndarray:
        hidden, _ = self.encoder(
            batch["input_ids"], batch["attention_mask"],
            deterministic=deterministic)
        feats = jnp.take_along_axis(
            hidden, batch["word_starts"][:, :, None], axis=1, mode="clip")
        B = feats.shape[0]
        root = jnp.broadcast_to(
            self.root_emb[None, None, :], (B, 1, feats.shape[-1]))
        return jnp.concatenate(
            [root, feats.astype(jnp.float32)], axis=1)  # [B, W+1, H]

    def scores(self, batch: Dict[str, jnp.ndarray],
               deterministic: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(s_arc [B, W+1, W+1], s_rel [B, W+1, W+1, R]).

        ``s_arc[b, d, h]`` scores head h for dependent d (position 0 = ROOT,
        only valid as head).
        """
        x = self._features(batch, deterministic)
        relu = jax.nn.relu
        arc_h = relu(self.mlp_arc_h(x))
        arc_d = relu(self.mlp_arc_d(x))
        rel_h = relu(self.mlp_rel_h(x))
        rel_d = relu(self.mlp_rel_d(x))
        s_arc = self.arc_attn(arc_d, arc_h)[:, 0]  # [B, W+1, W+1]
        s_rel = jnp.moveaxis(self.rel_attn(rel_d, rel_h), 1, -1)
        return s_arc, s_rel

    def loss(self, batch: Dict[str, jnp.ndarray],
             deterministic: bool = False) -> jnp.ndarray:
        """Arc loss + CE over rels at gold heads.

        batch needs ``heads`` [B, W] (0 = ROOT) and ``rel_ids`` [B, W].
        Arc loss is per-config: masked head CE (reference default) or the
        projective tree CRF NLL (``ops/tree_crf.py``; with
        ``cfg.partial``, heads < 0 are marginalized, ``alg.py:105-110``).
        """
        s_arc, s_rel = self.scores(batch, deterministic)
        mask = batch["word_mask"].astype(jnp.float32)  # [B, W]
        B, W = mask.shape
        gold_heads = batch["heads"]  # [B, W]
        head_valid = jnp.concatenate(
            [jnp.ones((B, 1)), mask], axis=1)  # [B, W+1]
        if self.config.arc_loss == "crf":
            from ..ops.tree_crf import tree_crf_loss

            nll = tree_crf_loss(
                s_arc, batch["word_mask"], gold_heads,
                partial=self.config.partial)  # [B]
            # spread the per-sentence NLL so the shared word-count
            # normalization below applies (rel CE stays per-word)
            arc_ll = -(nll[:, None] / jnp.maximum(
                mask.sum(axis=1, keepdims=True), 1.0)) * mask
        else:
            # dependents are positions 1..W of the padded grid;
            # heads beyond real words are invalid (ROOT=0 always valid)
            arc_logits = jnp.where(
                head_valid[:, None, :] > 0, s_arc[:, 1:, :], -1e9)
            logp_arc = jax.nn.log_softmax(arc_logits, axis=-1)
            arc_ll = jnp.take_along_axis(
                logp_arc, jnp.maximum(gold_heads, 0)[:, :, None],
                axis=2)[..., 0]
            # unannotated heads (< 0) carry no arc supervision either
            arc_ll = jnp.where(gold_heads >= 0, arc_ll, 0.0)

        rel_logits = s_rel[:, 1:, :, :]  # [B, W, W+1, R]
        rel_at_gold = jnp.take_along_axis(
            rel_logits,
            jnp.maximum(gold_heads, 0)[:, :, None, None].repeat(
                rel_logits.shape[-1], -1),
            axis=2)[:, :, 0]  # [B, W, R]
        logp_rel = jax.nn.log_softmax(rel_at_gold, axis=-1)
        rel_ll = jnp.take_along_axis(
            logp_rel, batch["rel_ids"][:, :, None], axis=2)[..., 0]
        # unannotated heads (< 0, partial mode) carry no rel supervision
        rel_ll = jnp.where(gold_heads >= 0, rel_ll, 0.0)

        denom = jnp.maximum(mask.sum(), 1.0)
        return -(jnp.sum((arc_ll + rel_ll) * mask)) / denom

    def marginals(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Arc marginals P(h -> d) [B, W+1, W+1] under the projective tree
        CRF — the reference decodes from these when its ``tree`` flag is on
        (``crf``'s autograd marginals, ``alg.py:101-104``)."""
        from ..ops.tree_crf import tree_crf_marginals

        s_arc, _ = self.scores(batch, deterministic=True)
        return tree_crf_marginals(s_arc, batch["word_mask"])

    def decode(self, batch: Dict[str, jnp.ndarray]
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Greedy heads + rels (host MST repair is a separate step).

        Under ``arc_loss='crf'`` heads come from the tree-CRF marginals
        (MBR per-word decode, the reference's probs-based decoding): raw
        ``s_arc`` diagonals/self-loops are unconstrained by the tree loss,
        so greedy argmax over them is meaningless there.
        """
        s_arc, s_rel = self.scores(batch, deterministic=True)
        mask = batch["word_mask"]
        B, W = mask.shape
        if self.config.arc_loss == "crf":
            from ..ops.tree_crf import tree_crf_marginals

            s_arc = tree_crf_marginals(s_arc, mask)
        head_valid = jnp.concatenate(
            [jnp.ones((B, 1), mask.dtype), mask], axis=1)
        arc_logits = jnp.where(
            head_valid[:, None, :] > 0, s_arc[:, 1:, :], -1e9)
        heads = jnp.argmax(arc_logits, axis=-1)  # [B, W]
        rel_logits = jnp.take_along_axis(
            s_rel[:, 1:], heads[:, :, None, None].repeat(
                s_rel.shape[-1], -1), axis=2)[:, :, 0]
        rels = jnp.argmax(rel_logits, axis=-1)
        return heads.astype(jnp.int32), rels.astype(jnp.int32)


def chu_liu_edmonds(scores: np.ndarray) -> np.ndarray:
    """Maximum spanning arborescence rooted at node 0.

    ``scores[d, h]`` = score of arc h -> d (same orientation as s_arc).
    Returns head per node (head[0] = 0). Host-side decode repair, standing
    in for the reference's ``algorithms/maximum_spanning_tree.py``.
    """
    n = scores.shape[0]
    scores = scores.copy()
    np.fill_diagonal(scores, -np.inf)
    scores[0, :] = -np.inf  # ROOT has no head

    heads = np.zeros(n, dtype=np.int64)
    heads[1:] = np.argmax(scores[1:], axis=1)

    def find_cycle(h):
        color = [0] * n
        for start in range(1, n):
            if color[start]:
                continue
            path, node = [], start
            while True:
                if color[node] == 1:
                    # found a cycle: trim path to the cycle portion
                    idx = path.index(node)
                    return path[idx:]
                if color[node] == 2:
                    break
                color[node] = 1
                path.append(node)
                node = int(h[node])
                if node == 0:
                    break
            for p in path:
                color[p] = 2
        return None

    for _ in range(n):
        cycle = find_cycle(heads)
        if cycle is None:
            return heads
        cyc = set(cycle)
        cyc_score = sum(scores[d, heads[d]] for d in cycle)
        # contract: find the best arc breaking the cycle
        best_gain, best_d, best_h = -np.inf, None, None
        for d in cycle:
            for h in range(n):
                if h in cyc or not np.isfinite(scores[d, h]):
                    continue
                gain = scores[d, h] - scores[d, heads[d]]
                if gain > best_gain:
                    best_gain, best_d, best_h = gain, d, h
        if best_d is None:
            return heads
        heads[best_d] = best_h
    return heads


def mst_decode(s_arc: np.ndarray, word_mask: np.ndarray) -> np.ndarray:
    """Per-sentence MST repair of greedy arcs. s_arc [B, W+1, W+1]."""
    B, Wp1, _ = s_arc.shape
    out = np.zeros((B, Wp1 - 1), dtype=np.int64)
    for b in range(B):
        n = int(word_mask[b].sum()) + 1
        heads = chu_liu_edmonds(s_arc[b, :n, :n])
        out[b, : n - 1] = heads[1:]
    return out


# -- span NER as parsing (NER-DP) ----------------------------------------------

@dataclasses.dataclass(frozen=True)
class BiaffineNERConfig:
    encoder: XLMRConfig
    num_labels: int  # includes 'O' at index 0
    span_dim: int = 128
    max_span_len: int = 30


class BiaffineNER(nn.Module):
    """Span classifier: biaffine over (start, end) representations."""

    config: BiaffineNERConfig

    def setup(self):
        cfg = self.config
        self.encoder = XLMREncoder(cfg.encoder, name="encoder")
        self.mlp_start = nn.Dense(cfg.span_dim, name="mlp_start")
        self.mlp_end = nn.Dense(cfg.span_dim, name="mlp_end")
        self.attn = Biaffine(cfg.num_labels, name="span_attn")

    def scores(self, batch: Dict[str, jnp.ndarray],
               deterministic: bool = True) -> jnp.ndarray:
        """[B, W, W, L] — label scores for span (i..j)."""
        hidden, _ = self.encoder(
            batch["input_ids"], batch["attention_mask"],
            deterministic=deterministic)
        feats = jnp.take_along_axis(
            hidden, batch["word_starts"][:, :, None], axis=1,
            mode="clip").astype(jnp.float32)
        s = jax.nn.relu(self.mlp_start(feats))
        e = jax.nn.relu(self.mlp_end(feats))
        return jnp.moveaxis(self.attn(s, e), 1, -1)  # [B, W, W, L]

    def loss(self, batch: Dict[str, jnp.ndarray],
             deterministic: bool = False) -> jnp.ndarray:
        """CE over all valid candidate spans; gold labels from
        ``span_labels`` [B, W, W] (0 = no entity)."""
        cfg = self.config
        logits = self.scores(batch, deterministic)
        B, W, _, L = logits.shape
        mask = batch["word_mask"]
        ii = jnp.arange(W)
        valid = (ii[None, :, None] <= ii[None, None, :])
        valid = valid & ((ii[None, None, :] - ii[None, :, None])
                         < cfg.max_span_len)
        valid = valid & (mask[:, :, None] > 0) & (mask[:, None, :] > 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        gold = jnp.take_along_axis(
            logp, batch["span_labels"][..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        return -jnp.sum(jnp.where(valid, gold, 0.0)) / denom

    def decode(self, batch: Dict[str, jnp.ndarray]) -> List[List[Tuple]]:
        """Non-overlapping spans per sentence: greedy by score.

        Returns per-sentence lists of (start, end_inclusive, label_id,
        score) — host-side selection like the reference's NER-DP decode.
        """
        logits = np.asarray(self.scores(batch, deterministic=True))
        mask = np.asarray(batch["word_mask"])
        B, W, _, L = logits.shape
        results = []
        for b in range(B):
            n = int(mask[b].sum())
            logp = logits[b] - jax.nn.logsumexp(logits[b], axis=-1,
                                                keepdims=True)
            cands = []
            for i in range(n):
                for j in range(i, min(n, i + self.config.max_span_len)):
                    label = int(np.argmax(logits[b, i, j]))
                    if label != 0:
                        cands.append(
                            (float(logp[i, j, label]), i, j, label))
            cands.sort(reverse=True)
            taken = set()
            chosen = []
            for score, i, j, label in cands:
                if any(p in taken for p in range(i, j + 1)):
                    continue
                taken.update(range(i, j + 1))
                chosen.append((i, j, label, score))
            results.append(sorted(chosen))
        return results


def encode_dependency_arrays(
    eb, head_layer: str = "head", rel_layer: str = "deprel",
    rel_dict=None,
) -> None:
    """Attach ``heads``/``rel_ids`` int arrays parsed from CoNLL-U string
    layers (column_format {6: 'head', 7: 'deprel'}).

    Unannotated head cells ('_' in partially annotated treebanks) encode
    as -1: the tree-CRF marginalizes them under ``partial: true``
    (reference ``alg.py:105-110``) and the CE arc loss masks them —
    never train them as gold-attached to ROOT."""
    B, W = eb.word_mask.shape
    heads = np.zeros((B, W), dtype=np.int32)
    rel_ids = np.zeros((B, W), dtype=np.int32)
    for b, rec in enumerate(eb.records):
        hs = rec.tags.get(head_layer, [])
        rs = rec.tags.get(rel_layer, [])
        for w in range(min(len(hs), W)):
            try:
                heads[b, w] = int(hs[w])
            except ValueError:
                heads[b, w] = -1  # unannotated
            if rel_dict is not None and w < len(rs):
                rel_ids[b, w] = rel_dict.item2idx.get(rs[w], 0)
    eb.extra["heads"] = heads
    eb.extra["rel_ids"] = rel_ids


def encode_span_labels(eb, tag_layer: str = "ner", label_dict=None) -> None:
    """Attach ``span_labels`` [B, W, W] from BIOES tags (for BiaffineNER)."""
    from ..data.tag_schemes import get_spans

    B, W = eb.word_mask.shape
    labels = np.zeros((B, W, W), dtype=np.int32)
    for b, rec in enumerate(eb.records):
        tags = rec.tags.get(tag_layer, [])
        for span in get_spans(tags, ignore_labels=("X",)):
            if span.end - 1 < W and label_dict is not None:
                labels[b, span.start, span.end - 1] = \
                    label_dict.item2idx.get(span.label, 0)
    eb.extra["span_labels"] = labels


def eisner_decode(scores: np.ndarray) -> np.ndarray:
    """Projective maximum spanning tree (Eisner's algorithm, O(n^3)).

    ``scores[d, h]`` = score of arc h -> d over n nodes including ROOT at 0.
    Returns head per node (head[0] = 0). Host-side counterpart of the
    reference's ``parser/utils/alg.py:eisner`` (:181).
    """
    n = scores.shape[0]
    NEGINF = -np.inf
    # complete[c][i][j]: span i..j, head at i (c=1 right) or j (c=0 left)
    inc = np.full((2, n, n), NEGINF)  # incomplete
    com = np.full((2, n, n), NEGINF)  # complete
    inc_bp = np.zeros((2, n, n), dtype=np.int64)
    com_bp = np.zeros((2, n, n), dtype=np.int64)
    for i in range(n):
        inc[0, i, i] = inc[1, i, i] = 0.0
        com[0, i, i] = com[1, i, i] = 0.0

    for length in range(1, n):
        for i in range(0, n - length):
            j = i + length
            # incomplete spans: arc between i and j
            best, arg = NEGINF, i
            for r in range(i, j):
                v = com[1, i, r] + com[0, r + 1, j]
                if v > best:
                    best, arg = v, r
            inc[0, i, j] = best + scores[i, j]  # j -> i (head j)
            inc[1, i, j] = best + scores[j, i]  # i -> j (head i)
            inc_bp[0, i, j] = inc_bp[1, i, j] = arg
            # complete spans
            best, arg = NEGINF, i
            for r in range(i, j):
                v = com[0, i, r] + inc[0, r, j]
                if v > best:
                    best, arg = v, r
            com[0, i, j] = best
            com_bp[0, i, j] = arg
            best, arg = NEGINF, i + 1
            for r in range(i + 1, j + 1):
                v = inc[1, i, r] + com[1, r, j]
                if v > best:
                    best, arg = v, r
            com[1, i, j] = best
            com_bp[1, i, j] = arg

    heads = np.zeros(n, dtype=np.int64)

    def backtrack(i, j, direction, complete):
        if i == j:
            return
        if complete:
            r = com_bp[direction, i, j]
            if direction == 0:
                backtrack(i, r, 0, True)
                backtrack(r, j, 0, False)
            else:
                backtrack(i, r, 1, False)
                backtrack(r, j, 1, True)
        else:
            if direction == 0:
                heads[i] = j
            else:
                heads[j] = i
            r = inc_bp[direction, i, j]
            backtrack(i, r, 1, True)
            backtrack(r + 1, j, 0, True)

    backtrack(0, n - 1, 1, True)
    return heads


@dataclasses.dataclass(frozen=True)
class SemDepConfig:
    encoder: XLMRConfig
    num_rels: int
    arc_dim: int = 256
    rel_dim: int = 64
    arc_threshold: float = 0.5


class SemanticDependencyParser(nn.Module):
    """Graph (DAG) dependency parser: each dependent may take several heads.

    Counterpart of the reference's ``SemanticDependencyParser``
    (``dependency_model.py:172`` / ``dependency_model_1.py:176``, the DM/PAS/
    PSD task surface): sigmoid arc scores with masked BCE + relation CE at
    gold arcs; decode keeps arcs above a threshold, falling back to the
    argmax head so every token stays attached.
    """

    config: SemDepConfig

    def setup(self):
        cfg = self.config
        self.encoder = XLMREncoder(cfg.encoder, name="encoder")
        self.root_emb = self.param(
            "root", nn.initializers.normal(0.02),
            (cfg.encoder.hidden_size,))
        self.mlp_arc_h = nn.Dense(cfg.arc_dim, name="mlp_arc_h")
        self.mlp_arc_d = nn.Dense(cfg.arc_dim, name="mlp_arc_d")
        self.mlp_rel_h = nn.Dense(cfg.rel_dim, name="mlp_rel_h")
        self.mlp_rel_d = nn.Dense(cfg.rel_dim, name="mlp_rel_d")
        self.arc_attn = Biaffine(1, bias_x=True, bias_y=False,
                                 name="arc_attn")
        self.rel_attn = Biaffine(cfg.num_rels, bias_x=True, bias_y=True,
                                 name="rel_attn")

    def scores(self, batch, deterministic: bool = True):
        hidden, _ = self.encoder(
            batch["input_ids"], batch["attention_mask"],
            deterministic=deterministic)
        feats = jnp.take_along_axis(
            hidden, batch["word_starts"][:, :, None], axis=1, mode="clip")
        B = feats.shape[0]
        root = jnp.broadcast_to(
            self.root_emb[None, None, :], (B, 1, feats.shape[-1]))
        x = jnp.concatenate([root, feats.astype(jnp.float32)], axis=1)
        relu = jax.nn.relu
        s_arc = self.arc_attn(
            relu(self.mlp_arc_d(x)), relu(self.mlp_arc_h(x)))[:, 0]
        s_rel = jnp.moveaxis(self.rel_attn(
            relu(self.mlp_rel_d(x)), relu(self.mlp_rel_h(x))), 1, -1)
        return s_arc, s_rel  # [B, W+1, W+1], [B, W+1, W+1, R]

    def _grid_mask(self, word_mask):
        B, W = word_mask.shape
        head_valid = jnp.concatenate(
            [jnp.ones((B, 1), word_mask.dtype), word_mask], axis=1)
        return (word_mask[:, :, None] > 0) & (head_valid[:, None, :] > 0)

    def loss(self, batch, deterministic: bool = False):
        """batch needs ``arc_matrix`` [B, W, W+1] (0/1) and ``rel_matrix``
        [B, W, W+1] int (rel at gold arcs)."""
        s_arc, s_rel = self.scores(batch, deterministic)
        arc_logits = s_arc[:, 1:, :]  # dependents x heads
        grid = self._grid_mask(batch["word_mask"])
        targets = batch["arc_matrix"].astype(jnp.float32)
        log_p = jax.nn.log_sigmoid(arc_logits)
        log_np = jax.nn.log_sigmoid(-arc_logits)
        bce = -(targets * log_p + (1 - targets) * log_np)
        arc_loss = jnp.sum(jnp.where(grid, bce, 0.0)) / jnp.maximum(
            grid.sum(), 1)

        rel_logits = s_rel[:, 1:]  # [B, W, W+1, R]
        logp_rel = jax.nn.log_softmax(rel_logits, axis=-1)
        gold_rel = jnp.take_along_axis(
            logp_rel, batch["rel_matrix"][..., None], axis=-1)[..., 0]
        arc_mask = grid & (batch["arc_matrix"] > 0)
        rel_loss = -jnp.sum(jnp.where(arc_mask, gold_rel, 0.0)) / \
            jnp.maximum(arc_mask.sum(), 1)
        return arc_loss + rel_loss

    def decode(self, batch):
        """(arcs [B, W, W+1] 0/1, rels [B, W, W+1] int)."""
        cfg = self.config
        s_arc, s_rel = self.scores(batch, deterministic=True)
        arc_logits = s_arc[:, 1:, :]
        grid = self._grid_mask(batch["word_mask"])
        prob = jax.nn.sigmoid(jnp.where(grid, arc_logits, -1e9))
        arcs = (prob > cfg.arc_threshold).astype(jnp.int32)
        # every real token keeps at least its best head
        best = jnp.argmax(prob, axis=-1)
        fallback = jax.nn.one_hot(
            best, arc_logits.shape[-1], dtype=jnp.int32)
        has_head = arcs.sum(-1, keepdims=True) > 0
        arcs = jnp.where(has_head, arcs, fallback)
        arcs = arcs * grid.astype(jnp.int32)
        rels = jnp.argmax(s_rel[:, 1:], axis=-1).astype(jnp.int32)
        return arcs, rels


def encode_semdep_arrays(eb, layer: str = "deps", rel_dict=None) -> None:
    """Attach ``arc_matrix``/``rel_matrix`` parsed from enhanced-UD style
    multi-head columns ``head:rel|head:rel`` (reference enhancedud target,
    data.py make_tag_dictionary's '|'-split path)."""
    B, W = eb.word_mask.shape
    arc = np.zeros((B, W, W + 1), dtype=np.int32)
    rel = np.zeros((B, W, W + 1), dtype=np.int32)
    for b, rec in enumerate(eb.records):
        vals = rec.tags.get(layer, [])
        for w in range(min(len(vals), W)):
            for item in vals[w].split("|"):
                if ":" not in item:
                    continue
                h, r = item.split(":", 1)
                try:
                    h = int(h)
                except ValueError:
                    continue
                if 0 <= h <= W:
                    arc[b, w, h] = 1
                    if rel_dict is not None:
                        rel[b, w, h] = rel_dict.item2idx.get(r, 0)
    eb.extra["arc_matrix"] = arc
    eb.extra["rel_matrix"] = rel
