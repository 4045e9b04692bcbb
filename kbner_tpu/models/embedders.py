"""Classic embedding family: static word vectors, char-BiLSTM, char-LM
(Flair-style), and stacking with ACE-style selection masks.

TPU-native re-design of the reference's embedding zoo
(``/root/reference/flair/embeddings.py``):

  - ``WordEmbedder``  ~ ``WordEmbeddings``/``FastWordEmbeddings`` (:213-667):
    a fixed-vocab lookup table, optionally trainable, loadable from
    word2vec/GloVe text files,
  - ``CharBiLSTMEmbedder`` ~ ``FastCharacterEmbeddings`` (:670): per-word
    char BiLSTM, final states concatenated,
  - ``FlairLMEmbedder`` ~ ``FlairEmbeddings`` (:2271-2553): a character
    language model run over the sentence's character stream; each word is
    represented by the forward-LM state at its last character and the
    backward-LM state at its first character,
  - ``StackedEmbedder`` ~ ``StackedEmbeddings`` (:155-211), with a
    per-embedder selection mask — the substrate for ACE's automated
    concatenation (``models/controller.py`` + reinforcement episodes).

All embedders are word-level: ``(params, batch) -> [B, W, D]``. The batch
carries whatever inputs each family needs (``word_ids``, ``char_ids``,
``char_stream``); ``data/encode.py`` produces them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class WordEmbedder(nn.Module):
    """Static word-vector lookup (optionally frozen)."""

    vocab_size: int
    dim: int = 100
    trainable: bool = True

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.dim, name="table")(
            batch["word_ids"])
        if not self.trainable:
            emb = jax.lax.stop_gradient(emb)
        return emb

    @staticmethod
    def load_pretrained_text(path, vocab_limit: Optional[int] = None
                             ) -> Tuple[Dict[str, int], np.ndarray]:
        """Parse word2vec/GloVe text format -> (vocab, [V, D] matrix).
        Row 0 is reserved for <unk> (zero vector)."""
        vocab: Dict[str, int] = {"<unk>": 0}
        rows: List[np.ndarray] = []
        with open(path, encoding="utf-8", errors="ignore") as f:
            first = f.readline().split()
            if len(first) == 2 and all(t.isdigit() for t in first):
                pass  # word2vec header line
            else:
                f.seek(0)
            for line in f:
                parts = line.rstrip().split(" ")
                if len(parts) < 3:
                    continue
                word = parts[0]
                vec = np.asarray(parts[1:], dtype=np.float32)
                vocab[word] = len(vocab)
                rows.append(vec)
                if vocab_limit and len(vocab) > vocab_limit:
                    break
        dim = len(rows[0]) if rows else 0
        matrix = np.vstack([np.zeros((1, dim), np.float32)] + rows)
        return vocab, matrix


class CharBiLSTMEmbedder(nn.Module):
    """Per-word character BiLSTM; output = concat of final fwd/bwd states."""

    char_vocab_size: int
    char_dim: int = 25
    hidden: int = 25

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        char_ids = batch["char_ids"]  # [B, W, C]
        char_mask = batch["char_mask"]  # [B, W, C]
        B, W, C = char_ids.shape
        x = nn.Embed(self.char_vocab_size, self.char_dim, name="chars")(
            char_ids.reshape(B * W, C))
        mask = char_mask.reshape(B * W, C).astype(bool)

        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")
        h_f = fwd(x, seq_lengths=mask.sum(-1))  # [BW, C, H]
        h_b = bwd(x, seq_lengths=mask.sum(-1))
        # final forward state = at last real char; final backward = at char 0
        lengths = jnp.maximum(mask.sum(-1), 1)
        last = jnp.take_along_axis(
            h_f, (lengths - 1)[:, None, None].astype(jnp.int32).repeat(
                self.hidden, -1), axis=1, mode="clip")[:, 0]
        first = h_b[:, 0]
        out = jnp.concatenate([last, first], axis=-1)
        return out.reshape(B, W, 2 * self.hidden)


class CharLM(nn.Module):
    """Character language model (one direction) — the engine behind
    FlairLMEmbedder and the LanguageModelTrainer.

    ``reverse=True`` runs right-to-left over each sequence's REAL length
    (``seq_lengths``), so padded positions never leak into real states —
    flipping a padded stream naively would make embeddings depend on how
    much padding the batch happens to carry."""

    char_vocab_size: int
    embed_dim: int = 50
    hidden: int = 256
    reverse: bool = False

    @nn.compact
    def __call__(self, char_stream: jnp.ndarray,
                 seq_lengths: jnp.ndarray = None) -> jnp.ndarray:
        """[B, T] char ids -> [B, T, H] hidden states."""
        x = nn.Embed(self.char_vocab_size, self.embed_dim, name="embed")(
            char_stream)
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden),
                     reverse=self.reverse, keep_order=True, name="lstm")
        if seq_lengths is not None:
            return rnn(x, seq_lengths=seq_lengths)
        return rnn(x)


class CharLMHead(nn.Module):
    """CharLM + next-char prediction head (for LM pretraining)."""

    char_vocab_size: int
    embed_dim: int = 50
    hidden: int = 256

    def setup(self):
        self.lm = CharLM(self.char_vocab_size, self.embed_dim, self.hidden,
                         name="lm")
        self.decoder = nn.Dense(self.char_vocab_size, name="decoder")

    def __call__(self, char_stream: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.lm(char_stream))

    def loss(self, char_stream: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Next-char cross-entropy; predicts stream[t+1] from prefix."""
        logits = self(char_stream)[:, :-1]
        targets = char_stream[:, 1:]
        m = mask[:, 1:].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        gold = jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
        return -jnp.sum(gold * m) / jnp.maximum(jnp.sum(m), 1.0)


class FlairLMEmbedder(nn.Module):
    """Contextual char-LM word embeddings (forward + backward LMs).

    Word w gets [fwd_state(end_of_w), bwd_state(start_of_w)], extracted from
    the sentence character stream by position gather — exactly the reference
    semantics (embeddings.py:2271-2553) without per-sentence Python loops.
    """

    char_vocab_size: int
    embed_dim: int = 50
    hidden: int = 256

    def setup(self):
        self.fwd = CharLM(self.char_vocab_size, self.embed_dim, self.hidden,
                          name="fwd")
        self.bwd = CharLM(self.char_vocab_size, self.embed_dim, self.hidden,
                          reverse=True, name="bwd")

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        stream = batch["char_stream"]  # [B, T]
        ends = batch["word_char_ends"]  # [B, W] index of last char per word
        starts = batch["word_char_starts"]  # [B, W]
        lengths = batch["char_stream_mask"].sum(-1)  # [B]
        h_f = self.fwd(stream, seq_lengths=lengths)  # [B, T, H]
        h_b = self.bwd(stream, seq_lengths=lengths)
        f = jnp.take_along_axis(
            h_f, ends[:, :, None].repeat(self.hidden, -1), axis=1,
            mode="clip")
        b = jnp.take_along_axis(
            h_b, starts[:, :, None].repeat(self.hidden, -1), axis=1,
            mode="clip")
        return jnp.concatenate([f, b], axis=-1)


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    """One member of a stack: a module + its output dimension."""

    name: str
    module: Any  # nn.Module taking (batch) -> [B, W, D]
    dim: int


class StackedEmbedder(nn.Module):
    """Concatenation of N embedders with a selection mask over members.

    ``selection`` is a float [N] vector (1.0 = keep) — the ACE controller's
    Bernoulli sample; masked members contribute zeros, keeping the
    concatenated width static for XLA (the reference multiplies cached
    features by the mask, sequence_tagger_model.py:844-1052).

    ``members`` is a flat tuple of modules (linen adopts module-typed
    attributes as submodules only when they are not buried inside plain
    dataclasses, hence specs are split into members + metadata).
    """

    members: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 selection: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        outs = []
        for i, member in enumerate(self.members):
            feats = member(batch)
            if selection is not None:
                feats = feats * selection[i]
            outs.append(feats)
        return jnp.concatenate(outs, axis=-1)


class TransformerWordEmbedder(nn.Module):
    """XLM-R as a stack member: encoder + first-subtoken gather.

    ``fine_tune=False`` stops gradients — the ACE recipe concatenates frozen
    transformer embeddings (the reference precomputes them once,
    ``gpu_friendly_assign_embedding``, distillation_trainer.py:1151-1215).
    """

    config: Any  # XLMRConfig
    fine_tune: bool = False

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        from .xlmr import XLMREncoder

        hidden, _ = XLMREncoder(self.config, name="encoder")(
            batch["input_ids"], batch["attention_mask"], deterministic=True)
        feats = jnp.take_along_axis(
            hidden, batch["word_starts"][:, :, None], axis=1, mode="clip")
        if not self.fine_tune:
            feats = jax.lax.stop_gradient(feats)
        return feats


class ScalarMix(nn.Module):
    """AllenNLP-style learned mixture of encoder layers
    (reference ``embeddings.py:1445-1502``): softmax-normalized per-layer
    weights + a global scale over the [L, B, S, H] hidden-state stack."""

    num_layers: int

    @nn.compact
    def __call__(self, layer_stack: jnp.ndarray) -> jnp.ndarray:
        weights = self.param(
            "weights", nn.initializers.zeros, (self.num_layers,))
        gamma = self.param("gamma", nn.initializers.ones, ())
        norm = jax.nn.softmax(weights)
        mixed = jnp.einsum("l,lbsh->bsh", norm, layer_stack)
        return gamma * mixed


def build_pooled_flair_table(
    flair_embedder: "FlairLMEmbedder",
    params,
    records,
    tokenizer,
    char_vocab,
    pooling: str = "mean",
    batch_size: int = 32,
):
    """Corpus-level pooled char-LM word embeddings (reference
    ``PooledFlairEmbeddings``, embeddings.py:2557).

    The reference grows a per-word-type memory of contextual embeddings
    during training (min/max/mean/fade). A growing host-side memory breaks
    the pure-array training step, so the TPU-friendly equivalent is a
    two-pass precompute: run the (pre-trained) char LMs over the corpus
    once, aggregate each word type's contextual embeddings, and serve the
    result as a fixed lookup table (plug into :class:`WordEmbedder` with
    ``table`` initialized from the returned matrix).

    Returns (word_vocab: Dictionary, matrix [V, 2H] float32).
    """
    from ..data.dictionary import Dictionary
    from ..data.encode import add_classic_features, encode_batch

    vocab = Dictionary(add_unk=True)
    for rec in records:
        for tok in rec.tokens:
            vocab.add_item(tok)
    dim = 2 * flair_embedder.hidden
    sums = np.zeros((len(vocab), dim), dtype=np.float64)
    counts = np.zeros(len(vocab), dtype=np.int64)
    mins = np.full((len(vocab), dim), np.inf)
    maxs = np.full((len(vocab), dim), -np.inf)

    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        eb = encode_batch(chunk, tokenizer, None)
        add_classic_features(eb, None, char_vocab)
        arrays = {k: jnp.asarray(v) for k, v in eb.arrays().items()}
        feats = np.asarray(flair_embedder.apply(params, arrays))
        for b, rec in enumerate(chunk):
            for w, tok in enumerate(rec.tokens[: feats.shape[1]]):
                v = vocab.get_idx_for_item(tok)
                sums[v] += feats[b, w]
                counts[v] += 1
                np.minimum(mins[v], feats[b, w], out=mins[v])
                np.maximum(maxs[v], feats[b, w], out=maxs[v])

    seen = counts > 0
    if pooling == "mean":
        table = np.where(seen[:, None], sums / np.maximum(counts, 1)[:, None],
                         0.0)
    elif pooling == "min":
        table = np.where(seen[:, None], mins, 0.0)
    elif pooling == "max":
        table = np.where(seen[:, None], maxs, 0.0)
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    return vocab, table.astype(np.float32)
