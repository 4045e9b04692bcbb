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
            unk_vec = None
            for line in f:
                parts = line.rstrip().split(" ")
                if len(parts) < 3:
                    continue
                word = parts[0]
                vec = np.asarray(parts[1:], dtype=np.float32)
                if word in vocab:
                    # a '<unk>' row in the file lands in reserved row 0;
                    # other duplicates are dropped (first wins) so vocab
                    # indices never desync from matrix rows
                    if word == "<unk>":
                        unk_vec = vec
                    continue
                vocab[word] = len(rows) + 1
                rows.append(vec)
                if vocab_limit and len(vocab) > vocab_limit:
                    break
        dim = len(rows[0]) if rows else (
            len(unk_vec) if unk_vec is not None else 0)
        row0 = (unk_vec if unk_vec is not None
                else np.zeros(dim, np.float32)).reshape(1, dim)
        matrix = np.vstack([row0] + rows) if rows else row0
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


class ELMoLSTMPCell(nn.RNNCellBase):
    """LSTM with projection and cell/proj clipping in tf conventions —
    the bilm-tf cell real ELMo weights were trained with (allennlp's
    ``_ElmoBiLm``; reference wrapper embeddings.py:677-772). One fused
    kernel ``W_0 [input+proj, 4*cell]`` in tf gate order (i, j, f, o)
    with forget bias 1.0 and projection ``W_P_0 [cell, proj]``, so an
    ELMo HDF5's ``RNN_*/.../LSTMCell`` arrays import as direct copies
    (no permutation or transpose)."""

    cell_dim: int
    proj_dim: int
    clip: float = 3.0

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        inp = jnp.concatenate([x, h], axis=-1)
        W = self.param("W_0", nn.initializers.lecun_normal(),
                       (inp.shape[-1], 4 * self.cell_dim))
        B = self.param("B", nn.initializers.zeros, (4 * self.cell_dim,))
        Wp = self.param("W_P_0", nn.initializers.lecun_normal(),
                        (self.cell_dim, self.proj_dim))
        z = inp @ W + B
        i, j, f, o = jnp.split(z, 4, axis=-1)
        c_new = (jax.nn.sigmoid(f + 1.0) * c
                 + jax.nn.sigmoid(i) * jnp.tanh(j))
        c_new = jnp.clip(c_new, -self.clip, self.clip)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h_new = jnp.clip(h_new @ Wp, -self.clip, self.clip)
        return (c_new, h_new), h_new

    def initialize_carry(self, rng, input_shape):
        batch = input_shape[:-1]
        return (jnp.zeros(batch + (self.cell_dim,), jnp.float32),
                jnp.zeros(batch + (self.proj_dim,), jnp.float32))

    @property
    def num_feature_axes(self) -> int:
        return 1


class ELMoEmbedder(nn.Module):
    """ELMo-architecture contextual embeddings (char-CNN token encoder +
    2-layer word-level bi-LSTM LM), covering the reference's
    ``ELMoEmbeddings`` (embeddings.py:677-772, which wraps allennlp).

    TPU-native re-design rather than a wrapper: the char CNN runs as one
    batched conv over ``[B*W, C]`` char ids, the bi-LM as masked
    ``nn.RNN`` scans over the word axis, and layer combination follows
    the reference's modes — ``"all"`` concatenates [token, layer1,
    layer2] (the flair default), ``"top"`` takes the last LSTM layer,
    ``"average"`` averages the layers, ``"mix"`` learns a
    :class:`ScalarMix`. Weights come from :meth:`load_npz` (local file;
    zero-egress environment) or random init for from-scratch training.

    Output dim: ``2 * proj_dim`` per layer; ``"all"`` yields
    ``2 * proj_dim * (num_layers + 1)``.
    """

    char_vocab_size: int
    char_dim: int = 16
    filters: Tuple[Tuple[int, int], ...] = ((1, 32), (2, 32), (3, 64))
    n_highway: int = 2
    proj_dim: int = 64
    num_layers: int = 2
    mode: str = "all"  # all | top | average | mix
    # bilm-tf-faithful mode (real-ELMo weight import, VERDICT r3 #9):
    # cell_dim switches the LM to :class:`ELMoLSTMPCell` stacks with
    # SEPARATE fwd/bwd LMs, per-direction residual skip connections, and
    # relu VALID-padding char convs over the embedded (pad chars
    # included) character window — the published elmo options
    # (cell 4096, proj 512, clip 3). None keeps the native design.
    cell_dim: Optional[int] = None
    conv_activation: str = "tanh"  # "relu" in bilm-tf mode
    lstm_clip: float = 3.0
    # batch key for the char window: "elmo_char_ids" selects the
    # allennlp byte scheme arrays (data/encode.py::add_classic_features
    # elmo_bytes=True) that real weight files' char tables expect
    input_key: str = "char_ids"

    @property
    def out_dim(self) -> int:
        per_layer = 2 * self.proj_dim
        return per_layer * (self.num_layers + 1) if self.mode == "all" \
            else per_layer

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        char_ids = batch[self.input_key]  # [B, W, C]
        char_mask = batch[self.input_key.replace("ids", "mask")].astype(
            bool)  # [B, W, C]
        word_mask = batch["word_mask"]  # [B, W]
        B, W, C = char_ids.shape

        # -- char-CNN token encoder (one batched pass over B*W words)
        # ids clipped to the table: a char vocab narrower than the data's
        # (e.g. a pinned real-weight table fed corpus char ids) must
        # degrade to the clipped row, not index out of bounds (XLA OOB
        # gathers are unspecified -> NaNs poison the whole loss)
        char_ids = jnp.clip(char_ids, 0, self.char_vocab_size - 1)
        x = nn.Embed(self.char_vocab_size, self.char_dim, name="chars")(
            char_ids.reshape(B * W, C))  # [BW, C, E]
        m = char_mask.reshape(B * W, C)
        act = jnp.tanh if self.conv_activation == "tanh" else nn.relu
        bilm = self.cell_dim is not None
        pooled = []
        for width, channels in self.filters:
            if bilm:
                # bilm-tf semantics: VALID conv over the full embedded
                # char window (pad chars are real embedded rows there),
                # activation then max over positions
                h = nn.Conv(channels, kernel_size=(width,),
                            padding="VALID", name=f"conv{width}")(x)
                pooled.append(jnp.max(act(h), axis=1))
                continue
            h = nn.Conv(channels, kernel_size=(width,), padding="SAME",
                        name=f"conv{width}")(x)  # [BW, C, ch]
            h = jnp.where(m[:, :, None], act(h), -jnp.inf)
            pooled.append(jnp.max(h, axis=1))  # [BW, ch]
        tok = jnp.concatenate(pooled, axis=-1)
        if not bilm:
            tok = jnp.where(m.any(-1)[:, None], tok, 0.0)  # all-pad words
        for i in range(self.n_highway):
            t = nn.sigmoid(nn.Dense(tok.shape[-1], name=f"hw_t{i}")(tok))
            h = nn.relu(nn.Dense(tok.shape[-1], name=f"hw_h{i}")(tok))
            tok = t * h + (1.0 - t) * tok
        tok = nn.Dense(self.proj_dim, name="proj")(tok)
        tok = tok.reshape(B, W, self.proj_dim)

        # -- word-level bi-LM over the sentence
        lengths = word_mask.sum(-1)
        layers = [jnp.concatenate([tok, tok], axis=-1)]  # layer 0
        if bilm:
            # separate fwd/bwd LM stacks with per-direction residual
            # skips — the real-ELMo topology (the native mode below
            # shares a mixed input between directions instead)
            h_f = h_b = tok
            for i in range(self.num_layers):
                # cells named on the PARENT scope (fwd{i}/W_0 ...) so the
                # HDF5 import addresses them directly
                cell_f = ELMoLSTMPCell(self.cell_dim, self.proj_dim,
                                       clip=self.lstm_clip,
                                       name=f"fwd{i}")
                cell_b = ELMoLSTMPCell(self.cell_dim, self.proj_dim,
                                       clip=self.lstm_clip,
                                       name=f"bwd{i}")
                fwd = nn.RNN(cell_f)(h_f, seq_lengths=lengths)
                bwd = nn.RNN(cell_b, reverse=True, keep_order=True)(
                    h_b, seq_lengths=lengths)
                layers.append(jnp.concatenate([fwd, bwd], axis=-1))
                h_f = fwd + h_f
                h_b = bwd + h_b
        else:
            h = tok
            for i in range(self.num_layers):
                fwd = nn.RNN(nn.OptimizedLSTMCell(self.proj_dim),
                             name=f"fwd{i}")(h, seq_lengths=lengths)
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.proj_dim),
                             reverse=True, keep_order=True,
                             name=f"bwd{i}")(h, seq_lengths=lengths)
                layers.append(jnp.concatenate([fwd, bwd], axis=-1))
                h = fwd + bwd  # next layer's input (shared, proj width)

        if self.mode == "all":
            out = jnp.concatenate(layers, axis=-1)
        elif self.mode == "top":
            out = layers[-1]
        elif self.mode == "average":
            out = sum(layers) / len(layers)
        elif self.mode == "mix":
            out = ScalarMix(len(layers), name="mix")(jnp.stack(layers))
        else:
            raise ValueError(f"unknown ELMo mode {self.mode!r}")
        return out * word_mask[:, :, None].astype(out.dtype)

    @staticmethod
    def save_npz(path, params) -> None:
        """Flatten the param tree to a local npz (the zero-egress-era
        checkpoint format for pretrained ELMo weights)."""
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        arrays = {jax.tree_util.keystr(k).strip("'[]").replace(
            "']['", "/"): np.asarray(v) for k, v in flat}
        np.savez(path, **arrays)

    @staticmethod
    def load_npz(path, like_params):
        """Rebuild a param tree shaped like ``like_params`` from npz."""
        data = np.load(path)

        def _walk(tree, prefix):
            if isinstance(tree, dict):
                return {k: _walk(v, prefix + [k]) for k, v in tree.items()}
            key = "/".join(prefix)
            arr = data[key]
            if arr.shape != tuple(tree.shape):
                raise ValueError(
                    f"shape mismatch for {key}: {arr.shape} vs {tree.shape}")
            return jnp.asarray(arr)

        import flax
        plain = flax.core.unfreeze(like_params) if hasattr(
            flax.core, "unfreeze") else dict(like_params)
        return _walk(plain, [])

    @staticmethod
    def load_hdf5(path, like_params):
        """Import REAL ELMo weights — the bilm-tf HDF5 layout allennlp
        consumes (``elmo_*_weights.hdf5``; the reference stacks them via
        ``ELMoEmbeddings``, embeddings.py:677-772) — into a bilm-mode
        embedder's param tree (VERDICT r3 #9).

        Direct copies throughout: the bilm-mode module is defined in tf
        conventions (fused tf-gate-order LSTMP kernels, carry/transform
        highway, [in, out] dense kernels), so the only transform is
        squeezing the conv kernels' leading singleton. Every array is
        shape-checked against ``like_params`` — init the module first
        with char_vocab_size/filters/n_highway/proj_dim/cell_dim/
        num_layers matching the weight file's options.json.

        HDF5 keys consumed: ``char_embed``, ``CNN/W_cnn_i|b_cnn_i``,
        ``CNN_high_k/W_carry|b_carry|W_transform|b_transform``,
        ``CNN_proj/W_proj|b_proj``,
        ``RNN_{0,1}/RNN/MultiRNNCell/Cell{L}/LSTMCell/W_0|B|W_P_0``
        (RNN_0 = forward LM, RNN_1 = backward).
        """
        import h5py

        wrap = isinstance(like_params, dict) and "params" in like_params
        base = like_params["params"] if wrap else like_params

        def _plain(t):
            if hasattr(t, "items"):
                return {k: _plain(v) for k, v in t.items()}
            return t

        p = _plain(base)

        with h5py.File(path, "r") as f:
            def put(dst_path, arr):
                node = p
                for k in dst_path[:-1]:
                    node = node[k]
                want = tuple(node[dst_path[-1]].shape)
                arr = jnp.asarray(np.asarray(arr), jnp.float32)
                if tuple(arr.shape) != want:
                    raise ValueError(
                        f"{'/'.join(dst_path)}: file {tuple(arr.shape)} "
                        f"vs model {want}")
                node[dst_path[-1]] = arr

            put(("chars", "embedding"), f["char_embed"])
            conv_ids = sorted(
                int(k.rsplit("_", 1)[1]) for k in f["CNN"]
                if k.startswith("W_cnn_"))
            for i in conv_ids:
                W = np.asarray(f[f"CNN/W_cnn_{i}"])
                if W.ndim == 4:  # [1, w, char_dim, ch] tf conv2d layout
                    W = W[0]
                w = W.shape[0]
                put((f"conv{w}", "kernel"), W)
                put((f"conv{w}", "bias"), f[f"CNN/b_cnn_{i}"])
            k = 0
            while f"CNN_high_{k}" in f:
                g = f[f"CNN_high_{k}"]
                put((f"hw_t{k}", "kernel"), g["W_carry"])
                put((f"hw_t{k}", "bias"), g["b_carry"])
                put((f"hw_h{k}", "kernel"), g["W_transform"])
                put((f"hw_h{k}", "bias"), g["b_transform"])
                k += 1
            put(("proj", "kernel"), f["CNN_proj/W_proj"])
            put(("proj", "bias"), f["CNN_proj/b_proj"])
            for d, prefix in ((0, "fwd"), (1, "bwd")):
                layer = 0
                while f"RNN_{d}/RNN/MultiRNNCell/Cell{layer}" in f:
                    g = f[f"RNN_{d}/RNN/MultiRNNCell/Cell{layer}/LSTMCell"]
                    cp = (f"{prefix}{layer}",)
                    put(cp + ("W_0",), g["W_0"])
                    put(cp + ("B",), g["B"])
                    put(cp + ("W_P_0",), g["W_P_0"])
                    layer += 1

        return {"params": p} if wrap else p


class BPEVocab:
    """Subword piece vocabulary + vectors for :class:`BPEmbEmbedder`.

    Stand-in for the BPEmb package's SentencePiece models (reference
    ``BytePairEmbeddings``, embeddings.py:775-820): pieces use the
    SentencePiece convention (``▁`` marks a word start, text lowercased)
    and words are segmented by greedy longest-match over the piece
    inventory — the exact decoding a unigram/BPE model converges to for
    in-vocabulary text. Load real (locally downloaded) bpemb w2v files
    via :meth:`from_w2v_text`, or build a corpus-derived inventory with
    :meth:`build` for from-scratch training.
    """

    def __init__(self, pieces: Dict[str, int], matrix: np.ndarray):
        if "<unk>" not in pieces:
            raise ValueError("piece inventory must reserve '<unk>'")
        self.pieces = pieces
        self.matrix = matrix
        self._max_len = max((len(p) for p in pieces), default=1)

    @property
    def dim(self) -> int:
        return self.matrix.shape[1]

    @classmethod
    def from_w2v_text(cls, path) -> "BPEVocab":
        vocab, matrix = WordEmbedder.load_pretrained_text(path)
        return cls(vocab, matrix)

    @classmethod
    def build(cls, records, dim: int = 25, max_words: int = 2000,
              seed: int = 0) -> "BPEVocab":
        """Corpus-derived inventory: every char (worded ``▁c`` and
        continuation ``c`` forms) plus the ``max_words`` most frequent
        whole words, random vectors (trainable downstream)."""
        from collections import Counter
        counts: Counter = Counter()
        chars = set()
        for rec in records:
            for tok in rec.tokens:
                low = tok.lower()
                counts[low] += 1
                chars.update(low)
        pieces = {"<unk>": 0}
        for ch in sorted(chars):
            for form in (f"▁{ch}", ch):
                pieces.setdefault(form, len(pieces))
        for word, _ in counts.most_common(max_words):
            pieces.setdefault(f"▁{word}", len(pieces))
        rng = np.random.default_rng(seed)
        matrix = rng.normal(0, 0.1, (len(pieces), dim)).astype(np.float32)
        matrix[0] = 0.0
        return cls(pieces, matrix)

    def segment(self, word: str) -> List[int]:
        """Greedy longest-match piece ids for one word (never empty)."""
        text = "▁" + word.lower()
        out: List[int] = []
        i = 0
        while i < len(text):
            for ln in range(min(self._max_len, len(text) - i), 0, -1):
                idx = self.pieces.get(text[i:i + ln])
                if idx is not None:
                    out.append(idx)
                    i += ln
                    break
            else:
                out.append(0)  # <unk>
                i += 1
        return out

    def encode_first_last(self, eb) -> Tuple[np.ndarray, np.ndarray]:
        """Per-word (first piece id, last piece id) arrays [B, W] — the
        reference embeds each word and concatenates the first and last
        subword vectors."""
        B, W = eb.word_mask.shape
        first = np.zeros((B, W), dtype=np.int32)
        last = np.zeros((B, W), dtype=np.int32)
        for b, rec in enumerate(eb.records):
            for w, tok in enumerate(rec.tokens[:W]):
                ids = self.segment(tok)
                first[b, w] = ids[0]
                last[b, w] = ids[-1]
        return first, last


class BPEmbEmbedder(nn.Module):
    """Byte-pair subword embeddings: concat of the word's first and last
    piece vectors (reference ``BytePairEmbeddings`` semantics). Output
    dim = ``2 * dim``. Expects ``bpe_first_ids``/``bpe_last_ids`` in the
    batch (``data/encode.py::add_classic_features`` with a ``bpe_vocab``,
    or :meth:`BPEVocab.encode_first_last`)."""

    piece_vocab_size: int
    dim: int = 25
    trainable: bool = True

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        table = nn.Embed(self.piece_vocab_size, self.dim, name="table")
        out = jnp.concatenate(
            [table(batch["bpe_first_ids"]), table(batch["bpe_last_ids"])],
            axis=-1)
        if not self.trainable:
            out = jax.lax.stop_gradient(out)
        return out


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
