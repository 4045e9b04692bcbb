"""Benchmark: BM25 retrieval throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): >=10,000 queries/s on a v5e-8 chip-group against the
English Wikipedia index. This bench runs on ONE chip over a synthetic
Wikipedia-scale-statistics corpus shard (Zipf term distribution, sentence-
length docs), so vs_baseline is measured against the per-chip share of the
target: 10k / 8 chips = 1250 q/s per chip.
"""

import json
import time

import numpy as np

N_DOCS = 131072  # one shard's worth of sentence docs
VOCAB = 50000
DOC_LEN = 24  # analyzed sentence length (terms)
Q_BATCH = 256
Q_LEN = 24
K = 10
BASELINE_PER_CHIP = 10000.0 / 8.0


def synth_corpus(rng, n_docs, vocab, doc_len):
    """Zipf-distributed term ids, padded impact layout built directly."""
    # Zipf ranks: p(r) ~ 1/r
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    docs = rng.choice(vocab, size=(n_docs, doc_len), p=probs)
    return docs


def build_padded_arrays(docs, vocab, k1=1.2, b=0.75):
    n_docs, doc_len = docs.shape
    # df: count docs containing each term (via per-row unique runs)
    sorted_terms = np.sort(docs, axis=1)
    uniq_mask = np.ones_like(sorted_terms, dtype=bool)
    uniq_mask[:, 1:] = sorted_terms[:, 1:] != sorted_terms[:, :-1]
    flat = sorted_terms[uniq_mask]
    df = np.bincount(flat, minlength=vocab)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)).astype(np.float32)

    # per-doc unique terms + tf
    ld = doc_len
    doc_terms = np.full((n_docs, ld), -1, dtype=np.int32)
    doc_impacts = np.zeros((n_docs, ld), dtype=np.float32)
    avgdl = float(doc_len)
    norm = k1 * (1 - b + b * doc_len / avgdl)
    # tf via sorted runs
    run_start = uniq_mask
    # count run lengths
    idx = np.arange(doc_len)
    for d in range(0, n_docs, 8192):
        sl = slice(d, min(d + 8192, n_docs))
        st = sorted_terms[sl]
        um = run_start[sl]
        # run-length encode each row
        counts = np.zeros_like(st)
        # positions of run starts per row -> lengths by diff
        for r in range(st.shape[0]):
            starts = idx[um[r]]
            ends = np.append(starts[1:], doc_len)
            terms = st[r][um[r]]
            tfs = (ends - starts).astype(np.float32)
            imps = idf[terms] * tfs / (tfs + norm)
            doc_terms[d + r, : len(terms)] = terms
            doc_impacts[d + r, : len(terms)] = imps
    return doc_terms, doc_impacts


def main():
    import jax
    import jax.numpy as jnp

    from kbner_tpu.ops.bm25 import bm25_topk

    backend = jax.default_backend()
    rng = np.random.RandomState(0)
    docs = synth_corpus(rng, N_DOCS, VOCAB, DOC_LEN)
    doc_terms, doc_impacts = build_padded_arrays(docs, VOCAB)

    dtt = jnp.asarray(np.ascontiguousarray(doc_terms.T))
    dit = jnp.asarray(np.ascontiguousarray(doc_impacts.T))

    # queries: sentence-like Zipf samples; distinct batch per timed
    # iteration so no layer (device or tunnel) can cache identical runs
    n_iter = 10
    q_batches = [
        jnp.asarray(
            synth_corpus(rng, Q_BATCH, VOCAB, Q_LEN).astype(np.int32))
        for _ in range(n_iter + 1)
    ]
    qt = q_batches[0]
    qwj = jnp.asarray(np.ones((Q_BATCH, Q_LEN), dtype=np.float32))

    import functools

    # NB: arrays must be jit ARGUMENTS, not closure constants — closed-over
    # arrays are embedded in the HLO as literals, which balloons compile time
    # through the remote-compile tunnel.
    @functools.partial(jax.jit, static_argnames=("use_pallas",))
    def run(fields, use_pallas):
        # block_d=256 measured marginally best on v5e (the kernel is at its
        # VPU compute roof; block size shifts it only a few percent)
        return bm25_topk(fields, k=K, use_pallas=use_pallas,
                         block_q=Q_BATCH if Q_BATCH <= 128 else 128,
                         block_d=256)

    fields = ((qt, qwj, dtt, dit),)
    use_pallas = backend == "tpu"
    try:
        s, i = run(fields, use_pallas=use_pallas)
        jax.block_until_ready((s, i))
    except Exception:
        use_pallas = False
        s, i = run(fields, use_pallas=False)
        jax.block_until_ready((s, i))

    # warmup with a host pull: the first synced execution pays one-time
    # device-upload of the index arrays (lazy under the remote tunnel)
    for wit in range(2):
        s, i = run(((q_batches[wit], qwj, dtt, dit),), use_pallas=use_pallas)
        float(s[0, 0])

    # timed runs, each on a distinct query batch, blocked per iteration
    # (the remote-execution tunnel can otherwise report async completions)
    t0 = time.perf_counter()
    checksum = 0.0
    for it in range(n_iter):
        f = ((q_batches[it + 1], qwj, dtt, dit),)
        s, i = run(f, use_pallas=use_pallas)
        # pull a scalar to the host: block_until_ready alone can return on
        # async RPC acknowledgement under the remote-execution tunnel
        checksum += float(s[0, 0])
    dt = (time.perf_counter() - t0) / n_iter
    qps = Q_BATCH / dt

    print(json.dumps({
        "metric": "bm25_retrieval_throughput",
        "value": round(qps, 1),
        "unit": f"queries/s/chip (N={N_DOCS} docs, k={K}, "
                f"{'pallas' if use_pallas else 'xla'}, {backend})",
        "vs_baseline": round(qps / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
