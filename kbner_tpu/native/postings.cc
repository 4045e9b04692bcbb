// Native posting-list gatherer for two-pass pruned BM25 search.
//
// Plays the role Lucene's C++/Java posting traversal plays inside
// Elasticsearch for the reference (kb/generate_data.py -> ES _msearch):
// given term-major CSR postings and each query's selected (rare) terms,
// concatenate the terms' posting ranges into fixed-width per-query buffers
// that the TPU kernels consume. This is pure memory movement — exactly the
// part that belongs in native code rather than Python.
//
// Build: g++ -O3 -march=native -shared -fPIC postings.cc -o libpostings.so
//
// Entry point (C ABI, called via ctypes):
//   gather_postings(
//     offsets[V+1] int64, postings_doc[NNZ] int32, postings_imp[NNZ] f32,
//     q_terms[Q*M] int32 (term ids, <0 = empty slot),
//     Q, M, P, df_cap,
//     out_doc[Q*P] int32 (pre-filled -1), out_imp[Q*P] f32)
//
// Terms whose df exceeds df_cap are skipped (they are re-scored exactly in
// pass 2; MaxScore-style demotion). Each query's ranges are copied until the
// P-slot budget is exhausted.

#include <cstdint>
#include <cstring>

extern "C" {

void gather_postings(const int64_t* offsets,
                     const int32_t* postings_doc,
                     const float* postings_imp,
                     const int32_t* q_terms,
                     int64_t Q, int64_t M, int64_t P, int64_t df_cap,
                     int32_t* out_doc, float* out_imp) {
  for (int64_t q = 0; q < Q; ++q) {
    int64_t used = 0;
    int32_t* od = out_doc + q * P;
    float* oi = out_imp + q * P;
    for (int64_t m = 0; m < M && used < P; ++m) {
      int32_t t = q_terms[q * M + m];
      if (t < 0) continue;
      int64_t lo = offsets[t];
      int64_t hi = offsets[t + 1];
      int64_t df = hi - lo;
      if (df_cap > 0 && df > df_cap) continue;
      int64_t n = df;
      if (used + n > P) n = P - used;
      std::memcpy(od + used, postings_doc + lo, n * sizeof(int32_t));
      std::memcpy(oi + used, postings_imp + lo, n * sizeof(float));
      used += n;
    }
  }
}

// Tiny-exact gather for compact-rows pruned search: per query, accumulate
// every posting of every "tiny" query term (full list fits the pass-1
// window) into per-doc sums — impact sums (candidate ranking) and
// weight*impact sums (the exact score contribution pass 2 adds, since
// those terms carry no pass-2 row slots).
//
// Dedup strategy: a dense per-doc accumulator array with an epoch tag per
// doc (O(total postings), no hashing, no sort). The caller allocates the
// scratch arrays once per engine and reuses them across batches.
//
//   tiny_exact(
//     offsets[V+1] int64, postings_doc[NNZ] int32, postings_imp[NNZ] f32,
//     q_terms[Q*L] int32, q_weights[Q*L] f32, is_tiny[Q*L] uint8,
//     Q, L, T (output width), n_docs,
//     scratch_epoch[n_docs] int32 (zero-initialized once),
//     scratch_imp[n_docs] f32, scratch_ex[n_docs] f32,
//     scratch_docs[n_docs] int32 (touched-doc list),
//     epoch_base int32 (strictly increasing across calls; caller passes
//       previous base + Q),
//     out_doc[Q*T] int32 (pre-filled -1), out_imp[Q*T] f32,
//     out_ex[Q*T] f32)
// Returns the max per-query distinct-doc count (so the caller can size T:
// call once with T=0 to measure, then with the real buffers).

int64_t tiny_exact(const int64_t* offsets,
                   const int32_t* postings_doc,
                   const float* postings_imp,
                   const int32_t* q_terms,
                   const float* q_weights,
                   const uint8_t* is_tiny,
                   int64_t Q, int64_t L, int64_t T, int64_t n_docs,
                   int32_t* scratch_epoch,
                   float* scratch_imp,
                   float* scratch_ex,
                   int32_t* scratch_docs,
                   int32_t epoch_base,
                   int32_t* out_doc, float* out_imp, float* out_ex) {
  int64_t max_docs = 0;
  for (int64_t q = 0; q < Q; ++q) {
    const int32_t epoch = epoch_base + (int32_t)q;
    int64_t n_touched = 0;
    for (int64_t l = 0; l < L; ++l) {
      if (!is_tiny[q * L + l]) continue;
      int32_t t = q_terms[q * L + l];
      if (t < 0) continue;
      float w = q_weights[q * L + l];
      int64_t lo = offsets[t];
      int64_t hi = offsets[t + 1];
      for (int64_t p = lo; p < hi; ++p) {
        int32_t d = postings_doc[p];
        float imp = postings_imp[p];
        if (scratch_epoch[d] != epoch) {
          scratch_epoch[d] = epoch;
          scratch_imp[d] = 0.0f;
          scratch_ex[d] = 0.0f;
          scratch_docs[n_touched++] = d;
        }
        scratch_imp[d] += imp;
        scratch_ex[d] += w * imp;
      }
    }
    if (n_touched > max_docs) max_docs = n_touched;
    if (T > 0) {
      int32_t* od = out_doc + q * T;
      float* oi = out_imp + q * T;
      float* oe = out_ex + q * T;
      int64_t n = n_touched < T ? n_touched : T;
      for (int64_t i = 0; i < n; ++i) {
        int32_t d = scratch_docs[i];
        od[i] = d;
        oi[i] = scratch_imp[d];
        oe[i] = scratch_ex[d];
      }
    }
  }
  return max_docs;
}

}  // extern "C"
