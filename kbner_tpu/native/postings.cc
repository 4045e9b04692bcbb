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

}  // extern "C"
