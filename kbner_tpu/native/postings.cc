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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

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

// Impact-ordered CSR construction from the padded doc-major arrays —
// the index-build analogue of Lucene's segment flush (inverted index
// write, kb/build_kb.py's _bulk ingest endpoint). Replaces a NumPy
// lexsort over all NNZ postings (the upload-path hotspot) with a
// counting sort by term + per-term impact sort:
//   pass 1: df counts; prefix-sum -> offsets
//   pass 2: scatter (docs ascend within each term by construction)
//   pass 3: per-term sort by (impact desc, doc asc) == the stable
//           ordering contract of np.lexsort((-imps, terms))
void build_csr(const int32_t* doc_terms, const float* doc_impacts,
               int64_t N, int64_t Ld, int64_t V,
               int64_t* offsets /* V+1, caller-zeroed */,
               int64_t* df /* V, caller-zeroed */,
               int32_t* out_doc, float* out_imp) {
  const int64_t total = N * Ld;
  for (int64_t i = 0; i < total; ++i) {
    int32_t t = doc_terms[i];
    if (t >= 0) df[t]++;
  }
  offsets[0] = 0;
  for (int64_t v = 0; v < V; ++v) offsets[v + 1] = offsets[v] + df[v];
  std::vector<int64_t> cursor(offsets, offsets + V);
  for (int64_t d = 0; d < N; ++d) {
    const int32_t* row_t = doc_terms + d * Ld;
    const float* row_i = doc_impacts + d * Ld;
    for (int64_t l = 0; l < Ld; ++l) {
      int32_t t = row_t[l];
      if (t < 0) continue;
      int64_t c = cursor[t]++;
      out_doc[c] = (int32_t)d;
      out_imp[c] = row_i[l];
    }
  }
  std::vector<std::pair<float, int32_t>> buf;
  for (int64_t v = 0; v < V; ++v) {
    int64_t lo = offsets[v], hi = offsets[v + 1];
    if (hi - lo < 2) continue;
    buf.resize(hi - lo);
    for (int64_t p = lo; p < hi; ++p)
      buf[p - lo] = {out_imp[p], out_doc[p]};
    std::sort(buf.begin(), buf.end(),
              [](const std::pair<float, int32_t>& a,
                 const std::pair<float, int32_t>& b) {
                if (a.first != b.first) return a.first > b.first;
                return a.second < b.second;
              });
    for (int64_t p = lo; p < hi; ++p) {
      out_imp[p] = buf[p - lo].first;
      out_doc[p] = buf[p - lo].second;
    }
  }
}

// Left-compacted doc arrays with tiny-term slots (df <= tiny_cap)
// removed — the compact-rows memory optimization's host pass. Two-phase:
// Ld2 == 0 measures (out_len only), a second call fills the
// caller-allocated [N, Ld2] buffers (out_dt prefilled -1, out_di zeroed).
void compact_tiny(const int32_t* doc_terms, const float* doc_impacts,
                  const int64_t* df, int64_t tiny_cap,
                  int64_t N, int64_t Ld, int64_t Ld2,
                  int32_t* out_dt, float* out_di, int32_t* out_len) {
  for (int64_t d = 0; d < N; ++d) {
    const int32_t* row_t = doc_terms + d * Ld;
    const float* row_i = doc_impacts + d * Ld;
    int32_t n = 0;
    if (Ld2 == 0) {
      for (int64_t l = 0; l < Ld; ++l) {
        int32_t t = row_t[l];
        if (t >= 0 && df[t] > tiny_cap) n++;
      }
    } else {
      int32_t* o_t = out_dt + d * Ld2;
      float* o_i = out_di + d * Ld2;
      for (int64_t l = 0; l < Ld; ++l) {
        int32_t t = row_t[l];
        if (t >= 0 && df[t] > tiny_cap) {
          o_t[n] = t;
          o_i[n] = row_i[l];
          n++;
        }
      }
    }
    out_len[d] = n;
  }
}

// Ragged pass-2 row packing: per doc, one int32 per real (doc, term)
// slot, (log_code << term_bits) | term_id, written left-packed at the
// doc's precomputed segment offset (engine.py::_pack_doc_rows_ragged's
// scatter, fused with the log quantization of the impacts).
// `term_lo` is the PER-TERM log base (nullptr = scalar `lo` for all
// terms): codes store ln(imp) - lo[t], so the per-term base rides the
// query weight at search time (w' = w * exp(lo[t])) and the global step
// only has to span the widest single term's impact range (~4x finer
// quantization than a collection-global scale at the same bit budget).
void pack_ragged(const int32_t* dt, const float* di, const int64_t* off,
                 int64_t N, int64_t Ld, int64_t term_bits,
                 double lo, double step, int64_t levels,
                 const float* term_lo,
                 int32_t* flat /* prefilled -1 */) {
  const uint32_t mask =
      term_bits >= 32 ? 0xFFFFFFFFu : ((1u << term_bits) - 1u);
  for (int64_t d = 0; d < N; ++d) {
    const int32_t* rt = dt + d * Ld;
    const float* ri = di + d * Ld;
    int64_t base = off[d];
    int64_t j = 0;
    for (int64_t l = 0; l < Ld; ++l) {
      int32_t t = rt[l];
      if (t < 0) continue;
      float imp = ri[l];
      uint32_t code = 0;
      if (imp > 0.0f) {
        double base_lo = term_lo ? (double)term_lo[t] : lo;
        double v = std::rint((std::log((double)imp) - base_lo) / step);
        if (v < 0.0) v = 0.0;
        if (v > (double)levels) v = (double)levels;
        code = (uint32_t)v + 1u;
      }
      flat[base + j] = (int32_t)((code << term_bits) | ((uint32_t)t & mask));
      ++j;
    }
  }
}

// Capped + min_df-filtered CSR copy: each term's `cap` highest-impact
// postings (the pass-1 window prefix — the CSR is impact-ordered), terms
// with df <= min_df dropped entirely (tiny terms the device never looks
// up). Caller computes the output offsets (cheap df arithmetic) and
// allocates; this just does the range memcpys.
void csr_cap(const int64_t* offsets, const int32_t* p_doc,
             const float* p_imp, int64_t V, int64_t cap, int64_t min_df,
             const int64_t* out_off, int32_t* out_doc, float* out_imp) {
  for (int64_t v = 0; v < V; ++v) {
    int64_t n = out_off[v + 1] - out_off[v];
    if (n <= 0) continue;
    std::memcpy(out_doc + out_off[v], p_doc + offsets[v],
                n * sizeof(int32_t));
    std::memcpy(out_imp + out_off[v], p_imp + offsets[v],
                n * sizeof(float));
  }
  (void)cap;
  (void)min_df;
}

// Delta16 pass-2 slot-stream emission (engine.py::_pack_doc_rows_delta16):
// per valid posting, n_cont continuation slots (gap field 8191, tf 0)
// then the real slot ((rem << 3) | tf), written at the doc's off cursor.
// One linear pass; avoids the NumPy fallback's repeat temporaries at
// collection scale.
void pack_delta16(const int32_t* rem, const int32_t* tf,
                  const int32_t* n_cont, const uint8_t* valid,
                  const int64_t* off, int64_t N, int64_t L,
                  uint16_t* flat) {
  const uint16_t cont = (uint16_t)(8191u << 3);
  for (int64_t d = 0; d < N; ++d) {
    int64_t cursor = off[d];
    const int64_t base = d * L;
    for (int64_t j = 0; j < L; ++j) {
      if (!valid[base + j]) continue;
      for (int32_t c = 0; c < n_cont[base + j]; ++c)
        flat[cursor++] = cont;
      flat[cursor++] =
          (uint16_t)(((uint32_t)rem[base + j] << 3) |
                     ((uint32_t)tf[base + j] & 7u));
    }
  }
}

}  // extern "C"

// Fused delta16 row transform (the collection-scale path): per doc,
// collect the remapped (id, tf) pairs, insertion-sort by id (rows are
// short — L <= ~64), and either count slots (pass 1) or emit them
// (pass 2). tf is inverted exactly from the stored impact:
// x = imp/idf = tf/(tf+norm) -> tf = norm*x/(1-x), clipped to [1, 7].
// Replaces a NumPy fallback whose [N, L] int64/f64 temporaries at 4.19M
// docs pushed the host into swap (485 s); this runs in one pass.
namespace {
constexpr int kMaxGap = 8191;
constexpr uint16_t kCont = (uint16_t)(8191u << 3);

inline int64_t d16_doc(const int32_t* dt, const float* di,
                       const int32_t* remap, const float* idf,
                       float norm, int64_t L, int32_t* ids, int32_t* tfs,
                       uint16_t* out /* null = count only */) {
  int n = 0;
  for (int64_t j = 0; j < L; ++j) {
    int32_t t = dt[j];
    if (t < 0) continue;
    int32_t r = remap[t];
    if (r < 0) continue;  // tiny term (host-exact block covers it)
    double x = (double)di[j] / (idf[t] > 1e-30f ? (double)idf[t] : 1e-30);
    if (x < 0.0) x = 0.0;
    if (x > 1.0 - 1e-9) x = 1.0 - 1e-9;
    int tf = (int)(norm * x / (1.0 - x) + 0.5);
    if (tf < 1) tf = 1;
    if (tf > 7) tf = 7;
    // insertion sort by remapped id
    int k = n++;
    while (k > 0 && ids[k - 1] > r) {
      ids[k] = ids[k - 1];
      tfs[k] = tfs[k - 1];
      --k;
    }
    ids[k] = r;
    tfs[k] = tf;
  }
  int64_t slots = 0;
  int32_t prev = 0;
  for (int i = 0; i < n; ++i) {
    int64_t gap = ids[i] - prev;
    int64_t nc = gap / kMaxGap;
    int64_t rem = gap - nc * kMaxGap;
    if (out != nullptr) {
      for (int64_t c = 0; c < nc; ++c) out[slots + c] = kCont;
      out[slots + nc] =
          (uint16_t)(((uint32_t)rem << 3) | ((uint32_t)tfs[i] & 7u));
    }
    slots += nc + 1;
    prev = ids[i];
  }
  return slots;
}
}  // namespace

extern "C" {

// Pass 1: slot counts per doc (lens drives the Python-side group
// placement that assigns row offsets).
void delta16_lens(const int32_t* dt, const float* di, const int32_t* remap,
                  const float* idf, const float* norm, int64_t N, int64_t L,
                  int64_t* lens) {
  std::vector<int32_t> ids(L), tfs(L);
  for (int64_t d = 0; d < N; ++d)
    lens[d] = d16_doc(dt + d * L, di + d * L, remap, idf, norm[d], L,
                      ids.data(), tfs.data(), nullptr);
}

// Pass 2: emit each doc's slots at its assigned offset.
void delta16_emit(const int32_t* dt, const float* di, const int32_t* remap,
                  const float* idf, const float* norm, const int64_t* off,
                  int64_t N, int64_t L, uint16_t* flat) {
  std::vector<int32_t> ids(L), tfs(L);
  for (int64_t d = 0; d < N; ++d)
    d16_doc(dt + d * L, di + d * L, remap, idf, norm[d], L, ids.data(),
            tfs.data(), flat + off[d]);
}

}  // extern "C"
