// Native host-side data ops for the TPU feeding pipeline.
//
// The device does all model compute (XLA/Pallas); the host must keep up when
// collating ragged sessions into fixed-shape batches at production scale
// (KION: 5.5M interactions, ~1M sessions — SURVEY.md §6). These are the host
// pipeline's hot loops, compiled lazily by rectools_tpu.native with OpenMP
// threads, replacing the vectorized-numpy implementations (which still serve
// as the fallback when no compiler is available).
//
// All functions use the C ABI for ctypes binding; callers pass pre-allocated,
// pre-filled output buffers.

#include <cstdint>
#include <algorithm>

extern "C" {

// Ragged -> dense with left padding and right truncation:
// out[i, out_len - min(len_i, out_len) + j] = values[start_i + drop_i + j]
// where drop_i = max(len_i - out_len, 0). `out` must be pre-filled with the
// pad value. Mirrors data_preparator.scatter_left_padded.
void scatter_left_padded_i64(
    const int64_t* values,
    const int64_t* starts,
    const int64_t* lengths,
    int64_t n_rows,
    int64_t out_len,
    int64_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    int64_t len = lengths[i];
    int64_t clipped = std::min(len, out_len);
    int64_t src = starts[i] + (len - clipped);
    int64_t dst = i * out_len + (out_len - clipped);
    for (int64_t j = 0; j < clipped; ++j) out[dst + j] = values[src + j];
  }
}

void scatter_left_padded_f32(
    const float* values,
    const int64_t* starts,
    const int64_t* lengths,
    int64_t n_rows,
    int64_t out_len,
    float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    int64_t len = lengths[i];
    int64_t clipped = std::min(len, out_len);
    int64_t src = starts[i] + (len - clipped);
    int64_t dst = i * out_len + (out_len - clipped);
    for (int64_t j = 0; j < clipped; ++j) out[dst + j] = values[src + j];
  }
}

// Per-row CSR column extraction into a right-padded (n_rows, max_len) int32
// table (the top-k engine's seen-list format). `out` pre-filled with the
// fill sentinel. Mirrors ops.topk._csr_rows_to_padded_idx.
void csr_rows_padded_i32(
    const int32_t* indices,
    const int64_t* indptr,
    const int64_t* rows,
    int64_t n_rows,
    int64_t max_len,
    int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    int64_t r = rows[i];
    int64_t start = indptr[r];
    int64_t len = indptr[r + 1] - start;
    int64_t dst = i * max_len;
    for (int64_t j = 0; j < len; ++j) out[dst + j] = indices[start + j];
  }
}

// Session grouping: given row order (already sorted by (session, datetime))
// is established on the python side via argsorts; this helper computes, for
// a batch of sessions, the flattened gather indices that collate SASRec
// shifted-sequence training batches (x from s[:-1], y/yw from s[1:]) in one
// pass, writing x/y ids and y weights directly.
void sasrec_train_collate(
    const int64_t* items,
    const float* weights,
    const int64_t* starts,
    const int64_t* lengths,  // session lengths (>= 2)
    int64_t n_rows,
    int64_t out_len,
    int64_t* x_out,   // pre-filled with 0
    int64_t* y_out,   // pre-filled with 0
    float* yw_out) {  // pre-filled with 0
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    int64_t m = lengths[i] - 1;            // shifted-pair count
    int64_t clipped = std::min(m, out_len);
    int64_t drop = m - clipped;
    int64_t src = starts[i] + drop;
    int64_t dst = i * out_len + (out_len - clipped);
    for (int64_t j = 0; j < clipped; ++j) {
      x_out[dst + j] = items[src + j];
      y_out[dst + j] = items[src + j + 1];
      yw_out[dst + j] = weights[src + j + 1];
    }
  }
}

}  // extern "C"
