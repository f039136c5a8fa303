// Native host-side packing for the ChatTS-TPU processor.
//
// The reference's per-request CPU work (value-preserved scaling + patch
// packing) runs inside its GPU model file as a per-sample Python loop
// (reference: chatts/vllm/chatts_vllm.py:107-158) and its HF processor.
// Here the host hot path is one fused C++ pass per request batch:
//   for each ragged series: mean -> 3.0-clip scale -> write into the padded
//   (N, Lmax) float32 value/mask buffers -> ceil(L/patch) patch count.
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency in this
// image).  The Python fallback in chatts_tpu/processor keeps behavior
// identical when the extension is not built.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// in:  flat concatenated float64 series values
// lengths: per-series lengths (n entries)
// n: number of series;  n_pad >= n: padded row count
// lmax: padded series length (multiple of patch_size)
// patch_size: points per patch
// out values/mask: (n_pad, lmax) float32, zero-initialized by caller or here
// out patch_cnt: (n_pad,) int32
// out offsets/scales: (n,) float64 — the sp prompt-echo metadata
// returns 0 on success, negative on error
int sp_encode_pack(
    const double* in,
    const int64_t* lengths,
    int64_t n,
    int64_t n_pad,
    int64_t lmax,
    int64_t patch_size,
    float* values_out,
    float* mask_out,
    int32_t* patch_cnt_out,
    double* offsets_out,
    double* scales_out) {
  if (n < 0 || n_pad < n || lmax <= 0 || patch_size <= 0) return -1;
  if (lmax % patch_size != 0) return -2;

  std::memset(values_out, 0, sizeof(float) * n_pad * lmax);
  std::memset(mask_out, 0, sizeof(float) * n_pad * lmax);
  std::memset(patch_cnt_out, 0, sizeof(int32_t) * n_pad);

  int64_t cursor = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t len = lengths[i];
    if (len < 0 || len > lmax) return -3;
    const double* src = in + cursor;
    cursor += len;

    // Pass 1: mean.
    double sum = 0.0;
    for (int64_t j = 0; j < len; ++j) sum += src[j];
    const double mean = len > 0 ? sum / static_cast<double>(len) : 0.0;

    // Pass 2: max |x - mean|.
    double max_abs = 0.0;
    for (int64_t j = 0; j < len; ++j) {
      const double d = std::fabs(src[j] - mean);
      if (d > max_abs) max_abs = d;
    }
    // sp rule: scale only when any |x - mean| >= 3.0
    // (reference: chatts/utils/encoding_utils.py:23-37).
    const double scale = (max_abs >= 3.0) ? (max_abs / 3.0) : 1.0;

    float* vrow = values_out + i * lmax;
    float* mrow = mask_out + i * lmax;
    const double inv_scale = 1.0 / scale;
    for (int64_t j = 0; j < len; ++j) {
      vrow[j] = static_cast<float>((src[j] - mean) * inv_scale);
      mrow[j] = 1.0f;
    }

    patch_cnt_out[i] =
        static_cast<int32_t>((len + patch_size - 1) / patch_size);
    offsets_out[i] = -mean;
    scales_out[i] = scale;
  }
  return 0;
}

// Fill the (series, patch) -> (sequence, token) scatter map used by the
// embedding merge.  starts[i] is the placeholder-run start offset of series i
// inside its sequence seq_of[i]; invalid slots get the OOB sentinel
// (seq_sentinel, tok_sentinel) so the device scatter drops them.
int build_scatter_map(
    const int32_t* patch_cnt,
    const int32_t* seq_of,
    const int32_t* starts,
    int64_t n,
    int64_t n_pad,
    int64_t p_max,
    int32_t seq_sentinel,
    int32_t tok_sentinel,
    int32_t* scatter_seq_out,
    int32_t* scatter_tok_out) {
  for (int64_t i = 0; i < n_pad; ++i) {
    const int32_t pc = (i < n) ? patch_cnt[i] : 0;
    int32_t* srow = scatter_seq_out + i * p_max;
    int32_t* trow = scatter_tok_out + i * p_max;
    for (int64_t p = 0; p < p_max; ++p) {
      if (i < n && p < pc) {
        srow[p] = seq_of[i];
        trow[p] = starts[i] + static_cast<int32_t>(p);
      } else {
        srow[p] = seq_sentinel;
        trow[p] = tok_sentinel;
      }
    }
  }
  return 0;
}

}  // extern "C"
