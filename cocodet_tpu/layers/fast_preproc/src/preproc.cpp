// Native host-side image preprocessing for the inference data loader.
//
// Role parity: the reference leans on PIL-SIMD + torch DataLoader worker
// processes for its resize/pad/collate hot path
// (ref choijhanyangackr/yolox_infer/preprocess_utils.py:9-55, SURVEY.md
// §3.2 "CPU worker procs"); this is the TPU build's native equivalent: a
// C++17 letterbox kernel (bilinear resize + pad + dtype convert fused in
// one pass over the output) exposed through a C ABI for ctypes, used by the
// python loaders when available. Threads parallelize over output rows.
//
// letterbox_u8: HWC uint8 BGR in -> fixed (out_h, out_w) canvas,
//   ratio-preserving bilinear resize anchored top-left, `fill` elsewhere,
//   float32 output (no normalization — matches the reference's pipeline).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline void resize_rows(const uint8_t* src, int sh, int sw,
                        float* dst, int out_w, int new_h, int new_w,
                        float fill, int row_begin, int row_end) {
  const float sy_ratio = static_cast<float>(sh) / new_h;
  const float sx_ratio = static_cast<float>(sw) / new_w;
  for (int y = row_begin; y < row_end; ++y) {
    float* out_row = dst + static_cast<size_t>(y) * out_w * 3;
    if (y >= new_h) {
      std::fill(out_row, out_row + static_cast<size_t>(out_w) * 3, fill);
      continue;
    }
    // cv2.INTER_LINEAR pixel-center convention
    const float fy = (y + 0.5f) * sy_ratio - 0.5f;
    const int y0 = std::clamp(static_cast<int>(std::floor(fy)), 0, sh - 1);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = std::clamp(fy - y0, 0.0f, 1.0f);
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    int x = 0;
    for (; x < new_w; ++x) {
      const float fx = (x + 0.5f) * sx_ratio - 0.5f;
      const int x0 = std::clamp(static_cast<int>(std::floor(fx)), 0, sw - 1);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = std::clamp(fx - x0, 0.0f, 1.0f);
      for (int c = 0; c < 3; ++c) {
        const float top = row0[x0 * 3 + c] +
                          wx * (row0[x1 * 3 + c] - row0[x0 * 3 + c]);
        const float bot = row1[x0 * 3 + c] +
                          wx * (row1[x1 * 3 + c] - row1[x0 * 3 + c]);
        out_row[x * 3 + c] = top + wy * (bot - top);
      }
    }
    for (; x < out_w; ++x)
      for (int c = 0; c < 3; ++c) out_row[x * 3 + c] = fill;
  }
}

}  // namespace

extern "C" {

// Returns the resize ratio used.
float letterbox_u8(const uint8_t* src, int src_h, int src_w,
                   float* dst, int out_h, int out_w,
                   float fill, int num_threads) {
  const float r = std::min(static_cast<float>(out_h) / src_h,
                           static_cast<float>(out_w) / src_w);
  const int new_h = static_cast<int>(src_h * r);
  const int new_w = static_cast<int>(src_w * r);

  if (num_threads <= 1) {
    resize_rows(src, src_h, src_w, dst, out_w, new_h, new_w, fill, 0, out_h);
    return r;
  }
  std::vector<std::thread> workers;
  const int rows_per = (out_h + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int b = t * rows_per;
    const int e = std::min(b + rows_per, out_h);
    if (b >= e) break;
    workers.emplace_back(resize_rows, src, src_h, src_w, dst, out_w,
                         new_h, new_w, fill, b, e);
  }
  for (auto& w : workers) w.join();
  return r;
}

}  // extern "C"
