// t2onet_native: host-side data-pipeline kernels.
//
// The reference leans on native wheels for its host pipeline: pycocotools'
// C RLE decoder (reference data/GIER/GIER.py:18,272) and OpenCV's C++
// resize (reference utils/visual_utils.py:6-47). This library provides the
// same primitives as a small self-contained C shared object consumed via
// ctypes (t2onet_tpu/native.py), with pure-numpy fallbacks when unbuilt.
//
// Semantics notes:
// - rle_decode_string implements pycocotools rleFrString: 5-bit chars
//   offset 48, bit 5 continuation, sign extension, counts delta-coded
//   against the value two back; masks unroll column-major.
// - resize_bilinear matches cv2.INTER_LINEAR: half-pixel-center mapping
//   src_x = (dst_x + 0.5) * scale - 0.5, edge-clamped.
// - resize_nearest matches cv2.INTER_NEAREST: src_x = floor(dst_x * scale).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Decode pycocotools-style compressed counts into a (h, w) row-major mask.
// Returns 0 on success, -1 if counts do not sum to h*w.
int rle_decode_string(const char* s, int h, int w, uint8_t* out) {
  std::vector<int64_t> counts;
  size_t i = 0, n = std::strlen(s);
  while (i < n) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more && i < n) {
      int64_t c = static_cast<int64_t>(s[i]) - 48;
      x |= (c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }
  int64_t total = 0;
  for (int64_t c : counts) total += c;
  if (total != static_cast<int64_t>(h) * w) return -1;

  // unroll column-major: flat index f -> out[f % h][f / h]
  int64_t f = 0;
  uint8_t val = 0;
  for (int64_t c : counts) {
    for (int64_t j = 0; j < c; ++j, ++f) {
      out[(f % h) * w + (f / h)] = val;
    }
    val ^= 1;
  }
  return 0;
}

// Decode uncompressed counts (int64 array) the same way.
int rle_decode_counts(const int64_t* counts, int n_counts, int h, int w,
                      uint8_t* out) {
  int64_t total = 0;
  for (int i = 0; i < n_counts; ++i) total += counts[i];
  if (total != static_cast<int64_t>(h) * w) return -1;
  int64_t f = 0;
  uint8_t val = 0;
  for (int i = 0; i < n_counts; ++i) {
    for (int64_t j = 0; j < counts[i]; ++j, ++f) {
      out[(f % h) * w + (f / h)] = val;
    }
    val ^= 1;
  }
  return 0;
}

// Bilinear resize, cv2.INTER_LINEAR semantics. src (h, w, c) float32
// row-major -> dst (oh, ow, c).
void resize_bilinear(const float* src, int h, int w, int c, float* dst,
                     int oh, int ow) {
  // cv2 derives the scale as 1/(dst/src), NOT src/dst — the two differ in
  // the last double bit, which matters where floor() sits on a boundary
  const double sy = 1.0 / (static_cast<double>(oh) / h);
  const double sx = 1.0 / (static_cast<double>(ow) / w);
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = static_cast<int>(std::floor(fy));
    double wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), h - 1);
    int y1c = std::min(std::max(y0 + 1, 0), h - 1);
    for (int x = 0; x < ow; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = static_cast<int>(std::floor(fx));
      double wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), w - 1);
      int x1c = std::min(std::max(x0 + 1, 0), w - 1);
      const float* p00 = src + (y0c * w + x0c) * c;
      const float* p01 = src + (y0c * w + x1c) * c;
      const float* p10 = src + (y1c * w + x0c) * c;
      const float* p11 = src + (y1c * w + x1c) * c;
      float* d = dst + (y * ow + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        double top = p00[ch] * (1.0 - wx) + p01[ch] * wx;
        double bot = p10[ch] * (1.0 - wx) + p11[ch] * wx;
        d[ch] = static_cast<float>(top * (1.0 - wy) + bot * wy);
      }
    }
  }
}

// Nearest resize, cv2.INTER_NEAREST semantics (uint8 masks).
void resize_nearest_u8(const uint8_t* src, int h, int w, uint8_t* dst,
                       int oh, int ow) {
  // 1/(dst/src), not src/dst: at exact-integer products the cast-floor
  // lands on a different source row otherwise (e.g. 14->18 row 9)
  const double sy = 1.0 / (static_cast<double>(oh) / h);
  const double sx = 1.0 / (static_cast<double>(ow) / w);
  for (int y = 0; y < oh; ++y) {
    int ys = std::min(static_cast<int>(y * sy), h - 1);
    for (int x = 0; x < ow; ++x) {
      int xs = std::min(static_cast<int>(x * sx), w - 1);
      dst[y * ow + x] = src[ys * w + xs];
    }
  }
}

// HWC uint8 BGR -> CHW float32 RGB in [0,1] (the reference's load_train_img
// post-decode transform, visual_utils.py:11-13).
void bgr_u8_to_rgb_chw(const uint8_t* src, int h, int w, float* dst) {
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const uint8_t* p = src + (y * w + x) * 3;
      dst[0 * h * w + y * w + x] = p[2] * inv;  // R
      dst[1 * h * w + y * w + x] = p[1] * inv;  // G
      dst[2 * h * w + y * w + x] = p[0] * inv;  // B
    }
  }
}

// Threaded batch bilinear resize: n images (h, w, c) -> (oh, ow, c).
void batch_resize_bilinear(const float* src, int n, int h, int w, int c,
                           float* dst, int oh, int ow, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      resize_bilinear(src + static_cast<int64_t>(i) * h * w * c, h, w, c,
                      dst + static_cast<int64_t>(i) * oh * ow * c, oh, ow);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
}

}  // extern "C"
