// Native image-store kernels for idvs.morec_tpu.
//
// TPU-native replacement for the reference's host-side image pipeline
// (LMDB C library + PIL decode/resize + torchvision transforms running in 12
// DataLoader worker processes — inbatch_sasrec_e2e_vision/data_utils/
// dataset.py:61-99). Here the store is a flat mmap'd record file and the
// transform (PIL-compatible antialiased bilinear resize + normalize) runs
// multithreaded in C, writing straight into the caller's pinned buffer.
//
// Exposed via ctypes (no pybind11 in this image):
//   transform_batch(src_ptrs, heights, widths, channels, n, out, resize,
//                   n_threads)
//     src_i: uint8 HWC image -> out[i]: float32 RxRx3, (x/255 - .5)/.5
//
// The resize matches PIL's convolution-based BILINEAR (triangle filter with
// support scaled by the downscale factor, i.e. antialiased), which is what
// torchvision transforms.Resize uses (dataset.py:68-73).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Tap {
  int32_t first;        // first source index
  int32_t count;        // number of taps
  int32_t coeff_off;    // offset into the coefficient table
};

// Precompute triangle-filter taps for one axis (PIL ImagingResampleHorizontal
// semantics, float coefficients).
static void build_taps(int in_size, int out_size, std::vector<Tap>& taps,
                       std::vector<float>& coeffs) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  taps.resize(out_size);
  coeffs.assign(static_cast<size_t>(out_size) * ksize, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double ss = 1.0 / filterscale;
    double total = 0.0;
    int n = xmax - xmin;
    float* c = &coeffs[static_cast<size_t>(xx) * ksize];
    for (int i = 0; i < n; ++i) {
      double x = (xmin + i - center + 0.5) * ss;
      double w = (x < 0 ? 1.0 + x : 1.0 - x);
      if (w < 0) w = 0;
      c[i] = static_cast<float>(w);
      total += w;
    }
    if (total > 0) {
      for (int i = 0; i < n; ++i) c[i] = static_cast<float>(c[i] / total);
    }
    taps[xx] = {xmin, n, static_cast<int32_t>(xx * ksize)};
  }
}

static void resize_normalize_one(const uint8_t* src, int h, int w, int ch,
                                 float* dst, int r) {
  // horizontal pass: (h, w, ch) u8 -> (h, r, ch) f32
  std::vector<Tap> htaps, vtaps;
  std::vector<float> hcoef, vcoef;
  build_taps(w, r, htaps, hcoef);
  build_taps(h, r, vtaps, vcoef);
  std::vector<float> tmp(static_cast<size_t>(h) * r * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * ch;
    float* trow = &tmp[static_cast<size_t>(y) * r * 3];
    for (int x = 0; x < r; ++x) {
      const Tap& t = htaps[x];
      const float* c = &hcoef[t.coeff_off];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < t.count; ++i) {
        const uint8_t* px = row + static_cast<size_t>(t.first + i) * ch;
        float cw = c[i];
        acc0 += cw * px[0];
        acc1 += cw * px[ch > 1 ? 1 : 0];
        acc2 += cw * px[ch > 2 ? 2 : 0];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass + normalize: (h, r, 3) -> (r, r, 3), (v/255 - .5)/.5
  for (int y = 0; y < r; ++y) {
    const Tap& t = vtaps[y];
    const float* c = &vcoef[t.coeff_off];
    float* drow = dst + static_cast<size_t>(y) * r * 3;
    for (int x = 0; x < r * 3; ++x) {
      float acc = 0;
      for (int i = 0; i < t.count; ++i) {
        acc += c[i] * tmp[static_cast<size_t>(t.first + i) * r * 3 + x];
      }
      drow[x] = (acc / 255.0f - 0.5f) / 0.5f;
    }
  }
}

static void resize_u8_one(const uint8_t* src, int h, int w, int ch,
                          uint8_t* dst, int r) {
  std::vector<Tap> htaps, vtaps;
  std::vector<float> hcoef, vcoef;
  build_taps(w, r, htaps, hcoef);
  build_taps(h, r, vtaps, vcoef);
  std::vector<float> tmp(static_cast<size_t>(h) * r * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * ch;
    float* trow = &tmp[static_cast<size_t>(y) * r * 3];
    for (int x = 0; x < r; ++x) {
      const Tap& t = htaps[x];
      const float* c = &hcoef[t.coeff_off];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < t.count; ++i) {
        const uint8_t* px = row + static_cast<size_t>(t.first + i) * ch;
        float cw = c[i];
        acc0 += cw * px[0];
        acc1 += cw * px[ch > 1 ? 1 : 0];
        acc2 += cw * px[ch > 2 ? 2 : 0];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
  for (int y = 0; y < r; ++y) {
    const Tap& t = vtaps[y];
    const float* c = &vcoef[t.coeff_off];
    uint8_t* drow = dst + static_cast<size_t>(y) * r * 3;
    for (int x = 0; x < r * 3; ++x) {
      float acc = 0;
      for (int i = 0; i < t.count; ++i) {
        acc += c[i] * tmp[static_cast<size_t>(t.first + i) * r * 3 + x];
      }
      int v = static_cast<int>(acc + 0.5f);
      drow[x] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

}  // namespace

extern "C" {

// uint8 output variant: resized-only; normalization happens on-device, so
// the host->device transfer is 4x smaller than float32.
void transform_batch_u8(const uint8_t** srcs, const int32_t* heights,
                        const int32_t* widths, const int32_t* channels,
                        int32_t n, uint8_t* out, int32_t resize,
                        int32_t n_threads) {
  size_t per = static_cast<size_t>(resize) * resize * 3;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      resize_u8_one(srcs[i], heights[i], widths[i], channels[i],
                    out + i * per, resize);
    }
  };
  if (n_threads <= 1) { worker(); return; }
  std::vector<std::thread> pool;
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

void transform_batch(const uint8_t** srcs, const int32_t* heights,
                     const int32_t* widths, const int32_t* channels,
                     int32_t n, float* out, int32_t resize,
                     int32_t n_threads) {
  size_t per = static_cast<size_t>(resize) * resize * 3;
  if (n_threads <= 1) {
    for (int32_t i = 0; i < n; ++i) {
      resize_normalize_one(srcs[i], heights[i], widths[i], channels[i],
                           out + i * per, resize);
    }
    return;
  }
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      resize_normalize_one(srcs[i], heights[i], widths[i], channels[i],
                           out + i * per, resize);
    }
  };
  std::vector<std::thread> pool;
  for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
