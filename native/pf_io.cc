// patchfusion_tpu native host-IO kernels.
//
// The reference framework's data path leans on C++ library kernels
// (cv2 decode/resize, torch CPU tensor ops). This is the equivalent
// native layer for the TPU build's host side: 4K .raw decode
// (BGR uint8 -> RGB float/255) and align_corners=true bilinear resize,
// both row-parallel with std::thread. Exposed through a C ABI for ctypes
// (patchfusion_tpu/data/native.py).
//
// Build: make -C native   ->  native/libpfio.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename F>
void parallel_rows(int64_t total, F fn) {
  int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(total, 1));
  if (nt <= 1) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (total + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min<int64_t>(b + chunk, total);
    if (b >= e) break;
    threads.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// uint8 HxWx3 BGR buffer -> float32 HxWx3 RGB in [0,1].
// (reference u4k_dataset.py:115-129: np.fromfile + [:, :, ::-1] + /255)
void pf_decode_bgr_u8(const uint8_t* src, float* dst, int64_t h, int64_t w) {
  const float inv = 1.0f / 255.0f;
  parallel_rows(h, [=](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const uint8_t* s = src + r * w * 3;
      float* d = dst + r * w * 3;
      for (int64_t c = 0; c < w; ++c) {
        d[c * 3 + 0] = s[c * 3 + 2] * inv;  // R <- B slot
        d[c * 3 + 1] = s[c * 3 + 1] * inv;
        d[c * 3 + 2] = s[c * 3 + 0] * inv;  // B <- R slot
      }
    }
  });
}

// Read a .raw file straight into the decoded float buffer (fused IO+decode).
// Returns 0 on success, -1 on IO failure.
int pf_load_raw_bgr(const char* path, float* dst, int64_t h, int64_t w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<uint8_t> buf(static_cast<size_t>(h) * w * 3);
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;
  pf_decode_bgr_u8(buf.data(), dst, h, w);
  return 0;
}

// Bilinear align_corners=true resize, float32 HxWxC -> OHxOWxC.
// Matches torch F.interpolate(..., mode='bilinear', align_corners=True)
// with float32 coordinate math (the reference Resize transform).
void pf_resize_bilinear_ac(const float* src, float* dst, int64_t h,
                           int64_t w, int64_t c, int64_t oh, int64_t ow) {
  std::vector<int32_t> x0(ow), x1(ow);
  std::vector<float> tx(ow);
  const float sx = ow > 1 ? static_cast<float>(w - 1) / (ow - 1) : 0.0f;
  for (int64_t i = 0; i < ow; ++i) {
    float v = std::min(std::max(i * sx, 0.0f), static_cast<float>(w - 1));
    x0[i] = static_cast<int32_t>(v);
    x1[i] = std::min<int32_t>(x0[i] + 1, w - 1);
    tx[i] = v - x0[i];
  }
  const float sy = oh > 1 ? static_cast<float>(h - 1) / (oh - 1) : 0.0f;
  parallel_rows(oh, [=, &x0, &x1, &tx](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      float v = std::min(std::max(r * sy, 0.0f), static_cast<float>(h - 1));
      int64_t y0 = static_cast<int64_t>(v);
      int64_t y1 = std::min<int64_t>(y0 + 1, h - 1);
      float ty = v - y0;
      const float* r0 = src + y0 * w * c;
      const float* r1 = src + y1 * w * c;
      float* d = dst + r * ow * c;
      for (int64_t i = 0; i < ow; ++i) {
        const float* a0 = r0 + x0[i] * c;
        const float* a1 = r0 + x1[i] * c;
        const float* b0 = r1 + x0[i] * c;
        const float* b1 = r1 + x1[i] * c;
        float fx = tx[i];
        for (int64_t k = 0; k < c; ++k) {
          float top = a0[k] + (a1[k] - a0[k]) * fx;
          float bot = b0[k] + (b1[k] - b0[k]) * fx;
          d[i * c + k] = top + (bot - top) * ty;
        }
      }
    }
  });
}

// Fused crop(+to-float already) + resize: crop [y:y+ch, x:x+cw] of a float
// HxWxC image, bilinear-ac resize to OHxOWxC (the tile-preprocessing hot
// loop, reference baseline_pretrain.py:258-267, when run host-side).
void pf_crop_resize(const float* src, float* dst, int64_t h, int64_t w,
                    int64_t c, int64_t y, int64_t x, int64_t ch, int64_t cw,
                    int64_t oh, int64_t ow) {
  std::vector<float> crop(static_cast<size_t>(ch) * cw * c);
  parallel_rows(ch, [&](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      std::memcpy(crop.data() + r * cw * c, src + ((y + r) * w + x) * c,
                  sizeof(float) * cw * c);
    }
  });
  pf_resize_bilinear_ac(crop.data(), dst, ch, cw, c, oh, ow);
}

}  // extern "C"
