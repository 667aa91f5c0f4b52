// tpu_unet native data-loader core.
//
// The host-side input pipeline (SURVEY.md §3.1: the second-hottest path in the
// reference is PIL decode + transforms in DataLoader workers) gets a native,
// GIL-free core: multi-threaded bilinear/nearest uint8 resize and a scanline
// polygon rasterizer. Exposed as a plain C ABI consumed via ctypes
// (tpu_unet/data/native.py); Python/PIL paths remain as fallbacks.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libloader_core.so loader_core.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear resize, half-pixel-center convention (align_corners=false), uint8 HWC.
void resize_bilinear_rows(const uint8_t* src, int sh, int sw, int c,
                          uint8_t* dst, int dh, int dw, int row0, int row1) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int oy = row0; oy < row1; ++oy) {
    float fy = clampf((oy + 0.5f) * sy - 0.5f, 0.0f, sh - 1.0f);
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int ox = 0; ox < dw; ++ox) {
      float fx = clampf((ox + 0.5f) * sx - 0.5f, 0.0f, sw - 1.0f);
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * c;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * c;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * c;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * c;
      uint8_t* out = dst + (static_cast<size_t>(oy) * dw + ox) * c;
      for (int ch = 0; ch < c; ++ch) {
        float top = p00[ch] + (p01[ch] - p00[ch]) * wx;
        float bot = p10[ch] + (p11[ch] - p10[ch]) * wx;
        float v = top + (bot - top) * wy;
        out[ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void resize_nearest_rows(const uint8_t* src, int sh, int sw, int c,
                         uint8_t* dst, int dh, int dw, int row0, int row1) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int oy = row0; oy < row1; ++oy) {
    int iy = std::min(static_cast<int>(oy * sy), sh - 1);
    for (int ox = 0; ox < dw; ++ox) {
      int ix = std::min(static_cast<int>(ox * sx), sw - 1);
      std::memcpy(dst + (static_cast<size_t>(oy) * dw + ox) * c,
                  src + (static_cast<size_t>(iy) * sw + ix) * c, c);
    }
  }
}

template <typename RowFn>
void parallel_rows(int dh, int n_threads, RowFn fn) {
  n_threads = std::max(1, std::min(n_threads, dh));
  if (n_threads == 1) {
    fn(0, dh);
    return;
  }
  std::vector<std::thread> workers;
  int chunk = (dh + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int r0 = t * chunk;
    int r1 = std::min(dh, r0 + chunk);
    if (r0 >= r1) break;
    workers.emplace_back([=] { fn(r0, r1); });
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

// Resize uint8 HWC image. mode: 0 = nearest, 1 = bilinear.
void tu_resize_u8(const uint8_t* src, int sh, int sw, int c,
                  uint8_t* dst, int dh, int dw, int mode, int n_threads) {
  if (mode == 1) {
    parallel_rows(dh, n_threads, [&](int r0, int r1) {
      resize_bilinear_rows(src, sh, sw, c, dst, dh, dw, r0, r1);
    });
  } else {
    parallel_rows(dh, n_threads, [&](int r0, int r1) {
      resize_nearest_rows(src, sh, sw, c, dst, dh, dw, r0, r1);
    });
  }
}

// Batch resize: n images with identical source dims packed contiguously.
void tu_resize_u8_batch(const uint8_t* src, int n, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw, int mode, int n_threads) {
  std::atomic<int> next(0);
  int workers = std::max(1, n_threads);
  std::vector<std::thread> pool;
  for (int t = 0; t < std::min(workers, n); ++t) {
    pool.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) {
        tu_resize_u8(src + static_cast<size_t>(i) * sh * sw * c, sh, sw, c,
                     dst + static_cast<size_t>(i) * dh * dw * c, dh, dw, mode, 1);
      }
    });
  }
  for (auto& w : pool) w.join();
}

// Even-odd scanline polygon fill (integer pixel-center rule): sets mask[y*w+x]=value
// for pixels whose centers lie inside the polygon. points: (x0,y0,x1,y1,...).
void tu_fill_polygon(uint8_t* mask, int h, int w,
                     const float* points, int n_points, uint8_t value) {
  if (n_points < 3) return;
  std::vector<float> xs;
  for (int y = 0; y < h; ++y) {
    float cy = y + 0.0f;  // integer scanline (PIL-style): test at y itself
    xs.clear();
    for (int i = 0; i < n_points; ++i) {
      float x0 = points[2 * i], y0 = points[2 * i + 1];
      float x1 = points[2 * ((i + 1) % n_points)];
      float y1 = points[2 * ((i + 1) % n_points) + 1];
      if ((y0 <= cy && y1 > cy) || (y1 <= cy && y0 > cy)) {
        xs.push_back(x0 + (cy - y0) * (x1 - x0) / (y1 - y0));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t i = 0; i + 1 < xs.size(); i += 2) {
      int xa = static_cast<int>(std::ceil(xs[i]));
      int xb = static_cast<int>(std::floor(xs[i + 1]));
      xa = std::max(xa, 0);
      xb = std::min(xb, w - 1);
      for (int x = xa; x <= xb; ++x) mask[static_cast<size_t>(y) * w + x] = value;
    }
  }
}

int tu_version() { return 1; }

}  // extern "C"
