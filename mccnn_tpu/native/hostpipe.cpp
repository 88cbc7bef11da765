// Threaded host-side batch assembly for the training input pipeline.
//
// The reference's DataSet.py does per-model resample + augment + normalize in
// Python per batch element (SURVEY §2.2); at big batch x point counts that
// host work is the part the accelerator waits on. This rebuilds it as one
// C++ call over the whole batch, threaded across elements:
//   sample n_out indices (without replacement when the cloud is big enough,
//   matching data/sampling_protocols._choice) -> rotate about z -> gaussian
//   jitter (clipped) -> anisotropic scale -> unit-cube normalize
// with a counter-based splitmix64 RNG seeded per (seed, element) so results
// are deterministic and independent of the thread count.
//
// Built into libmccnn_native.so next to fastparse.cpp; loaded via ctypes
// (mccnn_tpu/native/__init__.py). No TPU involvement: this is the host half
// of the pipeline; the device graph stays static.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t& s) {
  s += 0x9E3779B97F4A7C15ull;
  uint64_t z = s;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

inline double u01(uint64_t& s) {
  return (double)(splitmix64(s) >> 11) * 0x1.0p-53;
}

inline float gauss(uint64_t& s) {  // Box-Muller, one draw per call
  double u1 = u01(s), u2 = u01(s);
  if (u1 < 1e-300) u1 = 1e-300;
  return (float)(std::sqrt(-2.0 * std::log(u1)) *
                 std::cos(6.283185307179586 * u2));
}

constexpr int kRotateZ = 1;
constexpr int kJitter = 2;
constexpr int kScale = 4;

}  // namespace

extern "C" void mccnn_assemble_batch(
    const float* const* clouds,  // batch pointers, each (sizes[b], 3) f32
    const int64_t* sizes, int64_t batch, int64_t n_out,
    uint64_t seed, int flags, float jitter_sigma, float jitter_clip,
    float scale_lo, float scale_hi,
    float* out,  // (batch, n_out, 3) f32
    int64_t* out_idx,  // (batch, n_out) chosen source rows, or nullptr
    int n_threads) {
  auto work = [&](int64_t b0, int64_t b1) {
    std::vector<int64_t> idx;
    for (int64_t b = b0; b < b1; ++b) {
      // Per-element counter seed: thread-count invariant, deterministic.
      uint64_t s = seed ^ (0xD1B54A32D192ED03ull * (uint64_t)(b + 1));
      const float* src = clouds[b];
      const int64_t n = sizes[b];
      float* dst = out + b * n_out * 3;

      idx.assign((size_t)n, 0);
      for (int64_t i = 0; i < n; ++i) idx[(size_t)i] = i;
      if (n >= n_out) {  // partial Fisher-Yates: without replacement
        for (int64_t i = 0; i < n_out; ++i) {
          int64_t j = i + (int64_t)(u01(s) * (double)(n - i));
          if (j >= n) j = n - 1;
          std::swap(idx[(size_t)i], idx[(size_t)j]);
        }
      } else {  // whole cloud + top-up with replacement
        idx.reserve((size_t)n_out);
        for (int64_t i = n; i < n_out; ++i) {
          int64_t j = (int64_t)(u01(s) * (double)n);
          if (j >= n) j = n - 1;
          idx.push_back(j);
        }
      }

      if (out_idx != nullptr)
        for (int64_t i = 0; i < n_out; ++i)
          out_idx[b * n_out + i] = idx[(size_t)i];

      float c = 1.f, sn = 0.f;
      if (flags & kRotateZ) {
        double a = u01(s) * 6.283185307179586;
        c = (float)std::cos(a);
        sn = (float)std::sin(a);
      }
      float sc[3] = {1.f, 1.f, 1.f};
      if (flags & kScale)
        for (int d = 0; d < 3; ++d)
          sc[d] = scale_lo + (float)u01(s) * (scale_hi - scale_lo);

      float mn[3] = {1e30f, 1e30f, 1e30f};
      float mx[3] = {-1e30f, -1e30f, -1e30f};
      for (int64_t i = 0; i < n_out; ++i) {
        const float* p = src + idx[(size_t)i] * 3;
        float v[3] = {p[0], p[1], p[2]};
        if (flags & kRotateZ) {
          float x = c * v[0] - sn * v[1];
          float y = sn * v[0] + c * v[1];
          v[0] = x;
          v[1] = y;
        }
        if (flags & kJitter)
          for (int d = 0; d < 3; ++d) {
            float j = gauss(s) * jitter_sigma;
            j = std::min(std::max(j, -jitter_clip), jitter_clip);
            v[d] += j;
          }
        for (int d = 0; d < 3; ++d) {
          v[d] *= sc[d];
          mn[d] = std::min(mn[d], v[d]);
          mx[d] = std::max(mx[d], v[d]);
          dst[i * 3 + d] = v[d];
        }
      }
      // Unit-cube normalize (scale-invariant, aspect kept) — the numpy
      // twin is data/datasets._normalize_np.
      float ext = std::max(mx[0] - mn[0],
                           std::max(mx[1] - mn[1], mx[2] - mn[2]));
      float inv = 1.0f / std::max(ext, 1e-9f);
      for (int64_t i = 0; i < n_out; ++i)
        for (int d = 0; d < 3; ++d)
          dst[i * 3 + d] = (dst[i * 3 + d] - mn[d]) * inv;
    }
  };

  if (n_threads <= 1 || batch <= 1) {
    work(0, batch);
    return;
  }
  int t = std::min<int64_t>(n_threads, batch);
  std::vector<std::thread> threads;
  int64_t per = (batch + t - 1) / t;
  for (int k = 0; k < t; ++k) {
    int64_t b0 = k * per, b1 = std::min<int64_t>(b0 + per, batch);
    if (b0 >= b1) break;
    threads.emplace_back(work, b0, b1);
  }
  for (auto& th : threads) th.join();
}

// ScanNet-style block batching (SURVEY §5.7: the reference chops scenes
// into fixed xy blocks on CPU): pick a random block center from the scene's
// points, collect the points of the block column (retry up to 10x until it
// holds >= 32 points), sample/pad to n_out, rotate-z + jitter, unit-cube
// normalize. Emits global scene row ids so labels ride the same sample, and
// the valid mask (padding rows repeat real rows but are masked out).
extern "C" void mccnn_extract_blocks(
    const float* const* scenes,  // per-element scene pointer (sizes[b], 3)
    const int64_t* sizes, int64_t batch, float half,
    int64_t n_out, uint64_t seed, int flags,
    float jitter_sigma, float jitter_clip,
    float* out,          // (batch, n_out, 3)
    int64_t* out_idx,    // (batch, n_out) scene rows
    uint8_t* out_mask,   // (batch, n_out) 1 = real point
    int n_threads) {
  auto work = [&](int64_t b0, int64_t b1) {
    std::vector<int64_t> sel;
    for (int64_t b = b0; b < b1; ++b) {
      uint64_t s = seed ^ (0xA0761D6478BD642Full * (uint64_t)(b + 1));
      const float* src = scenes[b];
      const int64_t n = sizes[b];
      for (int attempt = 0; attempt < 10; ++attempt) {
        int64_t c = (int64_t)(u01(s) * (double)n);
        if (c >= n) c = n - 1;
        const float cx = src[c * 3 + 0], cy = src[c * 3 + 1];
        sel.clear();
        for (int64_t i = 0; i < n; ++i) {
          if (std::fabs(src[i * 3 + 0] - cx) <= half &&
              std::fabs(src[i * 3 + 1] - cy) <= half)
            sel.push_back(i);
        }
        if ((int64_t)sel.size() >= 32) break;
      }
      const int64_t m = (int64_t)sel.size();
      int64_t* idx = out_idx + b * n_out;
      uint8_t* msk = out_mask + b * n_out;
      if (m >= n_out) {  // subsample without replacement
        for (int64_t i = 0; i < n_out; ++i) {
          int64_t j = i + (int64_t)(u01(s) * (double)(m - i));
          if (j >= m) j = m - 1;
          std::swap(sel[(size_t)i], sel[(size_t)j]);
          idx[i] = sel[(size_t)i];
          msk[i] = 1;
        }
      } else {  // all + top-up with replacement, padding masked out... no:
        // pad_points keeps mask TRUE for resampled rows (they are real
        // points repeated); mirror that so the estimator sees them.
        for (int64_t i = 0; i < m; ++i) { idx[i] = sel[(size_t)i]; msk[i] = 1; }
        for (int64_t i = m; i < n_out; ++i) {
          int64_t j = (int64_t)(u01(s) * (double)m);
          if (j >= m) j = m - 1;
          idx[i] = sel[(size_t)j];
          msk[i] = 1;
        }
      }
      // gather + augment + normalize (same pipeline as assemble)
      float* dst = out + b * n_out * 3;
      float c = 1.f, sn = 0.f;
      if (flags & kRotateZ) {
        double a = u01(s) * 6.283185307179586;
        c = (float)std::cos(a);
        sn = (float)std::sin(a);
      }
      float mn[3] = {1e30f, 1e30f, 1e30f};
      float mx[3] = {-1e30f, -1e30f, -1e30f};
      for (int64_t i = 0; i < n_out; ++i) {
        const float* p = src + idx[i] * 3;
        float v[3] = {p[0], p[1], p[2]};
        if (flags & kRotateZ) {
          float x = c * v[0] - sn * v[1];
          float y = sn * v[0] + c * v[1];
          v[0] = x;
          v[1] = y;
        }
        if (flags & kJitter)
          for (int d = 0; d < 3; ++d) {
            float j = gauss(s) * jitter_sigma;
            j = std::min(std::max(j, -jitter_clip), jitter_clip);
            v[d] += j;
          }
        for (int d = 0; d < 3; ++d) {
          mn[d] = std::min(mn[d], v[d]);
          mx[d] = std::max(mx[d], v[d]);
          dst[i * 3 + d] = v[d];
        }
      }
      float ext = std::max(mx[0] - mn[0],
                           std::max(mx[1] - mn[1], mx[2] - mn[2]));
      float inv = 1.0f / std::max(ext, 1e-9f);
      for (int64_t i = 0; i < n_out; ++i)
        for (int d = 0; d < 3; ++d)
          dst[i * 3 + d] = (dst[i * 3 + d] - mn[d]) * inv;
    }
  };

  if (n_threads <= 1 || batch <= 1) {
    work(0, batch);
    return;
  }
  int t = std::min<int64_t>(n_threads, batch);
  std::vector<std::thread> threads;
  int64_t per = (batch + t - 1) / t;
  for (int k = 0; k < t; ++k) {
    int64_t b0 = k * per, b1 = std::min<int64_t>(b0 + per, batch);
    if (b0 >= b1) break;
    threads.emplace_back(work, b0, b1);
  }
  for (auto& th : threads) th.join();
}
