// Native batch-preparation library for the input pipeline.
//
// The reference delegated host-side data work to timm/PyTorch's C++ loader
// workers; this is the TPU framework's native equivalent: a small
// thread-pooled C++ library that turns uint8 HWC image batches into
// normalized float32 NHWC tensors (with optional nearest-neighbor resize and
// index gathering) without holding the Python GIL.  Bound via ctypes
// (convnet_approximater_tpu/data/native.py); the Python Loader falls back to
// numpy when the shared object is unavailable.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libbatch_prep.so batch_prep.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct PrepJob {
  const uint8_t* images;   // (num_total, H, W, C) source pool
  const int64_t* indices;  // (n,) rows to gather
  int n, H, W, C;          // source geometry
  int th, tw;              // target geometry (resize if != H, W)
  const float* mean;       // (C,) already scaled to 0..255 range
  const float* std_;       // (C,)
  float* out;              // (n, th, tw, C)
};

void prep_range(const PrepJob& job, int begin, int end) {
  const int64_t src_img = (int64_t)job.H * job.W * job.C;
  const int64_t dst_img = (int64_t)job.th * job.tw * job.C;
  // precompute per-channel scale/shift: out = (x - mean) / std
  std::vector<float> scale(job.C), shift(job.C);
  for (int c = 0; c < job.C; ++c) {
    scale[c] = 1.0f / job.std_[c];
    shift[c] = -job.mean[c] / job.std_[c];
  }
  const bool resize = (job.th != job.H) || (job.tw != job.W);
  std::vector<int> rmap(job.th), cmap(job.tw);
  if (resize) {
    for (int r = 0; r < job.th; ++r) rmap[r] = (int)((int64_t)r * job.H / job.th);
    for (int c = 0; c < job.tw; ++c) cmap[c] = (int)((int64_t)c * job.W / job.tw);
  }
  for (int i = begin; i < end; ++i) {
    const uint8_t* src = job.images + job.indices[i] * src_img;
    float* dst = job.out + (int64_t)i * dst_img;
    if (!resize) {
      const int64_t npix = (int64_t)job.H * job.W;
      for (int64_t p = 0; p < npix; ++p) {
        const uint8_t* sp = src + p * job.C;
        float* dp = dst + p * job.C;
        for (int c = 0; c < job.C; ++c) dp[c] = sp[c] * scale[c] + shift[c];
      }
    } else {
      for (int r = 0; r < job.th; ++r) {
        const uint8_t* srow = src + (int64_t)rmap[r] * job.W * job.C;
        float* drow = dst + (int64_t)r * job.tw * job.C;
        for (int c2 = 0; c2 < job.tw; ++c2) {
          const uint8_t* sp = srow + (int64_t)cmap[c2] * job.C;
          float* dp = drow + (int64_t)c2 * job.C;
          for (int c = 0; c < job.C; ++c) dp[c] = sp[c] * scale[c] + shift[c];
        }
      }
    }
  }
}

struct AugJob {
  const uint8_t* images;
  const int64_t* indices;
  int n, H, W, C;
  int th, tw;
  const float* mean;
  const float* std_;
  const int64_t* y0;   // (n,) crop-rect origin (may be negative: reflect)
  const int64_t* x0;   // (n,)
  const int64_t* ch;   // (n,) crop-rect height
  const int64_t* cw;   // (n,) crop-rect width
  const uint8_t* flip; // (n,) horizontal-flip flags
  float* out;          // (n, th, tw, C)
};

inline int reflect_index(int64_t v, int size) {
  // numpy pad(mode='reflect') semantics: -k -> k, size-1+k -> size-1-k
  if (v < 0) v = -v;
  if (v > size - 1) v = 2 * (int64_t)(size - 1) - v;
  if (v < 0) v = 0;
  if (v > size - 1) v = size - 1;
  return (int)v;
}

// Gather + reflect-crop + flip + nearest-resize + normalize, fused — the
// native applier for the Loader's augmentation parameterization
// (loader.py::draw_aug_params); bit-identical to the numpy apply_aug path.
void aug_range(const AugJob& job, int begin, int end) {
  const int64_t src_img = (int64_t)job.H * job.W * job.C;
  const int64_t dst_img = (int64_t)job.th * job.tw * job.C;
  std::vector<float> scale(job.C), shift(job.C);
  for (int c = 0; c < job.C; ++c) {
    scale[c] = 1.0f / job.std_[c];
    shift[c] = -job.mean[c] / job.std_[c];
  }
  std::vector<int> rmap(job.th), cmap(job.tw);
  for (int i = begin; i < end; ++i) {
    const uint8_t* src = job.images + job.indices[i] * src_img;
    float* dst = job.out + (int64_t)i * dst_img;
    const int64_t chi = job.ch[i], cwi = job.cw[i];
    for (int r = 0; r < job.th; ++r)
      rmap[r] = reflect_index(job.y0[i] + ((int64_t)r * chi) / job.th, job.H);
    const bool fl = job.flip[i] != 0;
    for (int c2 = 0; c2 < job.tw; ++c2) {
      int64_t cs = fl ? (job.tw - 1 - c2) : c2;
      cmap[c2] = reflect_index(job.x0[i] + (cs * cwi) / job.tw, job.W);
    }
    for (int r = 0; r < job.th; ++r) {
      const uint8_t* srow = src + (int64_t)rmap[r] * job.W * job.C;
      float* drow = dst + (int64_t)r * job.tw * job.C;
      for (int c2 = 0; c2 < job.tw; ++c2) {
        const uint8_t* sp = srow + (int64_t)cmap[c2] * job.C;
        float* dp = drow + (int64_t)c2 * job.C;
        for (int c = 0; c < job.C; ++c) dp[c] = sp[c] * scale[c] + shift[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Gather + (nearest) resize + normalize a batch.  Returns 0 on success.
int cat_prep_batch(const uint8_t* images, const int64_t* indices, int n,
                   int H, int W, int C, int th, int tw,
                   const float* mean, const float* std_, float* out,
                   int num_threads) {
  if (n <= 0 || C <= 0) return 1;
  PrepJob job{images, indices, n, H, W, C, th, tw, mean, std_, out};
  if (num_threads <= 1 || n == 1) {
    prep_range(job, 0, n);
    return 0;
  }
  int workers = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(workers);
  int chunk = (n + workers - 1) / workers;
  for (int w = 0; w < workers; ++w) {
    int b = w * chunk, e = b + chunk < n ? b + chunk : n;
    if (b >= e) break;
    pool.emplace_back([&job, b, e] { prep_range(job, b, e); });
  }
  for (auto& t : pool) t.join();
  return 0;
}

// Augmented variant: per-image crop rect (reflect at borders) + flip, then
// nearest-resize to (th, tw) and normalize.  Returns 0 on success.
int cat_prep_batch_aug(const uint8_t* images, const int64_t* indices, int n,
                       int H, int W, int C, int th, int tw,
                       const float* mean, const float* std_,
                       const int64_t* y0, const int64_t* x0,
                       const int64_t* ch, const int64_t* cw,
                       const uint8_t* flip, float* out, int num_threads) {
  if (n <= 0 || C <= 0 || th <= 0 || tw <= 0) return 1;
  AugJob job{images, indices, n, H, W, C, th, tw, mean, std_,
             y0, x0, ch, cw, flip, out};
  if (num_threads <= 1 || n == 1) {
    aug_range(job, 0, n);
    return 0;
  }
  int workers = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(workers);
  int chunk = (n + workers - 1) / workers;
  for (int w = 0; w < workers; ++w) {
    int b = w * chunk, e = b + chunk < n ? b + chunk : n;
    if (b >= e) break;
    pool.emplace_back([&job, b, e] { aug_range(job, b, e); });
  }
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
