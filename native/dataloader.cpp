// quantnet native data loader: multithreaded host-side batch assembly.
//
// TPU-native equivalent of the compute the reference delegated to PyTorch
// DataLoader worker processes (reference utils/dataset_manager.py:130-166,
// num_workers=4): gather a batch by index from uint8 image storage, apply
// train-time augmentation (pad+random-crop, horizontal flip — the reference's
// transform at utils/dataset_manager.py:31-38), and emit normalized float32
// NHWC ready for device transfer. Keeping the dataset resident as uint8 and
// converting per batch costs 4x less host RAM than float32 storage; doing the
// gather+normalize in C++ threads keeps the host pipeline off the Python GIL
// so it overlaps with device compute.
//
// C ABI only (consumed via ctypes from quantnet/data/native_loader.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// xorshift64* — deterministic per-sample RNG so results are reproducible
// regardless of thread scheduling.
inline uint64_t xorshift(uint64_t x) {
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  return x * 0x2545F4914F6CDD1DULL;
}

struct BatchJob {
  const uint8_t* images;  // [n, h, w, c] u8
  const int32_t* labels;  // [n]
  const int64_t* indices; // [batch]
  int h, w, c;
  float* out;             // [batch, h, w, c] f32
  int32_t* out_labels;    // [batch]
  const float* mean;      // [c]
  const float* inv_std;   // [c]
  int pad;                // augment: reflect-pad then random crop
  int augment;            // 0 = eval path (normalize only)
  uint64_t seed;
};

void process_one(const BatchJob& job, int bi) {
  const int h = job.h, w = job.w, c = job.c;
  const int64_t src_idx = job.indices[bi];
  const uint8_t* src = job.images + (size_t)src_idx * h * w * c;
  float* dst = job.out + (size_t)bi * h * w * c;
  job.out_labels[bi] = job.labels[src_idx];

  int dy = 0, dx = 0;
  bool flip = false;
  if (job.augment) {
    uint64_t r = xorshift(job.seed + 0x9E3779B97F4A7C15ULL * (uint64_t)(bi + 1));
    dy = (int)(r % (uint64_t)(2 * job.pad + 1)) - job.pad;
    r = xorshift(r);
    dx = (int)(r % (uint64_t)(2 * job.pad + 1)) - job.pad;
    r = xorshift(r);
    flip = (r & 1u) != 0;
  }

  for (int y = 0; y < h; ++y) {
    // shifted source row with zero-pad semantics (out-of-range -> 0 before
    // normalization, i.e. the pad pixel value is 0/255)
    int sy = y + dy;
    bool row_in = sy >= 0 && sy < h;
    for (int x = 0; x < w; ++x) {
      int sx = flip ? (w - 1 - x) : x;
      sx += dx;
      bool in = row_in && sx >= 0 && sx < w;
      const uint8_t* px = src + ((size_t)sy * w + sx) * c;
      float* q = dst + ((size_t)y * w + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float v = in ? (float)px[ch] * (1.0f / 255.0f) : 0.0f;
        q[ch] = (v - job.mean[ch]) * job.inv_std[ch];
      }
    }
  }
}

}  // namespace

extern "C" {

// Assemble one batch. Returns 0 on success.
int qn_prepare_batch(
    const uint8_t* images, const int32_t* labels, int64_t n,
    int h, int w, int c,
    const int64_t* indices, int64_t batch,
    float* out_images, int32_t* out_labels,
    const float* mean, const float* std,
    int pad, int augment, uint64_t seed, int num_threads) {
  (void)n;
  std::vector<float> inv_std(c);
  for (int ch = 0; ch < c; ++ch) inv_std[ch] = 1.0f / std[ch];

  BatchJob job{images, labels, indices, h, w, c,
               out_images, out_labels, mean, inv_std.data(),
               pad, augment, seed};

  if (num_threads <= 1 || batch < 8) {
    for (int64_t i = 0; i < batch; ++i) process_one(job, (int)i);
    return 0;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= batch) return;
      process_one(job, (int)i);
    }
  };
  std::vector<std::thread> threads;
  int nt = num_threads;
  if ((int64_t)nt > batch) nt = (int)batch;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Deterministic Fisher-Yates shuffle of an index array (epoch shuffling).
void qn_shuffle_indices(int64_t* indices, int64_t n, uint64_t seed) {
  uint64_t r = seed ? seed : 1;
  for (int64_t i = n - 1; i > 0; --i) {
    r = xorshift(r);
    int64_t j = (int64_t)(r % (uint64_t)(i + 1));
    int64_t tmp = indices[i];
    indices[i] = indices[j];
    indices[j] = tmp;
  }
}

int qn_version() { return 1; }

}  // extern "C"
