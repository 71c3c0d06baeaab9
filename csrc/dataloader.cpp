// Native data-loading runtime: threaded batch preparation with prefetch.
//
// The reference inherits its native input pipeline from torch.utils.data
// (multi-process workers, /root/reference/pytorch_generative/datasets.py:57).
// This is the TPU build's equivalent: a C++ worker pool that shuffles per
// epoch, applies the stochastic host-side transforms (dynamic binarization /
// dequantization, both with a counter-based RNG so every epoch re-samples
// deterministically), converts uint8 -> float32, and prefetches batches into
// a bounded queue so host preprocessing overlaps device steps.
//
// C API (ctypes-friendly), no external dependencies beyond pthreads.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kTransformNone = 0;
constexpr int kTransformBinarize = 1;
constexpr int kTransformDequantize = 2;

// splitmix64: counter-based, so (seed, epoch, batch, i) -> deterministic noise.
inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

inline float uniform01(uint64_t bits) {
  return static_cast<float>(bits >> 40) * (1.0f / 16777216.0f);
}

struct Batch {
  std::vector<float> xs;
  std::vector<int64_t> ys;
  int64_t n = 0;
};

class DataLoader {
 public:
  DataLoader(const uint8_t* data, const int64_t* labels, int64_t n_examples,
             int64_t example_size, int64_t batch_size, int transform,
             int shuffle, uint64_t seed, int n_threads, int prefetch)
      : data_(data, data + n_examples * example_size),
        n_examples_(n_examples),
        example_size_(example_size),
        batch_size_(batch_size),
        transform_(transform),
        shuffle_(shuffle),
        seed_(seed),
        prefetch_(prefetch < 1 ? 1 : prefetch),
        n_threads_(n_threads < 1 ? 1 : n_threads) {
    if (labels != nullptr) {
      labels_.assign(labels, labels + n_examples);
    }
    n_batches_ = (n_examples_ + batch_size_ - 1) / batch_size_;
    StartEpoch(0);
  }

  ~DataLoader() { Shutdown(); }

  int64_t n_batches() const { return n_batches_; }

  // Blocks until the next batch of the current epoch is ready; returns the
  // number of examples (0 once the epoch is exhausted).
  int64_t Next(float* out_x, int64_t* out_y) {
    std::unique_lock<std::mutex> lock(mu_);
    ready_cv_.wait(lock, [&] {
      return !queue_.empty() || stop_.load() || produced_ == n_batches_;
    });
    if (queue_.empty()) return 0;
    Batch batch = std::move(queue_.front());
    queue_.pop_front();
    lock.unlock();
    space_cv_.notify_all();

    std::memcpy(out_x, batch.xs.data(), batch.xs.size() * sizeof(float));
    if (out_y != nullptr && !batch.ys.empty()) {
      std::memcpy(out_y, batch.ys.data(), batch.ys.size() * sizeof(int64_t));
    }
    return batch.n;
  }

  // Resets producers for a new epoch (fresh shuffle + fresh transform noise).
  void StartEpoch(uint64_t epoch) {
    Shutdown();
    epoch_ = epoch;
    produced_ = 0;
    next_batch_.store(0);
    queue_.clear();
    stop_.store(false);

    order_.resize(n_examples_);
    for (int64_t i = 0; i < n_examples_; ++i) order_[i] = i;
    if (shuffle_) {
      std::mt19937_64 rng(splitmix64(seed_ ^ (epoch_ * 0x51f1d9ab2c03ULL)));
      for (int64_t i = n_examples_ - 1; i > 0; --i) {
        std::swap(order_[i], order_[rng() % (i + 1)]);
      }
    }
    for (int t = 0; t < n_threads_; ++t) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

 private:
  void Shutdown() {
    {
      // The store must happen under mu_: a worker that has just evaluated a
      // wait predicate (seeing stop_ == false) but not yet blocked would
      // otherwise miss the notification and sleep forever (lost wakeup).
      std::lock_guard<std::mutex> lock(mu_);
      stop_.store(true);
    }
    // Wake every waiter: workers park on space_cv_ (queue full) AND on
    // order_cv_ (waiting for their predecessor batch, which after stop_ will
    // never be enqueued); a consumer may be parked on ready_cv_.
    space_cv_.notify_all();
    order_cv_.notify_all();
    ready_cv_.notify_all();
    for (auto& t : workers_) {
      if (t.joinable()) t.join();
    }
    workers_.clear();
  }

  void WorkerLoop() {
    while (!stop_.load()) {
      int64_t b = next_batch_.fetch_add(1);
      if (b >= n_batches_) return;
      Batch batch = MakeBatch(b);
      std::unique_lock<std::mutex> lock(mu_);
      space_cv_.wait(lock, [&] {
        return stop_.load() ||
               static_cast<int>(queue_.size()) < prefetch_ * n_threads_;
      });
      if (stop_.load()) return;
      // Keep delivery ordered: batch b may only be enqueued after b-1.
      order_cv_.wait(lock, [&] { return stop_.load() || produced_ == b; });
      if (stop_.load()) return;
      queue_.push_back(std::move(batch));
      ++produced_;
      ready_cv_.notify_all();
      order_cv_.notify_all();
    }
  }

  Batch MakeBatch(int64_t b) {
    const int64_t start = b * batch_size_;
    const int64_t n = std::min(batch_size_, n_examples_ - start);
    Batch batch;
    batch.n = n;
    batch.xs.resize(n * example_size_);
    if (!labels_.empty()) batch.ys.resize(n);

    for (int64_t j = 0; j < n; ++j) {
      const int64_t src = order_[start + j];
      const uint8_t* px = data_.data() + src * example_size_;
      float* dst = batch.xs.data() + j * example_size_;
      const uint64_t key =
          splitmix64(seed_) ^ splitmix64(epoch_ * 1315423911ULL + b) ^
          splitmix64(static_cast<uint64_t>(j) * 2654435761ULL);
      for (int64_t i = 0; i < example_size_; ++i) {
        const float v = px[i] * (1.0f / 255.0f);
        if (transform_ == kTransformBinarize) {
          const float u = uniform01(splitmix64(key + static_cast<uint64_t>(i)));
          dst[i] = (u < v) ? 1.0f : 0.0f;
        } else if (transform_ == kTransformDequantize) {
          const float u = uniform01(splitmix64(key + static_cast<uint64_t>(i)));
          dst[i] = (px[i] + u) * (1.0f / 256.0f);
        } else {
          dst[i] = v;
        }
      }
      if (!labels_.empty()) batch.ys[j] = labels_[src];
    }
    return batch;
  }

  std::vector<uint8_t> data_;
  std::vector<int64_t> labels_;
  int64_t n_examples_, example_size_, batch_size_, n_batches_;
  int transform_, shuffle_;
  uint64_t seed_, epoch_ = 0;
  int prefetch_, n_threads_;

  std::vector<int64_t> order_;
  std::vector<std::thread> workers_;
  std::deque<Batch> queue_;
  std::mutex mu_;
  std::condition_variable ready_cv_, space_cv_, order_cv_;
  std::atomic<int64_t> next_batch_{0};
  int64_t produced_ = 0;
  std::atomic<bool> stop_{false};
};

}  // namespace

extern "C" {

void* pgt_loader_create(const uint8_t* data, const int64_t* labels,
                        int64_t n_examples, int64_t example_size,
                        int64_t batch_size, int transform, int shuffle,
                        uint64_t seed, int n_threads, int prefetch) {
  return new DataLoader(data, labels, n_examples, example_size, batch_size,
                        transform, shuffle, seed, n_threads, prefetch);
}

int64_t pgt_loader_n_batches(void* handle) {
  return static_cast<DataLoader*>(handle)->n_batches();
}

void pgt_loader_start_epoch(void* handle, uint64_t epoch) {
  static_cast<DataLoader*>(handle)->StartEpoch(epoch);
}

int64_t pgt_loader_next(void* handle, float* out_x, int64_t* out_y) {
  return static_cast<DataLoader*>(handle)->Next(out_x, out_y);
}

void pgt_loader_destroy(void* handle) {
  delete static_cast<DataLoader*>(handle);
}

}  // extern "C"
