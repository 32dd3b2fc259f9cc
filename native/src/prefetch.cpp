// Threaded batch prefetcher: shuffled uint8 batches assembled off the
// training thread into a bounded ring buffer.
//
// TPU-native replacement for the host-side data path the reference gets
// from torch's multi-worker DataLoader: while the device runs step N, the
// next batches are gathered/augmented on host threads so the input pipe
// never stalls the accelerator. Exposed via a C handle API consumed with
// ctypes (inverse_flow_tpu/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Prefetcher {
  const uint8_t* data = nullptr;  // (N, item_bytes), borrowed
  int64_t n = 0;
  int64_t item_bytes = 0;
  int64_t batch_size = 0;
  int shuffle = 0;
  uint64_t seed = 0;

  std::vector<int64_t> order;
  int64_t cursor = 0;           // next batch index within epoch
  int64_t epoch = 0;

  std::queue<std::vector<uint8_t>> ready;
  size_t capacity = 4;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<bool> done{false};  // worker exited (no more batches coming)

  int64_t batches_per_epoch() const { return n / batch_size; }

  void reshuffle() {
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    if (shuffle) {
      std::mt19937_64 rng(seed + static_cast<uint64_t>(epoch));
      for (int64_t i = n - 1; i > 0; --i) {
        std::uniform_int_distribution<int64_t> d(0, i);
        std::swap(order[i], order[d(rng)]);
      }
    }
  }

  void run() {
    run_loop();
    // consumers parked in next() must wake even though no batch will
    // ever arrive (early-exit on a bad handle, or stop during destroy)
    done.store(true);
    cv_ready.notify_all();
  }

  void run_loop() {
    // n < batch_size would walk order[] out of bounds below; the python
    // layer rejects this, but never segfault on a bad handle either way
    if (batches_per_epoch() <= 0) return;
    reshuffle();
    while (!stop.load()) {
      if (cursor >= batches_per_epoch()) {
        ++epoch;
        cursor = 0;
        reshuffle();
      }
      std::vector<uint8_t> batch(batch_size * item_bytes);
      for (int64_t i = 0; i < batch_size; ++i) {
        const int64_t src = order[cursor * batch_size + i];
        std::memcpy(batch.data() + i * item_bytes,
                    data + src * item_bytes, item_bytes);
      }
      ++cursor;
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < capacity || stop; });
      if (stop.load()) break;
      ready.push(std::move(batch));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* ift_prefetch_create(const uint8_t* data, int64_t n, int64_t item_bytes,
                          int64_t batch_size, int shuffle, uint64_t seed,
                          int64_t queue_capacity) {
  auto* p = new Prefetcher();
  p->data = data;
  p->n = n;
  p->item_bytes = item_bytes;
  p->batch_size = batch_size;
  p->shuffle = shuffle;
  p->seed = seed;
  p->capacity = static_cast<size_t>(queue_capacity > 0 ? queue_capacity : 4);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until a batch is available; copies it into out (batch*item
// bytes). Returns 0 on success, -1 when no batch will ever arrive (the
// worker exited — bad handle geometry or a concurrent stop/destroy) so
// the consumer never parks forever on a dead producer.
int ift_prefetch_next(void* handle, uint8_t* out) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::vector<uint8_t> batch;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_ready.wait(lk, [&] {
      return !p->ready.empty() || p->stop.load() || p->done.load();
    });
    if (p->ready.empty()) return -1;
    batch = std::move(p->ready.front());
    p->ready.pop();
    p->cv_space.notify_one();
  }
  std::memcpy(out, batch.data(), batch.size());
  return 0;
}

int64_t ift_prefetch_batches_per_epoch(void* handle) {
  return static_cast<Prefetcher*>(handle)->batches_per_epoch();
}

void ift_prefetch_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
