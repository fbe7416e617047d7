// Native host-side data pipeline: threaded shuffle + gather + batch queue.
//
// Replaces the role of tf.data's C++ pipeline in the reference
// (/root/reference/data.py:133-146, tf2/data.py:65-90: shuffle -> repeat ->
// map -> batch -> prefetch, all executed by TF's C++ runtime).  The TPU-side
// augmentation lives in XLA (ops/augment.py); what remains on the host is
// exactly this: assemble shuffled uint8 batches ahead of time, off the GIL,
// so the accelerator never waits on Python.
//
// Design: N worker threads pre-assemble batches into a bounded ring of
// slots.  An epoch is a Fisher-Yates permutation derived from (seed, epoch).
// Workers claim consecutive batch indices from an atomic counter; slot
// ordering is preserved so consumers see batches in permutation order
// (deterministic given the seed).  Consumer copies out under no lock except
// the slot's ready flag.
//
// C ABI (used via ctypes from data/native_pipeline.py):
//   void* sp_create(images, n, item_bytes, labels, batch, seed,
//                   num_threads, queue_depth, drop_remainder, loop,
//                   start_batch);  // resume: first batch index produced
//   long  sp_next(handle, out_images, out_labels);  // returns batch index,
//                                                   // -1 at end of data
//   void  sp_destroy(handle);

#include <atomic>
#include <chrono>
#include <memory>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<uint8_t> images;
  std::vector<int32_t> labels;
  std::atomic<int64_t> batch_index{-1};  // which global batch occupies this slot
  std::atomic<bool> ready{false};
};

struct Pipeline {
  const uint8_t* images;
  const int32_t* labels;
  int64_t n;
  int64_t item_bytes;
  int64_t batch;
  int seed;
  bool drop_remainder;
  bool loop;  // training: reshuffle forever; eval: single pass

  int64_t batches_per_epoch;
  int64_t total_batches;  // -1 if infinite

  std::vector<std::unique_ptr<Slot>> slots;
  std::atomic<int64_t> next_produce{0};
  std::atomic<int64_t> next_consume{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_producer, cv_consumer;

  // permutation cache per epoch (guarded by perm_mu)
  std::mutex perm_mu;
  int64_t perm_epoch = -1;
  std::vector<int64_t> perm;

  const std::vector<int64_t>& permutation_for(int64_t epoch) {
    std::lock_guard<std::mutex> lock(perm_mu);
    if (epoch != perm_epoch) {
      perm.resize(n);
      for (int64_t i = 0; i < n; ++i) perm[i] = i;
      std::mt19937_64 rng(static_cast<uint64_t>(seed) * 0x9E3779B97F4A7C15ULL +
                          static_cast<uint64_t>(epoch));
      for (int64_t i = n - 1; i > 0; --i) {
        int64_t j = static_cast<int64_t>(rng() % static_cast<uint64_t>(i + 1));
        std::swap(perm[i], perm[j]);
      }
      perm_epoch = epoch;
    }
    return perm;
  }

  void assemble(int64_t batch_idx, Slot& slot) {
    int64_t epoch = batch_idx / batches_per_epoch;
    int64_t within = batch_idx % batches_per_epoch;
    // Eval (single pass) is SEQUENTIAL: consumers tag row k of batch b with
    // global index b*batch+k for exact padding masks; shuffling only exists
    // for training epochs.
    const std::vector<int64_t>* p = loop ? &permutation_for(epoch) : nullptr;
    int64_t start = within * batch;
    for (int64_t k = 0; k < batch; ++k) {
      int64_t src_pos = start + k;
      // final partial batch (eval only): pad by wrapping to index 0
      int64_t src = src_pos < n ? (p ? (*p)[src_pos] : src_pos) : 0;
      std::memcpy(slot.images.data() + k * item_bytes, images + src * item_bytes,
                  static_cast<size_t>(item_bytes));
      slot.labels[static_cast<size_t>(k)] = labels ? labels[src] : 0;
    }
    slot.batch_index.store(batch_idx, std::memory_order_release);
    slot.ready.store(true, std::memory_order_release);
  }

  void worker() {
    const int64_t depth = static_cast<int64_t>(slots.size());
    while (!stop.load(std::memory_order_acquire)) {
      int64_t idx = next_produce.fetch_add(1);
      if (total_batches >= 0 && idx >= total_batches) break;
      Slot& slot = *slots[static_cast<size_t>(idx % depth)];
      // Wait until the consumer has drained the previous occupant of this
      // slot (consumer advances next_consume past idx - depth).
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_producer.wait(lock, [&] {
          return stop.load() || next_consume.load() + depth > idx;
        });
      }
      if (stop.load()) break;
      assemble(idx, slot);
      cv_consumer.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* sp_create(const uint8_t* images, int64_t n, int64_t item_bytes,
                const int32_t* labels, int64_t batch, int seed,
                int num_threads, int queue_depth, int drop_remainder,
                int loop, int64_t start_batch) {
  auto* p = new Pipeline();
  p->images = images;
  p->labels = labels;
  p->n = n;
  p->item_bytes = item_bytes;
  p->batch = batch;
  p->seed = seed;
  p->drop_remainder = drop_remainder != 0;
  p->loop = loop != 0;
  p->batches_per_epoch =
      p->drop_remainder ? n / batch : (n + batch - 1) / batch;
  p->total_batches = p->loop ? -1 : p->batches_per_epoch;
  // Resume (training): every batch is a pure function of its global index
  // (epoch permutation + offset), so continuing from step k is just
  // starting both cursors there — the exact sequence an uninterrupted run
  // would have produced.
  p->next_produce.store(start_batch);
  p->next_consume.store(start_batch);
  for (int q = 0; q < queue_depth; ++q) {
    auto s = std::make_unique<Slot>();
    s->images.resize(static_cast<size_t>(batch * item_bytes));
    s->labels.resize(static_cast<size_t>(batch));
    p->slots.push_back(std::move(s));
  }
  for (int t = 0; t < num_threads; ++t)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

int64_t sp_next(void* handle, uint8_t* out_images, int32_t* out_labels) {
  auto* p = static_cast<Pipeline*>(handle);
  int64_t idx = p->next_consume.load();
  if (p->total_batches >= 0 && idx >= p->total_batches) return -1;
  Slot& slot = *p->slots[static_cast<size_t>(idx % p->slots.size())];
  // Spin-then-wait for the slot to hold OUR batch.
  while (!(slot.ready.load(std::memory_order_acquire) &&
           slot.batch_index.load(std::memory_order_acquire) == idx)) {
    std::unique_lock<std::mutex> lock(p->mu);
    p->cv_consumer.wait_for(lock, std::chrono::milliseconds(1));
    if (p->stop.load()) return -1;
  }
  std::memcpy(out_images, slot.images.data(), slot.images.size());
  std::memcpy(out_labels, slot.labels.data(),
              slot.labels.size() * sizeof(int32_t));
  slot.ready.store(false, std::memory_order_release);
  p->next_consume.fetch_add(1);
  p->cv_producer.notify_all();
  return idx;
}

void sp_destroy(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  p->stop.store(true);
  p->cv_producer.notify_all();
  p->cv_consumer.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
