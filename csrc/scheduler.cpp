// Continuous-batching scheduler core (C++).
//
// The native runtime piece of the framework: request admission, decode-slot
// lifecycle, and prefill-bucket selection run in C++ behind a C ABI consumed
// from Python via ctypes.  The reference has no scheduler at all (batch size
// 1 everywhere, run_longbench.py:339); its only native code is the CUDA cache
// append (csrc/csrc/cuda_api.cu) whose TPU-side replacement is the Pallas
// decode kernel — this module is the host-side native counterpart mandated by
// the TPU build plan (SURVEY.md §2.3, §2.6).
//
// Model: a fixed pool of decode slots (the batched cache rows).  Requests
// enter a FIFO; whenever a slot is free the scheduler assigns the oldest
// request and reports which prefill bucket its prompt needs.  Slots finish on
// EOS/length and return to the free list.  All operations are O(log n) or
// O(1), thread-safe, and allocation-free on the hot path.
//
// Build: make -C csrc (produces libkvcf_sched.so).

#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
};

struct Slot {
  int64_t request_id = -1;
  int32_t generated = 0;
  int32_t max_new_tokens = 0;
  bool active = false;
};

struct Scheduler {
  std::mutex mu;
  std::deque<Request> queue;
  std::vector<Slot> slots;
  std::vector<int32_t> free_slots;
  std::vector<int32_t> buckets;  // sorted prefill buckets
  int64_t next_id = 1;
  int64_t completed = 0;

  explicit Scheduler(int32_t n_slots, const int32_t* bucket_arr, int32_t n_buckets)
      : slots(n_slots), buckets(bucket_arr, bucket_arr + n_buckets) {
    for (int32_t i = n_slots - 1; i >= 0; --i) free_slots.push_back(i);
  }

  int32_t bucket_for(int32_t n) const {
    for (int32_t b : buckets)
      if (n <= b) return b;
    return -1;  // prompt exceeds largest bucket
  }
};

}  // namespace

extern "C" {

// Create a scheduler with `n_slots` decode slots and the given sorted
// prefill buckets. Returns an opaque handle.
void* kvcf_sched_create(int32_t n_slots, const int32_t* buckets,
                        int32_t n_buckets) {
  return new Scheduler(n_slots, buckets, n_buckets);
}

void kvcf_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// Submit a request; returns its id (>0), or -1 if the prompt fits no bucket.
int64_t kvcf_sched_submit(void* h, int32_t prompt_len, int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->bucket_for(prompt_len) < 0) return -1;
  int64_t id = s->next_id++;
  s->queue.push_back(Request{id, prompt_len, max_new_tokens});
  return id;
}

// Try to admit the oldest queued request into a free slot.
// On success writes {slot, request_id, bucket, max_new_tokens} into `out`
// (int64[4]) and returns 1; returns 0 if no request or no free slot.
int32_t kvcf_sched_admit(void* h, int64_t* out) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->queue.empty() || s->free_slots.empty()) return 0;
  Request r = s->queue.front();
  s->queue.pop_front();
  int32_t slot = s->free_slots.back();
  s->free_slots.pop_back();
  Slot& sl = s->slots[slot];
  sl.request_id = r.id;
  sl.generated = 0;
  sl.max_new_tokens = r.max_new_tokens;
  sl.active = true;
  out[0] = slot;
  out[1] = r.id;
  out[2] = s->bucket_for(r.prompt_len);
  out[3] = r.max_new_tokens;
  return 1;
}

// Record one decode step for `slot`; `hit_eos` nonzero marks EOS.
// Returns 1 if the slot finished (freed), else 0.
int32_t kvcf_sched_step(void* h, int32_t slot, int32_t hit_eos) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  // Reject out-of-range slots: an invalid index here is caller error, and
  // unchecked s->slots[slot] is heap corruption.
  if (slot < 0 || static_cast<size_t>(slot) >= s->slots.size()) return 0;
  Slot& sl = s->slots[slot];
  if (!sl.active) return 0;
  sl.generated += 1;
  if (hit_eos || sl.generated >= sl.max_new_tokens) {
    sl.active = false;
    sl.request_id = -1;
    s->free_slots.push_back(slot);
    s->completed += 1;
    return 1;
  }
  return 0;
}

// Counters: [queued, active, free, completed] into int64[4].
void kvcf_sched_stats(void* h, int64_t* out) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int64_t active = 0;
  for (const auto& sl : s->slots) active += sl.active ? 1 : 0;
  out[0] = static_cast<int64_t>(s->queue.size());
  out[1] = active;
  out[2] = static_cast<int64_t>(s->free_slots.size());
  out[3] = s->completed;
}

}  // extern "C"
