// Native batch-assembly kernels for the LM data pipeline.
//
// The reference's host-side hot path is the mmap token-chunk reader +
// window gather (moe_pretrain_model/framework/dataset/text/
// chunked_setencepiece_lm_dataset.py __getitem__ + collate). Python-level
// per-window slicing costs an interpreter round trip per sample; this
// library assembles whole batches in one call (optionally multithreaded)
// over caller-provided mmap pointers, widening uint16 tokens to the int32
// the device expects.
//
// Build: g++ -O3 -march=native -shared -fPIC dataloader.cpp -o libdataloader.so
// (see competesmoe_tpu/data/native_loader.py, which builds on first use)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <atomic>

extern "C" {

// Gather `n` windows of `window` uint16 tokens starting at byte offsets
// windows[i]*window within `chunk`, widening to int32.
// out: [n, window] int32 (caller-allocated).
void gather_windows_u16(const uint16_t* chunk, const int64_t* window_ids,
                        int64_t n, int64_t window, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint16_t* src = chunk + window_ids[i] * window;
    int32_t* dst = out + i * window;
    for (int64_t j = 0; j < window; ++j) dst[j] = (int32_t)src[j];
  }
}

// Multi-chunk batch assembly: sample i reads window local_ids[i] from
// chunk chunk_ids[i]. chunks: array of base pointers; parallelized over
// samples with `n_threads` (0 -> hardware concurrency).
void assemble_batch_u16(const uint16_t** chunks, const int64_t* chunk_ids,
                        const int64_t* local_ids, int64_t n,
                        int64_t window, int32_t* out, int n_threads) {
  int hw = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (hw < 1) hw = 1;
  if (hw > n) hw = (int)n;
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      const uint16_t* src = chunks[chunk_ids[i]] + local_ids[i] * window;
      int32_t* dst = out + i * window;
      for (int64_t j = 0; j < window; ++j) dst[j] = (int32_t)src[j];
    }
  };
  if (hw == 1) {
    work();
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(hw);
  for (int t = 0; t < hw; ++t) ts.emplace_back(work);
  for (auto& t : ts) t.join();
}

// Right-pad variable-length int32 id lists into [n, max_len] plus an
// attention mask — the SupervisedCollator hot loop.
void pad_batch_i32(const int32_t** seqs, const int64_t* lens, int64_t n,
                   int64_t max_len, int32_t pad_id, int32_t* out_ids,
                   int32_t* out_mask) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t L = lens[i] < max_len ? lens[i] : max_len;
    int32_t* ids = out_ids + i * max_len;
    int32_t* mask = out_mask + i * max_len;
    std::memcpy(ids, seqs[i], L * sizeof(int32_t));
    for (int64_t j = 0; j < L; ++j) mask[j] = 1;
    for (int64_t j = L; j < max_len; ++j) { ids[j] = pad_id; mask[j] = 0; }
  }
}

int dataloader_abi_version() { return 1; }

}  // extern "C"
