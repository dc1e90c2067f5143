// Zero-copy, parallel safetensors reader (C++).
//
// Host-side native loader for HF checkpoints: mmaps the shard, and on demand
// faults pages in with a thread pool so the first-touch cost of multi-GB
// shards is spread over all cores (a plain np.memmap walk is single-threaded
// page-fault bound).  The Python side parses the tiny JSON header and calls
// `kvcf_st_read` per tensor with the byte range; data lands in a caller-
// provided buffer (one memcpy — the device upload dominates anyway, this just
// keeps the host from being the bottleneck).
//
// Build: make -C csrc (produces libkvcf_st.so).

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct MappedFile {
  int fd = -1;
  uint8_t* data = nullptr;
  size_t size = 0;
};

}  // namespace

extern "C" {

// Map a file read-only. Returns handle or nullptr.
void* kvcf_st_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(p, st.st_size, MADV_SEQUENTIAL);
  auto* mf = new MappedFile;
  mf->fd = fd;
  mf->data = static_cast<uint8_t*>(p);
  mf->size = st.st_size;
  return mf;
}

void kvcf_st_close(void* h) {
  auto* mf = static_cast<MappedFile*>(h);
  if (!mf) return;
  munmap(mf->data, mf->size);
  ::close(mf->fd);
  delete mf;
}

int64_t kvcf_st_size(void* h) {
  return static_cast<int64_t>(static_cast<MappedFile*>(h)->size);
}

// Copy [offset, offset+len) into dst using `threads` workers.
// Returns 0 on success, -1 on range error.
int32_t kvcf_st_read(void* h, uint64_t offset, uint64_t len, void* dst,
                     int32_t threads) {
  auto* mf = static_cast<MappedFile*>(h);
  // Overflow-safe bounds check: offsets come from the file's UNTRUSTED JSON
  // header; `offset + len` can wrap uint64 and slip past a naive check.
  if (offset > mf->size || len > mf->size - offset) return -1;
  const uint8_t* src = mf->data + offset;
  if (threads <= 1 || len < (8u << 20)) {
    std::memcpy(dst, src, len);
    return 0;
  }
  const uint64_t chunk = (len + threads - 1) / threads;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t) {
    uint64_t begin = static_cast<uint64_t>(t) * chunk;
    if (begin >= len) break;
    uint64_t n = std::min(chunk, len - begin);
    pool.emplace_back([src, dst, begin, n] {
      std::memcpy(static_cast<uint8_t*>(dst) + begin, src + begin, n);
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

// Raw pointer into the mapping (zero-copy path for numpy frombuffer).
const void* kvcf_st_ptr(void* h, uint64_t offset) {
  auto* mf = static_cast<MappedFile*>(h);
  if (offset >= mf->size) return nullptr;
  return mf->data + offset;
}

}  // extern "C"
