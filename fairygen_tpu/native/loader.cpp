// Multithreaded checkpoint streamer — native replacement for the
// reference's DiskMap (animation/diffsynth/core/vram/disk_map.py):
// parallel pread of tensor extents from a safetensors file straight into
// caller-provided buffers, with optional in-flight bf16 -> f32 widening.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: fairygen_tpu/native/build.py (g++ -O3 -shared -fPIC -pthread).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Task {
  uint64_t offset;   // byte offset in file
  uint64_t nbytes;   // bytes to read
  uint8_t *dest;     // destination buffer
  int convert;       // 0 = raw copy, 1 = bf16 -> f32 widen
};

bool read_extent(int fd, const Task &t) {
  if (t.convert == 0) {
    uint64_t done = 0;
    while (done < t.nbytes) {
      ssize_t r = pread(fd, t.dest + done, t.nbytes - done,
                        (off_t)(t.offset + done));
      if (r <= 0) return false;
      done += (uint64_t)r;
    }
    return true;
  }
  // bf16 -> f32: stream through a stack chunk, widen by shifting into the
  // high half of each f32 word.
  constexpr size_t kChunk = 1 << 16;
  std::vector<uint16_t> buf(kChunk);
  uint64_t n = t.nbytes / 2;  // number of bf16 elements
  float *out = reinterpret_cast<float *>(t.dest);
  uint64_t done = 0;
  while (done < n) {
    size_t todo = (size_t)((n - done) < kChunk ? (n - done) : kChunk);
    uint64_t off = t.offset + done * 2;
    uint64_t bytes = (uint64_t)todo * 2, got = 0;
    while (got < bytes) {
      ssize_t r = pread(fd, reinterpret_cast<uint8_t *>(buf.data()) + got,
                        bytes - got, (off_t)(off + got));
      if (r <= 0) return false;
      got += (uint64_t)r;
    }
    for (size_t i = 0; i < todo; ++i) {
      uint32_t w = (uint32_t)buf[i] << 16;
      std::memcpy(&out[done + i], &w, 4);
    }
    done += todo;
  }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 on open failure, >0 = number of failed extents.
int fairygen_parallel_read(const char *path, int n_tasks,
                           const uint64_t *offsets, const uint64_t *nbytes,
                           uint8_t **dests, const int *converts,
                           int n_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  std::vector<Task> tasks(n_tasks);
  for (int i = 0; i < n_tasks; ++i)
    tasks[i] = Task{offsets[i], nbytes[i], dests[i], converts[i]};

  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_tasks) break;
      if (!read_extent(fd, tasks[i])) failures.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : 8;
  if (nt > n_tasks) nt = n_tasks;
  std::vector<std::thread> threads;
  for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto &t : threads) t.join();
  close(fd);
  return failures.load();
}

}  // extern "C"
