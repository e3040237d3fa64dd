// trajlog: memory-mapped batched trajectory logger.
//
// The native data-path component of robosuite_tpu: the TPU rollout loop
// produces (batch, state_dim) states + (batch, action_dim) actions at kHz
// aggregate rates; this appends them to a preallocated mmap'd file with no
// Python-side copies or syscalls per step. The analog of the reference's
// DataCollectionWrapper .npz flushing (wrappers/data_collection_wrapper.py:
// 162-209) engineered for three orders of magnitude more throughput.
//
// File layout (little endian):
//   header (4096 bytes): magic "RTPULOG1", u64 batch, u64 state_dim,
//     u64 action_dim, u64 capacity_steps, u64 n_steps (updated on flush)
//   then capacity_steps records of:
//     f32 time[batch]
//     f32 states[batch * state_dim]
//     f32 actions[batch * action_dim]
//     f32 rewards[batch]
//
// C API (ctypes-friendly). Thread-compatible: one writer per handle.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'R', 'T', 'P', 'U', 'L', 'O', 'G', '1'};
constexpr uint64_t kHeaderBytes = 4096;

struct Header {
  char magic[8];
  uint64_t batch;
  uint64_t state_dim;
  uint64_t action_dim;
  uint64_t capacity_steps;
  uint64_t n_steps;
};

struct Log {
  int fd = -1;
  uint8_t* base = nullptr;
  uint64_t mapped_bytes = 0;
  Header* header = nullptr;
  uint64_t record_floats = 0;
};

uint64_t record_floats(const Header& h) {
  return h.batch * (1 + h.state_dim + h.action_dim + 1);
}

}  // namespace

extern "C" {

// Create (or truncate) a log file. Returns an opaque handle or null.
void* tl_create(const char* path, uint64_t batch, uint64_t state_dim,
                uint64_t action_dim, uint64_t capacity_steps) {
  int fd = ::open(path, O_RDWR | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return nullptr;

  Header h{};
  std::memcpy(h.magic, kMagic, 8);
  h.batch = batch;
  h.state_dim = state_dim;
  h.action_dim = action_dim;
  h.capacity_steps = capacity_steps;
  h.n_steps = 0;

  uint64_t rec = record_floats(h);
  uint64_t total = kHeaderBytes + capacity_steps * rec * sizeof(float);
  if (::ftruncate(fd, (off_t)total) != 0) {
    ::close(fd);
    return nullptr;
  }
  uint8_t* base = (uint8_t*)::mmap(nullptr, total, PROT_READ | PROT_WRITE,
                                   MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  std::memcpy(base, &h, sizeof(Header));

  Log* log = new Log();
  log->fd = fd;
  log->base = base;
  log->mapped_bytes = total;
  log->header = (Header*)base;
  log->record_floats = rec;
  return log;
}

// Open an existing log read-only (for the Python reader's metadata).
void* tl_open(const char* path) {
  int fd = ::open(path, O_RDWR);
  if (fd < 0) return nullptr;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  uint8_t* base = (uint8_t*)::mmap(nullptr, (size_t)st.st_size,
                                   PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  Header* h = (Header*)base;
  if (std::memcmp(h->magic, kMagic, 8) != 0) {
    ::munmap(base, (size_t)st.st_size);
    ::close(fd);
    return nullptr;
  }
  Log* log = new Log();
  log->fd = fd;
  log->base = base;
  log->mapped_bytes = (uint64_t)st.st_size;
  log->header = h;
  log->record_floats = record_floats(*h);
  return log;
}

// Append one batched step. Arrays are float32, C-contiguous.
// Returns the step index, or -1 when full / invalid.
int64_t tl_append(void* handle, const float* times, const float* states,
                  const float* actions, const float* rewards) {
  Log* log = (Log*)handle;
  if (!log) return -1;
  Header* h = log->header;
  if (h->n_steps >= h->capacity_steps) return -1;

  float* dst = (float*)(log->base + kHeaderBytes) +
               h->n_steps * log->record_floats;
  uint64_t b = h->batch;
  std::memcpy(dst, times, b * sizeof(float));
  dst += b;
  std::memcpy(dst, states, b * h->state_dim * sizeof(float));
  dst += b * h->state_dim;
  std::memcpy(dst, actions, b * h->action_dim * sizeof(float));
  dst += b * h->action_dim;
  std::memcpy(dst, rewards, b * sizeof(float));

  return (int64_t)h->n_steps++;
}

// Persist header + data (msync). Returns 0 on success.
int tl_flush(void* handle) {
  Log* log = (Log*)handle;
  if (!log) return -1;
  return ::msync(log->base, log->mapped_bytes, MS_ASYNC);
}

uint64_t tl_n_steps(void* handle) {
  Log* log = (Log*)handle;
  return log ? log->header->n_steps : 0;
}

void tl_meta(void* handle, uint64_t* out4) {
  Log* log = (Log*)handle;
  if (!log) return;
  out4[0] = log->header->batch;
  out4[1] = log->header->state_dim;
  out4[2] = log->header->action_dim;
  out4[3] = log->header->capacity_steps;
}

void tl_close(void* handle) {
  Log* log = (Log*)handle;
  if (!log) return;
  ::msync(log->base, log->mapped_bytes, MS_SYNC);
  ::munmap(log->base, log->mapped_bytes);
  ::close(log->fd);
  delete log;
}

}  // extern "C"
