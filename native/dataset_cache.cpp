// ccdm_io: memory-mapped dataset cache with threaded batch gather.
//
// Native data-loader runtime for ccdm_tpu (the TPU-native analog of the
// reference's host-side dataset handling; the reference's only native code
// is CUDA style_ops — this provides the framework's native IO layer for
// datasets that exceed HBM, e.g. UTKFace-192 with minority replication).
//
// File format (little-endian):
//   magic   u64  = 0xCCD17CACE
//   n       u64  number of samples
//   h,w,c   u64  image dims (uint8, NHWC)
//   ldim    u64  label dim (f32)
//   images  n*h*w*c bytes
//   labels  n*ldim f32
//
// Exposed C ABI (ctypes):
//   void* ccdm_cache_open(const char* path);
//   void  ccdm_cache_close(void* handle);
//   int   ccdm_cache_info(void* handle, uint64_t* out5);       // n,h,w,c,ldim
//   int   ccdm_cache_gather(void* h, const int64_t* idx, int64_t bs,
//                           uint8_t* out_images, float* out_labels,
//                           int hflip, uint64_t seed, int num_threads);
//   int   ccdm_cache_write(const char* path, const uint8_t* images,
//                          const float* labels, uint64_t n, uint64_t h,
//                          uint64_t w, uint64_t c, uint64_t ldim);
//
// Build: make -C native  (g++ -O3 -shared -fPIC -pthread)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <random>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0xCCD17CACEULL;

struct Header {
  uint64_t magic, n, h, w, c, ldim;
};

struct Cache {
  int fd = -1;
  size_t bytes = 0;
  const uint8_t* base = nullptr;
  Header hdr{};
  const uint8_t* images = nullptr;
  const float* labels = nullptr;
};

inline size_t img_bytes(const Header& h) { return h.h * h.w * h.c; }

}  // namespace

extern "C" {

void* ccdm_cache_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }
  auto* cache = new Cache();
  cache->fd = fd;
  cache->bytes = st.st_size;
  cache->base = static_cast<const uint8_t*>(base);
  std::memcpy(&cache->hdr, cache->base, sizeof(Header));
  if (cache->hdr.magic != kMagic) {
    munmap(base, st.st_size); ::close(fd); delete cache; return nullptr;
  }
  cache->images = cache->base + sizeof(Header);
  cache->labels = reinterpret_cast<const float*>(
      cache->images + cache->hdr.n * img_bytes(cache->hdr));
  // advise the kernel we will random-access the image region
  madvise(const_cast<uint8_t*>(cache->images),
          cache->hdr.n * img_bytes(cache->hdr), MADV_RANDOM);
  return cache;
}

void ccdm_cache_close(void* handle) {
  auto* cache = static_cast<Cache*>(handle);
  if (!cache) return;
  munmap(const_cast<uint8_t*>(cache->base), cache->bytes);
  ::close(cache->fd);
  delete cache;
}

int ccdm_cache_info(void* handle, uint64_t* out5) {
  auto* cache = static_cast<Cache*>(handle);
  if (!cache) return -1;
  out5[0] = cache->hdr.n;
  out5[1] = cache->hdr.h;
  out5[2] = cache->hdr.w;
  out5[3] = cache->hdr.c;
  out5[4] = cache->hdr.ldim;
  return 0;
}

int ccdm_cache_gather(void* handle, const int64_t* idx, int64_t bs,
                      uint8_t* out_images, float* out_labels, int hflip,
                      uint64_t seed, int num_threads) {
  auto* cache = static_cast<Cache*>(handle);
  if (!cache) return -1;
  const Header& hdr = cache->hdr;
  const size_t ib = img_bytes(hdr);
  const size_t row = hdr.w * hdr.c;
  if (num_threads <= 0)
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
  num_threads = std::max(1, std::min<int>(num_threads, bs));

  auto work = [&](int tid) {
    std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + tid);
    std::bernoulli_distribution flip(0.5);
    for (int64_t j = tid; j < bs; j += num_threads) {
      const int64_t i = idx[j];
      if (i < 0 || static_cast<uint64_t>(i) >= hdr.n) continue;
      const uint8_t* src = cache->images + i * ib;
      uint8_t* dst = out_images + j * ib;
      if (hflip && flip(rng)) {
        // horizontal flip: reverse pixel order within each row
        for (uint64_t y = 0; y < hdr.h; ++y) {
          const uint8_t* srow = src + y * row;
          uint8_t* drow = dst + y * row;
          for (uint64_t x = 0; x < hdr.w; ++x)
            std::memcpy(drow + x * hdr.c,
                        srow + (hdr.w - 1 - x) * hdr.c, hdr.c);
        }
      } else {
        std::memcpy(dst, src, ib);
      }
      std::memcpy(out_labels + j * hdr.ldim, cache->labels + i * hdr.ldim,
                  hdr.ldim * sizeof(float));
    }
  };

  if (num_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool;
    pool.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) pool.emplace_back(work, t);
    for (auto& th : pool) th.join();
  }
  return 0;
}

int ccdm_cache_write(const char* path, const uint8_t* images,
                     const float* labels, uint64_t n, uint64_t h, uint64_t w,
                     uint64_t c, uint64_t ldim) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  Header hdr{kMagic, n, h, w, c, ldim};
  int ok = std::fwrite(&hdr, sizeof(Header), 1, f) == 1 &&
           std::fwrite(images, 1, n * h * w * c, f) == n * h * w * c &&
           std::fwrite(labels, sizeof(float), n * ldim, f) == n * ldim;
  std::fclose(f);
  return ok ? 0 : -1;
}

}  // extern "C"
