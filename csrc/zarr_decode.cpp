// forest-tpu native host loader: parallel zarr chunk read + blosc decode.
//
// The reference feeds its accelerator with 46 Python DataLoader processes
// (SURVEY.md §2.9); forest-tpu's host path instead decodes chunks in native
// threads (SURVEY.md §8.4 -- "a small C++ decode+ring-buffer extension, the
// repo's only justified native component"). This library provides:
//
//   ftpu_decode_file   : read one blosc-compressed chunk file into dst
//   ftpu_decode_files  : decode N chunk files in parallel into one buffer
//                        at caller-provided offsets (a thread pool sized by
//                        `nthreads`; blosc's ctx API is thread-safe)
//
// libblosc is loaded at runtime via dlopen (the image ships libblosc.so.1
// without headers), so the build needs no blosc dev package.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libftpu_loader.so \
//            zarr_decode.cpp -ldl -pthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dlfcn.h>
#include <thread>
#include <vector>

namespace {

using blosc_decompress_ctx_t = int (*)(const void*, void*, size_t, int);
using blosc_cbuffer_sizes_t = void (*)(const void*, size_t*, size_t*,
                                       size_t*);

struct BloscApi {
  blosc_decompress_ctx_t decompress_ctx = nullptr;
  blosc_cbuffer_sizes_t cbuffer_sizes = nullptr;
  bool ok = false;
};

BloscApi& blosc() {
  static BloscApi api = [] {
    BloscApi a;
    void* h = dlopen("libblosc.so.1", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libblosc.so", RTLD_NOW | RTLD_GLOBAL);
    if (h) {
      a.decompress_ctx = reinterpret_cast<blosc_decompress_ctx_t>(
          dlsym(h, "blosc_decompress_ctx"));
      a.cbuffer_sizes = reinterpret_cast<blosc_cbuffer_sizes_t>(
          dlsym(h, "blosc_cbuffer_sizes"));
      a.ok = a.decompress_ctx && a.cbuffer_sizes;
    }
    return a;
  }();
  return api;
}

// Read a whole file; returns size or -1 (open/seek/short-read failure).
long read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, 0, SEEK_END) != 0) {
    std::fclose(f);
    return -1;
  }
  long n = std::ftell(f);
  if (n < 0 || std::fseek(f, 0, SEEK_SET) != 0) {
    std::fclose(f);
    return -1;  // non-seekable / ftell failure: never resize(SIZE_MAX)
  }
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n) ? n : -1;
}

constexpr long kBloscMinHeader = 16;

}  // namespace

extern "C" {

// Decode one chunk file. mode: 0 = blosc, 1 = raw copy.
// Returns decompressed byte count, or negative error code:
//   -1 read failure, -2 blosc unavailable, -3 decompress failure,
//   -4 dst too small.
long ftpu_decode_file(const char* path, void* dst, size_t dst_cap,
                      int mode) {
  try {
    std::vector<uint8_t> raw;
    long n = read_file(path, raw);
    if (n < 0) return -1;
    if (mode == 1) {
      if (static_cast<size_t>(n) > dst_cap) return -4;
      std::memcpy(dst, raw.data(), static_cast<size_t>(n));
      return n;
    }
    // Truncated/empty files must not reach blosc_cbuffer_sizes: it reads
    // a 16-byte header unconditionally (out-of-bounds read -> SIGSEGV).
    if (n < kBloscMinHeader) return -5;
    auto& api = blosc();
    if (!api.ok) return -2;
    size_t nbytes = 0, cbytes = 0, blocksize = 0;
    api.cbuffer_sizes(raw.data(), &nbytes, &cbytes, &blocksize);
    if (nbytes > dst_cap) return -4;
    if (cbytes > static_cast<size_t>(n)) return -5;  // header lies
    int rc = api.decompress_ctx(raw.data(), dst, nbytes, 1);
    if (rc <= 0) return -3;
    return rc;
  } catch (...) {
    // Exceptions must never cross the extern "C"/thread boundary
    // (std::terminate would abort the whole Python process).
    return -6;
  }
}

// Decode n chunk files in parallel. `paths` are NUL-terminated strings;
// chunk i is written at dst + offsets[i] with capacity caps[i]. `results[i]`
// receives the per-chunk return code (as ftpu_decode_file: byte count, or
// -1 read failure / absent file, -2 blosc unavailable, -3 decompress
// failure, -4 dst too small, -5 truncated or lying blosc header, -6 caught
// C++ exception). Absent files leave their buffer region untouched (the
// caller pre-fills with the fill value).
// Returns the number of successfully decoded chunks.
long ftpu_decode_files(const char** paths, long n, uint8_t* dst,
                       const size_t* offsets, const size_t* caps,
                       long* results, int mode, int nthreads) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<long> next(0);
  std::atomic<long> ok_count(0);

  auto worker = [&] {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n) break;
      long rc = ftpu_decode_file(paths[i], dst + offsets[i], caps[i], mode);
      results[i] = rc;
      if (rc >= 0) ok_count.fetch_add(1);
    }
  };

  if (nthreads == 1 || n <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    try {
      int t = static_cast<int>(n < nthreads ? n : nthreads);
      pool.reserve(static_cast<size_t>(t));
      for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    } catch (...) {
      // Thread/allocation exhaustion (e.g. pthread_create EAGAIN under
      // many concurrent loaders) must not unwind through the extern "C"
      // boundary or destroy a joinable thread -- both std::terminate the
      // whole Python process. The shared atomic cursor makes finishing
      // the remaining chunks inline safe: each index is decoded exactly
      // once regardless of how many pool threads actually started.
      worker();
    }
    for (auto& th : pool) th.join();
  }
  return ok_count.load();
}

int ftpu_loader_version() { return 2; }

}  // extern "C"
