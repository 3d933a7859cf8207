// Threaded npz/npy feature loader — native data-path runtime.
//
// The training pipeline reads thousands of small .npz feature files
// (one 1024-float "state" vector each, written by
// scripts/data_preparation.py). Doing that through Python's zipfile +
// np.load costs ~100 µs of interpreter overhead per file and serializes
// on the GIL; this loader parses the zip container and inflates entries
// in a C++ thread pool, filling one preallocated float32 batch buffer.
//
// Exposed C ABI (ctypes, see instructany2pix_tpu/train/native_loader.py):
//   int ia2p_load_features(const char** paths, int n_paths,
//                          const char* entry_name,
//                          float* out, long long out_stride,
//                          int n_threads);
// Returns 0 on success; on per-file failure the row is zero-filled and
// the return value is the number of failed files (training treats
// missing media as zero embeddings, reference train.py:403-404).
//
// Build: make -C native   (produces libia2p_loader.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <zlib.h>

namespace {

struct Buf {
  std::vector<unsigned char> data;
};

constexpr long kMaxFeatureFile = 1LL << 31;  // 2 GB sanity cap

bool read_file(const char* path, Buf* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  // directories/specials report absurd sizes; cap before allocating
  if (n < 0 || n > kMaxFeatureFile) { std::fclose(f); return false; }
  out->data.resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data.data(), 1, out->data.size(), f);
  std::fclose(f);
  return got == out->data.size();
}

uint16_t rd16(const unsigned char* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const unsigned char* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

// Parse an .npy payload: header declares dtype/shape; we require
// little-endian float32 ('<f4') and copy up to max_floats values.
bool parse_npy(const unsigned char* p, size_t n, float* out,
               long long max_floats) {
  if (n < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
  size_t hlen;
  size_t off;
  if (p[6] == 1) {
    hlen = rd16(p + 8);
    off = 10;
  } else {
    hlen = rd32(p + 8);
    off = 12;
  }
  if (off + hlen > n) return false;
  std::string header(reinterpret_cast<const char*>(p + off), hlen);
  if (header.find("'<f4'") == std::string::npos &&
      header.find("'|f4'") == std::string::npos)
    return false;
  if (header.find("'fortran_order': True") != std::string::npos) return false;
  size_t data_off = off + hlen;
  size_t avail = (n - data_off) / sizeof(float);
  size_t count = avail < static_cast<size_t>(max_floats)
                     ? avail
                     : static_cast<size_t>(max_floats);
  std::memcpy(out, p + data_off, count * sizeof(float));
  return true;
}

// Find a zip entry by suffix match on the name ("state.npy"), inflate
// if deflated, then parse as npy. Scans local file headers directly —
// robust to missing central directories in streamed writers.
bool load_npz_entry(const Buf& buf, const char* entry, float* out,
                    long long max_floats) {
  const unsigned char* p = buf.data.data();
  size_t n = buf.data.size();
  std::string want = std::string(entry) + ".npy";
  size_t pos = 0;
  while (pos + 30 <= n) {
    if (rd32(p + pos) != 0x04034b50) break;  // local file header magic
    uint16_t method = rd16(p + pos + 8);
    uint64_t csize = rd32(p + pos + 18);
    uint64_t usize = rd32(p + pos + 22);
    uint16_t name_len = rd16(p + pos + 26);
    uint16_t extra_len = rd16(p + pos + 28);
    if (pos + 30 + name_len + extra_len > n) return false;
    std::string name(reinterpret_cast<const char*>(p + pos + 30), name_len);
    // ZIP64 (numpy's zipfile writes 0xFFFFFFFF sentinels with real
    // sizes in extra field id 0x0001: uncompressed then compressed)
    if (csize == 0xFFFFFFFFull || usize == 0xFFFFFFFFull) {
      const unsigned char* ex = p + pos + 30 + name_len;
      size_t eoff = 0;
      while (eoff + 4 <= extra_len) {
        uint16_t id = rd16(ex + eoff);
        uint16_t sz = rd16(ex + eoff + 2);
        if (id == 0x0001 && sz >= 16) {
          uint64_t u = 0, c = 0;
          std::memcpy(&u, ex + eoff + 4, 8);
          std::memcpy(&c, ex + eoff + 12, 8);
          usize = u;
          csize = c;
          break;
        }
        eoff += 4 + sz;
      }
    }
    size_t data_off = pos + 30 + name_len + extra_len;
    if (data_off + csize > n) return false;
    bool match = name == want ||
                 (name.size() >= want.size() &&
                  name.compare(name.size() - want.size(), want.size(), want) == 0);
    if (match) {
      if (method == 0) {  // stored
        return parse_npy(p + data_off, csize, out, max_floats);
      }
      if (method == 8) {  // deflate
        std::vector<unsigned char> raw(static_cast<size_t>(usize));
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
        zs.next_in = const_cast<unsigned char*>(p + data_off);
        zs.avail_in = static_cast<uInt>(csize);
        zs.next_out = raw.data();
        zs.avail_out = static_cast<uInt>(usize);
        int rc = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (rc != Z_STREAM_END && rc != Z_OK) return false;
        return parse_npy(raw.data(), usize - zs.avail_out, out, max_floats);
      }
      return false;
    }
    pos = data_off + csize;
  }
  return false;
}

}  // namespace

extern "C" int ia2p_load_features(const char** paths, int n_paths,
                                  const char* entry_name, float* out,
                                  long long out_stride, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_paths) return;
      float* row = out + static_cast<long long>(i) * out_stride;
      std::memset(row, 0, sizeof(float) * out_stride);
      bool ok = false;
      try {
        Buf buf;
        ok = read_file(paths[i], &buf);
        if (ok) {
          size_t len = std::strlen(paths[i]);
          if (len >= 4 && std::strcmp(paths[i] + len - 4, ".npy") == 0) {
            ok = parse_npy(buf.data.data(), buf.data.size(), row, out_stride);
          } else {
            ok = load_npz_entry(buf, entry_name, row, out_stride);
          }
        }
      } catch (...) {  // corrupt container must never kill the host
        ok = false;
        std::memset(row, 0, sizeof(float) * out_stride);
      }
      if (!ok) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  int nt = n_threads < n_paths ? n_threads : n_paths;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}
