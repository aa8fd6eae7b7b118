// slideo-tpu native runtime components (C++17, no external deps).
//
// The reference implements its runtime in Rust on top of native OpenCV C++;
// the TPU build keeps the device compute in XLA/Pallas and provides native
// host-side components here:
//
//   * sha256_file: streaming SHA-256 content hashing — the file-identity
//     hot path (reference: crates/app/src/utils.rs:28-33, rayon-parallel at
//     main.rs:163-175). Exposed via ctypes; used by slideo_tpu.app.hashing.
//
//   * hamming_knn: exact multi-threaded brute-force k-nearest-neighbours
//     over packed 256-bit binary descriptors (XOR + popcount). This is the
//     CPU fallback/oracle for the device Hamming matcher
//     (slideo_tpu/ops/hamming.py) — the same role the reference's
//     FLANN-LSH C++ engine plays (crates/matching-opencv/src/flann.rs).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        slideo_native.cpp -o libslideo_native.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// SHA-256 (FIPS 180-4), streaming.
// ---------------------------------------------------------------------------

namespace sha256 {

static const uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

struct Ctx {
  uint32_t h[8];
  uint64_t len = 0;
  uint8_t buf[64];
  size_t buf_len = 0;
  Ctx() {
    static const uint32_t init[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                     0xa54ff53a, 0x510e527f, 0x9b05688c,
                                     0x1f83d9ab, 0x5be0cd19};
    std::memcpy(h, init, sizeof(h));
  }
};

static inline uint32_t rotr(uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

static void compress(Ctx &c, const uint8_t *p) {
  uint32_t w[64];
  for (int i = 0; i < 16; i++)
    w[i] = (uint32_t(p[4 * i]) << 24) | (uint32_t(p[4 * i + 1]) << 16) |
           (uint32_t(p[4 * i + 2]) << 8) | uint32_t(p[4 * i + 3]);
  for (int i = 16; i < 64; i++) {
    uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
    uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
    w[i] = w[i - 16] + s0 + w[i - 7] + s1;
  }
  uint32_t a = c.h[0], b = c.h[1], cc = c.h[2], d = c.h[3], e = c.h[4],
           f = c.h[5], g = c.h[6], hh = c.h[7];
  for (int i = 0; i < 64; i++) {
    uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
    uint32_t ch = (e & f) ^ (~e & g);
    uint32_t t1 = hh + S1 + ch + K[i] + w[i];
    uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
    uint32_t maj = (a & b) ^ (a & cc) ^ (b & cc);
    uint32_t t2 = S0 + maj;
    hh = g; g = f; f = e; e = d + t1;
    d = cc; cc = b; b = a; a = t1 + t2;
  }
  c.h[0] += a; c.h[1] += b; c.h[2] += cc; c.h[3] += d;
  c.h[4] += e; c.h[5] += f; c.h[6] += g; c.h[7] += hh;
}

static void update(Ctx &c, const uint8_t *data, size_t n) {
  c.len += n;
  while (n > 0) {
    if (c.buf_len == 0 && n >= 64) {
      compress(c, data);
      data += 64;
      n -= 64;
    } else {
      size_t take = 64 - c.buf_len;
      if (take > n) take = n;
      std::memcpy(c.buf + c.buf_len, data, take);
      c.buf_len += take;
      data += take;
      n -= take;
      if (c.buf_len == 64) {
        compress(c, c.buf);
        c.buf_len = 0;
      }
    }
  }
}

static void final(Ctx &c, uint8_t out[32]) {
  uint64_t bitlen = c.len * 8;
  uint8_t pad = 0x80;
  update(c, &pad, 1);
  uint8_t zero = 0;
  while (c.buf_len != 56) update(c, &zero, 1);
  uint8_t lenb[8];
  for (int i = 0; i < 8; i++) lenb[i] = uint8_t(bitlen >> (56 - 8 * i));
  update(c, lenb, 8);
  for (int i = 0; i < 8; i++) {
    out[4 * i] = uint8_t(c.h[i] >> 24);
    out[4 * i + 1] = uint8_t(c.h[i] >> 16);
    out[4 * i + 2] = uint8_t(c.h[i] >> 8);
    out[4 * i + 3] = uint8_t(c.h[i]);
  }
}

}  // namespace sha256

extern "C" {

// Hash a file's contents; writes 64 lowercase hex chars + NUL into out_hex
// (>= 65 bytes). Returns 0 on success, -1 on IO error.
int slideo_sha256_file(const char *path, char *out_hex) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return -1;
  sha256::Ctx ctx;
  std::vector<uint8_t> buf(1 << 20);
  size_t n;
  while ((n = std::fread(buf.data(), 1, buf.size(), f)) > 0)
    sha256::update(ctx, buf.data(), n);
  bool err = std::ferror(f);
  std::fclose(f);
  if (err) return -1;
  uint8_t digest[32];
  sha256::final(ctx, digest);
  static const char *hex = "0123456789abcdef";
  for (int i = 0; i < 32; i++) {
    out_hex[2 * i] = hex[digest[i] >> 4];
    out_hex[2 * i + 1] = hex[digest[i] & 0xf];
  }
  out_hex[64] = 0;
  return 0;
}

// Exact brute-force Hamming kNN over packed binary descriptors.
//   query:  [n_query, words] uint64 (packed bits)
//   index:  [n_index, words] uint64
//   out_dist: [n_query, k] int32  (unfilled slots get INT32_MAX)
//   out_idx:  [n_query, k] int32  (unfilled slots get -1)
// Multi-threaded over queries. Ties broken by lower index id (stable).
void slideo_hamming_knn(const uint64_t *query, int64_t n_query,
                        const uint64_t *index, int64_t n_index, int64_t words,
                        int64_t k, int32_t *out_dist, int32_t *out_idx,
                        int64_t n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    // Simple insertion top-k per query: k is small (<=30).
    std::vector<int32_t> dists(k), ids(k);
    for (;;) {
      int64_t q = next.fetch_add(1);
      if (q >= n_query) return;
      for (int64_t i = 0; i < k; i++) {
        dists[i] = INT32_MAX;
        ids[i] = -1;
      }
      const uint64_t *qp = query + q * words;
      for (int64_t i = 0; i < n_index; i++) {
        const uint64_t *ip = index + i * words;
        int32_t d = 0;
        for (int64_t w = 0; w < words; w++)
          d += __builtin_popcountll(qp[w] ^ ip[w]);
        if (d < dists[k - 1]) {
          int64_t pos = k - 1;
          while (pos > 0 && dists[pos - 1] > d) {
            dists[pos] = dists[pos - 1];
            ids[pos] = ids[pos - 1];
            pos--;
          }
          dists[pos] = d;
          ids[pos] = int32_t(i);
        }
      }
      std::memcpy(out_dist + q * k, dists.data(), k * sizeof(int32_t));
      std::memcpy(out_idx + q * k, ids.data(), k * sizeof(int32_t));
    }
  };
  std::vector<std::thread> pool;
  for (int64_t t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto &t : pool) t.join();
}

}  // extern "C"
