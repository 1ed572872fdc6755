// Native client-side cryptography core.
//
// The reference's client path is native Rust (tfhe-rs core_crypto +
// AVX-512); the TPU framework's server path is JAX/XLA, and this library is
// the native equivalent of the *client* runtime: deterministic ChaCha20-based
// CSPRNG, gaussian noise sampling, LWE encrypt/decrypt, and exact negacyclic
// polynomial arithmetic over Z_2^64 — usable without Python in deployment and
// cross-validated against the numpy client in tests (tests/test_native.py).
//
// Exposed as a C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// ---------------- ChaCha20 block function (RFC 7539) ----------------

inline uint32_t rotl32(uint32_t x, int n) { return (x << n) | (x >> (32 - n)); }

void chacha20_block(const uint32_t key[8], uint64_t counter,
                    const uint32_t nonce[2], uint32_t out[16]) {
  uint32_t s[16] = {0x61707865u, 0x3320646eu, 0x79622d32u, 0x6b206574u,
                    key[0], key[1], key[2], key[3],
                    key[4], key[5], key[6], key[7],
                    static_cast<uint32_t>(counter),
                    static_cast<uint32_t>(counter >> 32),
                    nonce[0], nonce[1]};
  uint32_t w[16];
  std::memcpy(w, s, sizeof(w));
  auto qr = [&](int a, int b, int c, int d) {
    w[a] += w[b]; w[d] ^= w[a]; w[d] = rotl32(w[d], 16);
    w[c] += w[d]; w[b] ^= w[c]; w[b] = rotl32(w[b], 12);
    w[a] += w[b]; w[d] ^= w[a]; w[d] = rotl32(w[d], 8);
    w[c] += w[d]; w[b] ^= w[c]; w[b] = rotl32(w[b], 7);
  };
  for (int i = 0; i < 10; ++i) {
    qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15);
    qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14);
  }
  for (int i = 0; i < 16; ++i) out[i] = w[i] + s[i];
}

struct Rng {
  uint32_t key[8];
  uint32_t nonce[2];
  uint64_t counter = 0;
  uint32_t buf[16];
  int pos = 16;

  explicit Rng(uint64_t seed) {
    for (int i = 0; i < 8; ++i) key[i] = static_cast<uint32_t>(seed >> (8 * (i % 8))) ^ (0x9e3779b9u * (i + 1));
    nonce[0] = 0x6b637472u; nonce[1] = static_cast<uint32_t>(seed >> 32);
  }

  uint32_t next_u32() {
    if (pos == 16) { chacha20_block(key, counter++, nonce, buf); pos = 0; }
    return buf[pos++];
  }
  uint64_t next_u64() {
    uint64_t lo = next_u32();
    return lo | (static_cast<uint64_t>(next_u32()) << 32);
  }
  // standard normal via Box-Muller
  double next_gaussian() {
    double u1 = (next_u64() >> 11) * 0x1.0p-53 + 0x1.0p-54;
    double u2 = (next_u64() >> 11) * 0x1.0p-53;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
  }
};

}  // namespace

extern "C" {

// Opaque RNG lifecycle
void* tfhe_rng_new(uint64_t seed) { return new Rng(seed); }
void tfhe_rng_free(void* rng) { delete static_cast<Rng*>(rng); }

void tfhe_rng_fill_u64(void* rng, uint64_t* out, int64_t count) {
  Rng* r = static_cast<Rng*>(rng);
  for (int64_t i = 0; i < count; ++i) out[i] = r->next_u64();
}

// Rounded-gaussian noise in integer (2^64-scaled) units.
void tfhe_rng_fill_gaussian(void* rng, uint64_t* out, int64_t count,
                            double std_torus) {
  Rng* r = static_cast<Rng*>(rng);
  const double scale = std_torus * 18446744073709551616.0;  // 2^64
  for (int64_t i = 0; i < count; ++i) {
    double g = r->next_gaussian() * scale;
    out[i] = static_cast<uint64_t>(static_cast<int64_t>(std::llrint(g)));
  }
}

// LWE encryption: for each of `count` messages, draw mask uniform, noise
// gaussian; ct layout [count, n+1].
void tfhe_lwe_encrypt(void* rng, const uint64_t* sk, int64_t n,
                      const uint64_t* msgs, int64_t count, double std_torus,
                      uint64_t* out) {
  Rng* r = static_cast<Rng*>(rng);
  const double scale = std_torus * 18446744073709551616.0;
  for (int64_t c = 0; c < count; ++c) {
    uint64_t* ct = out + c * (n + 1);
    uint64_t body = msgs[c];
    for (int64_t i = 0; i < n; ++i) {
      ct[i] = r->next_u64();
      body += ct[i] * sk[i];
    }
    double g = r->next_gaussian() * scale;
    body += static_cast<uint64_t>(static_cast<int64_t>(std::llrint(g)));
    ct[n] = body;
  }
}

// LWE phase: msgs[c] = b - <a, s>
void tfhe_lwe_decrypt_phase(const uint64_t* sk, int64_t n, const uint64_t* cts,
                            int64_t count, uint64_t* out) {
  for (int64_t c = 0; c < count; ++c) {
    const uint64_t* ct = cts + c * (n + 1);
    uint64_t acc = ct[n];
    for (int64_t i = 0; i < n; ++i) acc -= ct[i] * sk[i];
    out[c] = acc;
  }
}

// Exact negacyclic polynomial product in Z_2^64[X]/(X^N+1), schoolbook.
void tfhe_negacyclic_mul(const uint64_t* a, const uint64_t* b, int64_t n,
                         uint64_t* out) {
  for (int64_t m = 0; m < n; ++m) out[m] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t ai = a[i];
    if (!ai) continue;
    for (int64_t j = 0; j < n; ++j) {
      int64_t m = i + j;
      uint64_t v = ai * b[j];
      if (m >= n) out[m - n] -= v;
      else out[m] += v;
    }
  }
}

// Balanced signed gadget decomposition; digits int32 [count, levels],
// most significant level first (matches ops/decomposition.py).
void tfhe_decompose(const uint64_t* xs, int64_t count, int base_log,
                    int levels, int32_t* out) {
  const int total = base_log * levels;
  const int shift = 64 - total;
  const uint64_t half = 1ull << (base_log - 1);
  const uint64_t mask = (1ull << base_log) - 1;
  uint64_t offset = 0;
  for (int l = 0; l < levels; ++l) offset += half << (base_log * l);
  for (int64_t c = 0; c < count; ++c) {
    uint64_t r = xs[c];
    if (shift > 0) r = (r + (1ull << (shift - 1))) >> shift;
    uint64_t y = r + offset;
    for (int l = 0; l < levels; ++l) {
      int pos = base_log * (levels - 1 - l);
      out[c * levels + l] =
          static_cast<int32_t>(((y >> pos) & mask)) - static_cast<int32_t>(half);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Threaded deterministic fills: ChaCha20 is a counter-mode keystream, so
// out[i] is a pure function of (key, nonce, base_counter + i/lane_count) —
// any thread count produces the same stream. Used for the large evaluation-
// key mask/noise tensors in keygen (numpy's bounded u64 path measured
// ~12 MB/s; this fills at ~memory speed on all cores).

#include <thread>
#include <vector>

extern "C" {

void tfhe_rng_fill_u64_par(void* rng, uint64_t* out, int64_t count) {
  Rng* r = static_cast<Rng*>(rng);
  const uint64_t base = r->counter;
  const int64_t nblocks = (count + 7) / 8;   // 8 u64 lanes per 64B block
  r->counter += static_cast<uint64_t>(nblocks);
  r->pos = 16;  // invalidate the sequential buffer
  // pre-touch destination pages single-threaded (cheap with plain 4KB
  // pages; see the MADV_HUGEPAGE note in tfhe_aes2_tpu/__init__.py for why
  // fresh numpy buffers used to fault in at ~500us/page)
  for (int64_t i = 0; i < count; i += 512) out[i] = 0;
  if (count) out[count - 1] = 0;
  unsigned nt = std::thread::hardware_concurrency();
  if (nt == 0) nt = 1;
  if (nt > 16) nt = 16;
  auto work = [&](int64_t b0, int64_t b1) {
    uint32_t buf[16];
    for (int64_t b = b0; b < b1; ++b) {
      chacha20_block(r->key, base + static_cast<uint64_t>(b), r->nonce, buf);
      const int64_t i0 = b * 8;
      const int64_t lim = (count - i0 < 8) ? (count - i0) : 8;
      for (int64_t l = 0; l < lim; ++l)
        out[i0 + l] = static_cast<uint64_t>(buf[2 * l]) |
                      (static_cast<uint64_t>(buf[2 * l + 1]) << 32);
    }
  };
  if (nt == 1 || nblocks < 64) { work(0, nblocks); return; }
  std::vector<std::thread> ts;
  const int64_t per = (nblocks + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int64_t b0 = static_cast<int64_t>(t) * per;
    int64_t b1 = b0 + per < nblocks ? b0 + per : nblocks;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& th : ts) th.join();
}

// Rounded-gaussian fill, threaded: 4 Box-Muller gaussians per block (each
// consumes two u64 lanes), same counter-indexed determinism as above.
void tfhe_rng_fill_gaussian_par(void* rng, uint64_t* out, int64_t count,
                                double std_torus) {
  Rng* r = static_cast<Rng*>(rng);
  const uint64_t base = r->counter;
  const int64_t nblocks = (count + 3) / 4;
  r->counter += static_cast<uint64_t>(nblocks);
  r->pos = 16;
  // pre-touch destination pages single-threaded (cheap with plain 4KB
  // pages; see the MADV_HUGEPAGE note in tfhe_aes2_tpu/__init__.py for why
  // fresh numpy buffers used to fault in at ~500us/page)
  for (int64_t i = 0; i < count; i += 512) out[i] = 0;
  if (count) out[count - 1] = 0;
  const double scale = std_torus * 18446744073709551616.0;  // 2^64
  unsigned nt = std::thread::hardware_concurrency();
  if (nt == 0) nt = 1;
  if (nt > 16) nt = 16;
  auto work = [&](int64_t b0, int64_t b1) {
    uint32_t buf[16];
    for (int64_t b = b0; b < b1; ++b) {
      chacha20_block(r->key, base + static_cast<uint64_t>(b), r->nonce, buf);
      const int64_t i0 = b * 4;
      const int64_t lim = (count - i0 < 4) ? (count - i0) : 4;
      for (int64_t l = 0; l < lim; ++l) {
        const uint64_t w1 = static_cast<uint64_t>(buf[4 * l]) |
                            (static_cast<uint64_t>(buf[4 * l + 1]) << 32);
        const uint64_t w2 = static_cast<uint64_t>(buf[4 * l + 2]) |
                            (static_cast<uint64_t>(buf[4 * l + 3]) << 32);
        const double u1 = (w1 >> 11) * 0x1.0p-53 + 0x1.0p-54;
        const double u2 = (w2 >> 11) * 0x1.0p-53;
        const double g =
            std::sqrt(-2.0 * std::log(u1)) *
            std::cos(6.283185307179586 * u2) * scale;
        out[i0 + l] = static_cast<uint64_t>(
            static_cast<int64_t>(std::llrint(g)));
      }
    }
  };
  if (nt == 1 || nblocks < 64) { work(0, nblocks); return; }
  std::vector<std::thread> ts;
  const int64_t per = (nblocks + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int64_t b0 = static_cast<int64_t>(t) * per;
    int64_t b1 = b0 + per < nblocks ? b0 + per : nblocks;
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"
