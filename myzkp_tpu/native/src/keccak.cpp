// Native SHA3-256 + batch Merkle-tree builder.
//
// The reference hashes Merkle nodes one call at a time through Rust sha3
// (myzkp/src/modules/algebra/merkle.rs:8-25); our Python mirror pays a
// hashlib round-trip per node.  For FRI/STARK codewords (2^14+ leaves per
// commitment) the per-call overhead dominates, so the whole tree build
// moves into one native call: level-by-level SHA3-256 over contiguous
// buffers.

#include <cstdint>
#include <cstring>

namespace {

const uint64_t RC[24] = {
    0x0000000000000001ull, 0x0000000000008082ull, 0x800000000000808aull,
    0x8000000080008000ull, 0x000000000000808bull, 0x0000000080000001ull,
    0x8000000080008081ull, 0x8000000000008009ull, 0x000000000000008aull,
    0x0000000000000088ull, 0x0000000080008009ull, 0x000000008000000aull,
    0x000000008000808bull, 0x800000000000008bull, 0x8000000000008089ull,
    0x8000000000008003ull, 0x8000000000008002ull, 0x8000000000000080ull,
    0x000000000000800aull, 0x800000008000000aull, 0x8000000080008081ull,
    0x8000000000008080ull, 0x0000000080000001ull, 0x8000000080008008ull};

inline uint64_t rotl(uint64_t x, int s) { return (x << s) | (x >> (64 - s)); }

void keccakf(uint64_t st[25]) {
  for (int round = 0; round < 24; ++round) {
    uint64_t bc[5];
    for (int i = 0; i < 5; ++i)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; ++i) {
      uint64_t t = bc[(i + 4) % 5] ^ rotl(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    uint64_t t = st[1];
    static const int piln[24] = {10, 7,  11, 17, 18, 3,  5,  16,
                                 8,  21, 24, 4,  15, 23, 19, 13,
                                 12, 2,  20, 14, 22, 9,  6,  1};
    static const int rotc[24] = {1,  3,  6,  10, 15, 21, 28, 36,
                                 45, 55, 2,  14, 27, 41, 56, 8,
                                 25, 43, 62, 18, 39, 61, 20, 44};
    for (int i = 0; i < 24; ++i) {
      int j = piln[i];
      uint64_t tmp = st[j];
      st[j] = rotl(t, rotc[i]);
      t = tmp;
    }
    // chi
    for (int j = 0; j < 25; j += 5) {
      uint64_t row[5];
      for (int i = 0; i < 5; ++i) row[i] = st[j + i];
      for (int i = 0; i < 5; ++i)
        st[j + i] = row[i] ^ ((~row[(i + 1) % 5]) & row[(i + 2) % 5]);
    }
    st[0] ^= RC[round];
  }
}

const size_t SHA3_256_RATE = 136;  // bytes

void sha3_256_impl(const uint8_t *in, size_t len, uint8_t *out) {
  uint64_t st[25];
  memset(st, 0, sizeof(st));
  uint8_t buf[SHA3_256_RATE];
  // absorb
  while (len >= SHA3_256_RATE) {
    for (size_t i = 0; i < SHA3_256_RATE / 8; ++i) {
      uint64_t w;
      memcpy(&w, in + 8 * i, 8);
      st[i] ^= w;
    }
    keccakf(st);
    in += SHA3_256_RATE;
    len -= SHA3_256_RATE;
  }
  memset(buf, 0, sizeof(buf));
  memcpy(buf, in, len);
  buf[len] = 0x06;  // SHA3 domain separation
  buf[SHA3_256_RATE - 1] |= 0x80;
  for (size_t i = 0; i < SHA3_256_RATE / 8; ++i) {
    uint64_t w;
    memcpy(&w, buf + 8 * i, 8);
    st[i] ^= w;
  }
  keccakf(st);
  memcpy(out, st, 32);
}

}  // namespace

extern "C" {

void myzkp_sha3_256(const uint8_t *in, size_t len, uint8_t *out32) {
  sha3_256_impl(in, len, out32);
}

// n_hashes independent SHA3-256 over equal-length messages laid out
// contiguously (in: n * msg_len bytes; out: n * 32 bytes).
void myzkp_sha3_256_batch(const uint8_t *in, size_t n, size_t msg_len,
                          uint8_t *out) {
  for (size_t k = 0; k < n; ++k)
    sha3_256_impl(in + k * msg_len, msg_len, out + 32 * k);
}

// Build all interior levels of a Merkle tree over n (power of two) leaves of
// leaf_len bytes each.  Node = SHA3-256(left || right); leaves are used raw
// (parity: merkle.rs:15-25).  out receives n-1 nodes of 32 bytes, level by
// level (n/2 first-level nodes, then n/4, ..., root last).
void myzkp_merkle_build(const uint8_t *leaves, size_t n, size_t leaf_len,
                        uint8_t *out) {
  uint8_t *cur = out;
  // level 1: hash leaf pairs (pairs are contiguous in the input buffer)
  {
    size_t m = n / 2;
    for (size_t i = 0; i < m; ++i)
      sha3_256_impl(leaves + (2 * i) * leaf_len, 2 * leaf_len, cur + 32 * i);
  }
  size_t level_n = n / 2;
  const uint8_t *prev = cur;
  cur += 32 * level_n;
  while (level_n > 1) {
    size_t m = level_n / 2;
    for (size_t i = 0; i < m; ++i)
      sha3_256_impl(prev + 64 * i, 64, cur + 32 * i);
    prev = cur;
    cur += 32 * m;
    level_n = m;
  }
}
}
