// Native host encoder for the PCM wire codec (io/pcmcodec.py).
//
// The TPU-side decoder unpacks fixed-width zigzag residual blocks (512
// samples each); this file is the host half: compute order-1/2/3 linear
// prediction residuals, pick the cheapest order, and bit-pack each block at
// its own width. Pure numpy is ~100x too slow for this on the single-core
// serving hosts (measured 6.5 s for a 46 MB batch; the wire it feeds moves
// that batch in ~1 s), hence C++. The layout contract (MSB-first words,
// 16*w words per block, zigzag, implicit-zero warmup so the decoder is a
// plain cumsum^order) is shared with io/pcmcodec.py's numpy fallback and
// pinned by tests/test_pcmcodec.py.
//
// Built on demand via native/__init__.py (g++ -O3 -shared), ctypes ABI.

#include <cstdint>
#include <cstring>

namespace {

constexpr int64_t kBlock = 512;

inline uint32_t zigzag(int32_t v) {
  return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}

inline int width_of(uint32_t maxz) {
  if (maxz == 0) return 0;
  int w = 32 - __builtin_clz(maxz);
  return w > 20 ? 32 : w;  // widths 21..31 cannot occur; 32 is the escape
}

// order-specialised block packer with running previous-sample state
// (implicit zeros before the row start, matching numpy
// diff-with-kept-first-element semantics)
template <int kOrder>
inline void pack_block(const int16_t* x, int64_t row, int64_t s, int w,
                       uint32_t* out) {
  int32_t p1 = (s - 1 < row) ? 0 : x[s - 1];
  int32_t p2 = (s - 2 < row) ? 0 : x[s - 2];
  int32_t p3 = (s - 3 < row) ? 0 : x[s - 3];
  uint64_t acc = 0;
  int nbits = 0;
  for (int64_t i = 0; i < kBlock; ++i) {
    const int32_t v = x[s + i];
    int32_t r = v - p1;
    if (kOrder >= 2) r -= (p1 - p2);
    if (kOrder >= 3) r -= (p1 - p2) - (p2 - p3);
    p3 = p2;
    p2 = p1;
    p1 = v;
    acc = (acc << w) | zigzag(r);
    nbits += w;
    while (nbits >= 32) {
      *out++ = static_cast<uint32_t>(acc >> (nbits - 32));
      nbits -= 32;
      acc &= (nbits ? ((uint64_t(1) << nbits) - 1) : 0);
    }
  }
}

}  // namespace

extern "C" {

// Per-block widths for orders 1..3. x is [B, T] row-major int16, T % 512
// == 0. widths_out is [3, n_blocks] (order-1 row first). Returns n_blocks.
int64_t pcm_widths(const int16_t* x, int64_t B, int64_t T,
                   uint8_t* widths_out) {
  const int64_t nb_row = T / kBlock;
  const int64_t n_blocks = B * nb_row;
  for (int64_t b = 0; b < B; ++b) {
    const int64_t row = b * T;
    for (int64_t k = 0; k < nb_row; ++k) {
      const int64_t s = row + k * kBlock;
      uint32_t m1 = 0, m2 = 0, m3 = 0;
      // running previous samples (implicit zeros before the row start)
      int32_t p1 = (k == 0) ? 0 : x[s - 1];
      int32_t p2 = (s - 2 < row) ? 0 : x[s - 2];
      int32_t p3 = (s - 3 < row) ? 0 : x[s - 3];
      for (int64_t i = 0; i < kBlock; ++i) {
        const int32_t v = x[s + i];
        const int32_t r1 = v - p1;
        const int32_t r2 = r1 - (p1 - p2);
        const int32_t r3 = r2 - ((p1 - p2) - (p2 - p3));
        const uint32_t z1 = zigzag(r1), z2 = zigzag(r2), z3 = zigzag(r3);
        if (z1 > m1) m1 = z1;
        if (z2 > m2) m2 = z2;
        if (z3 > m3) m3 = z3;
        p3 = p2;
        p2 = p1;
        p1 = v;
      }
      const int64_t kk = b * nb_row + k;
      widths_out[kk] = static_cast<uint8_t>(width_of(m1));
      widths_out[n_blocks + kk] = static_cast<uint8_t>(width_of(m2));
      widths_out[2 * n_blocks + kk] = static_cast<uint8_t>(width_of(m3));
    }
  }
  return n_blocks;
}

// Pack residuals of `order` at per-block widths into words_out: block k's
// 16*widths[k] MSB-first words start at word_offs[k] (prefix sums computed
// by the caller). Returns 0.
int64_t pcm_pack(const int16_t* x, int64_t B, int64_t T, int32_t order,
                 const uint8_t* widths, const int64_t* word_offs,
                 uint32_t* words_out) {
  const int64_t nb_row = T / kBlock;
  for (int64_t b = 0; b < B; ++b) {
    const int64_t row = b * T;
    for (int64_t k = 0; k < nb_row; ++k) {
      const int64_t kk = b * nb_row + k;
      const int w = widths[kk];
      if (w == 0) continue;
      const int64_t s = row + k * kBlock;
      uint32_t* out = words_out + word_offs[kk];
      switch (order) {
        case 1:
          pack_block<1>(x, row, s, w, out);
          break;
        case 2:
          pack_block<2>(x, row, s, w, out);
          break;
        default:
          pack_block<3>(x, row, s, w, out);
      }
    }
  }
  return 0;
}

}  // extern "C"
