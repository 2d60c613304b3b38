// RICE_1 tile codec for FITS tiled-image compression.
//
// The reference writes per-amp RICE_1-compressed int32 HDUs through
// astropy/cfitsio (imsim/readout.py:479-526).  This is a from-scratch
// implementation of the same public format (Rice 1993 adaptive Golomb
// coding as specified by the FITS Tiled Image Compression convention):
//   stream := first_pixel (bbits big-endian) , blocks*
//   block  := fs_field(5 bits) , payload
//     fs_field = 0        -> 32 zero diffs
//     fs_field = fsmax+2  -> 32 raw bbits values
//     else fs = fs_field-1: per pixel, (mapped>>fs) zero bits + '1',
//                           then fs low bits;  mapped = zigzag(diff)
//
// Build: g++ -O3 -shared -fPIC rice.cc -o _rice.so   (see rice.py)
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int NBLOCK = 32;
constexpr int FSBITS = 5;
constexpr int FSMAX = 25;   // int32
constexpr int BBITS = 32;

struct BitWriter {
  // 64-bit accumulator writing straight into a caller-owned buffer:
  // ~20x faster than the byte-at-a-time vector version.
  uint8_t* out;
  size_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  explicit BitWriter(uint8_t* o) : out(o) {}
  inline void drain() {
    while (nbits >= 8) {
      out[pos++] = uint8_t((acc >> (nbits - 8)) & 0xFF);
      nbits -= 8;
    }
    acc &= (nbits ? ((1ull << nbits) - 1ull) : 0ull);
  }
  inline void put(uint32_t val, int n) {
    // n <= 32, acc holds < 8 bits on entry -> fits in 64
    acc = (acc << n) | (n == 32 ? uint64_t(val)
                                : uint64_t(val & ((1u << n) - 1u)));
    nbits += n;
    drain();
  }
  inline void put_zeros(int n) {
    while (n >= 32) { put(0, 32); n -= 32; }
    if (n) put(0, n);
  }
  void flush() {
    if (nbits) {
      out[pos++] = uint8_t((acc << (8 - nbits)) & 0xFF);
      nbits = 0;
      acc = 0;
    }
  }
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t acc = 0;
  int nbits = 0;
  BitReader(const uint8_t* data, size_t n) : p(data), end(data + n) {}
  inline uint32_t get(int n) {
    uint32_t v = 0;
    while (n > 0) {
      if (nbits == 0) {
        acc = (p < end) ? *p++ : 0;
        nbits = 8;
      }
      int take = n < nbits ? n : nbits;
      v = (v << take) | ((acc >> (nbits - take)) & ((1u << take) - 1u));
      nbits -= take;
      n -= take;
    }
    return v;
  }
  inline int count_zeros_until_one() {
    int n = 0;
    for (;;) {
      if (nbits == 0) {
        acc = (p < end) ? *p++ : 1;  // fail-safe: fabricate terminator
        nbits = 8;
      }
      uint32_t window = acc & ((1u << nbits) - 1u);
      if (window == 0) { n += nbits; nbits = 0; continue; }
      // leading zeros within the nbits window
      int lead = 0;
      while (!((window >> (nbits - 1 - lead)) & 1u)) ++lead;
      n += lead;
      nbits -= lead + 1;  // consume zeros + the terminating 1
      return n;
    }
  }
};

}  // namespace

extern "C" {

// Compress n int32 pixels; out must have room for 8 + 5*n bytes.
// Returns compressed size in bytes.
long rice_encode_i32(const int32_t* a, long n, uint8_t* out_buf) {
  if (n <= 0) return 0;
  int32_t lastpix = a[0];
  uint32_t u = uint32_t(lastpix);
  out_buf[0] = uint8_t(u >> 24);
  out_buf[1] = uint8_t(u >> 16);
  out_buf[2] = uint8_t(u >> 8);
  out_buf[3] = uint8_t(u);
  BitWriter bw(out_buf + 4);
  std::vector<uint32_t> mapped(NBLOCK);
  for (long start = 1; start < n; start += NBLOCK) {
    long m = (start + NBLOCK <= n) ? NBLOCK : (n - start);
    uint64_t sum = 0;
    for (long i = 0; i < m; ++i) {
      // wraparound difference + 32-bit zigzag: bijective for ALL int32
      int32_t diff = int32_t(uint32_t(a[start + i]) - uint32_t(lastpix));
      lastpix = a[start + i];
      uint32_t mv = (uint32_t(diff) << 1) ^ uint32_t(diff >> 31);
      mapped[i] = mv;
      sum += mv;
    }
    // pick fs: smallest fs with expected unary cost reasonable
    uint64_t mean = sum / uint64_t(m);
    uint32_t mmax = 0;
    for (long i = 0; i < m; ++i) if (mapped[i] > mmax) mmax = mapped[i];
    int fs = 0;
    while ((mean >> fs) > 0) ++fs;
    if (fs > 0) --fs;  // mean in [2^fs, 2^(fs+1))
    // cap the worst-case unary run: raw block if a pixel would need
    // more than ~8*BBITS unary bits at this fs
    if (fs < FSMAX && (uint64_t(mmax) >> fs) > uint64_t(8 * BBITS))
      fs = FSMAX;
    if (sum == 0) {
      bw.put(0, FSBITS);
    } else if (fs >= FSMAX) {
      bw.put(FSMAX + 2, FSBITS);
      for (long i = 0; i < m; ++i) bw.put(mapped[i], BBITS);
    } else {
      bw.put(uint32_t(fs + 1), FSBITS);
      for (long i = 0; i < m; ++i) {
        uint32_t top = mapped[i] >> fs;  // bounded by the mmax guard
        bw.put_zeros(int(top));
        bw.put(1, 1);
        if (fs) bw.put(mapped[i] & ((1u << fs) - 1u), fs);
      }
    }
  }
  bw.flush();
  return long(4 + bw.pos);
}

// Decompress into n int32 pixels.  Returns n on success, -1 on error.
long rice_decode_i32(const uint8_t* buf, long nbytes, int32_t* a, long n) {
  if (n <= 0) return 0;
  if (nbytes < 4) return -1;
  uint32_t u = (uint32_t(buf[0]) << 24) | (uint32_t(buf[1]) << 16) |
               (uint32_t(buf[2]) << 8) | uint32_t(buf[3]);
  int32_t lastpix = int32_t(u);
  a[0] = lastpix;
  BitReader br(buf + 4, size_t(nbytes - 4));
  for (long start = 1; start < n; start += NBLOCK) {
    long m = (start + NBLOCK <= n) ? NBLOCK : (n - start);
    uint32_t fsf = br.get(FSBITS);
    if (fsf == 0) {
      for (long i = 0; i < m; ++i) a[start + i] = lastpix;
    } else if (fsf == uint32_t(FSMAX + 2)) {
      for (long i = 0; i < m; ++i) {
        uint32_t mv = br.get(BBITS);
        int32_t diff = int32_t((mv >> 1) ^ (~(mv & 1u) + 1u));
        lastpix = int32_t(uint32_t(lastpix) + uint32_t(diff));
        a[start + i] = lastpix;
      }
    } else {
      int fs = int(fsf) - 1;
      for (long i = 0; i < m; ++i) {
        uint32_t top = uint32_t(br.count_zeros_until_one());
        uint32_t low = fs ? br.get(fs) : 0u;
        uint32_t mv = (top << fs) | low;
        int32_t diff = int32_t((mv >> 1) ^ (~(mv & 1u) + 1u));
        lastpix = int32_t(uint32_t(lastpix) + uint32_t(diff));
        a[start + i] = lastpix;
      }
    }
  }
  return n;
}

// ---------------------------------------------------------------------------
// Fast phoSim instance-catalog scanner: counts and tokenizes 'object'
// lines.  Returns number of object lines; fills offsets of line starts.
// (The heavy per-field parsing stays in Python/numpy via a second pass
// over the much smaller filtered buffer.)
long instcat_scan(const char* buf, long n, long* line_starts, long max_lines) {
  long count = 0;
  long i = 0;
  while (i < n && count < max_lines) {
    if (n - i >= 6 && std::memcmp(buf + i, "object", 6) == 0) {
      line_starts[count++] = i;
    }
    while (i < n && buf[i] != '\n') ++i;
    ++i;
  }
  return count;
}

}  // extern "C"
