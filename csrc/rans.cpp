// TPU-native framework host entropy coder.
//
// A from-scratch C++17 implementation of the rANS bitstream format used by
// FlashGMM/CompressAI (see /root/reference/compressai/cpp_exts/rans/
// rans_interface.cpp and third_party/ryg_rans/rans64.h for the format spec):
// 64-bit state, 32-bit-word renormalization (stream written backwards),
// 16-bit probability precision, 4-bit bypass chunks.
//
// Design difference from the reference: the float probability math lives on
// the TPU. The "rows" entry points below consume *precomputed* uint16
// boundary-CDF rows (one row per symbol, computed by a fused JAX/Pallas
// kernel), so the host only runs the serial integer state chain:
//   encode: table lookup + rANS put
//   decode: binary search in a monotone u16 row + rANS advance
// A host-math GMM path (gaussian CDF approximations evaluated on CPU) is
// also provided for reference-bitstream compatibility testing.
//
// Exposed as a plain C API consumed via ctypes (no torch/pybind deps).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecision = 16;
constexpr uint32_t kMaxCdfValue = (1u << kPrecision) - 1;  // 65535
constexpr uint32_t kBypassPrecision = 4;
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;
constexpr uint64_t kRansL = 1ull << 31;

struct Sym {
  uint16_t start;
  uint16_t freq;
  bool raw_bits;
};

class SymbolBuffer {
 public:
  void put(uint32_t start, uint32_t freq) {
    syms_.push_back({static_cast<uint16_t>(start), static_cast<uint16_t>(freq), false});
  }

  void put_bits(uint32_t val) {
    syms_.push_back({static_cast<uint16_t>(val), 0, true});
  }

  // Chunk-count prefix followed by LSB-first 4-bit chunks of raw_val.
  void put_bypass_value(uint32_t raw_val) {
    // 64-bit shift: a 32-bit shift by >=32 is UB (raw values with the top
    // bit set need exactly 8 chunks).
    const uint64_t wide = raw_val;
    int n_bypass = 0;
    while ((wide >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
    int32_t val = n_bypass;
    while (val >= static_cast<int32_t>(kMaxBypassVal)) {
      put_bits(kMaxBypassVal);
      val -= kMaxBypassVal;
    }
    put_bits(static_cast<uint32_t>(val));
    for (int j = 0; j < n_bypass; ++j) {
      put_bits((raw_val >> (j * kBypassPrecision)) & kMaxBypassVal);
    }
  }

  // Serialize: state flushed as two little-endian u32 words at the front,
  // renormalization words following in reverse emission order.
  int64_t flush(uint8_t* out, int64_t capacity) {
    uint64_t state = kRansL;
    std::vector<uint32_t> words;
    words.reserve(syms_.size() / 4 + 4);
    for (auto it = syms_.rbegin(); it != syms_.rend(); ++it) {
      if (it->raw_bits) {
        const uint64_t x_max = ((kRansL >> 16) << 32) * (1u << (16 - kBypassPrecision));
        if (state >= x_max) {
          words.push_back(static_cast<uint32_t>(state));
          state >>= 32;
        }
        state = (state << kBypassPrecision) | it->start;
      } else {
        const uint64_t x_max = ((kRansL >> kPrecision) << 32) * it->freq;
        if (state >= x_max) {
          words.push_back(static_cast<uint32_t>(state));
          state >>= 32;
        }
        state = ((state / it->freq) << kPrecision) + (state % it->freq) + it->start;
      }
    }
    const int64_t nbytes = static_cast<int64_t>((2 + words.size()) * sizeof(uint32_t));
    if (nbytes > capacity) return -nbytes;  // caller must retry with capacity
    uint32_t* p = reinterpret_cast<uint32_t*>(out);
    p[0] = static_cast<uint32_t>(state);
    p[1] = static_cast<uint32_t>(state >> 32);
    for (size_t i = 0; i < words.size(); ++i) {
      p[2 + i] = words[words.size() - 1 - i];
    }
    return nbytes;
  }

 private:
  std::vector<Sym> syms_;
};

class Decoder {
 public:
  Decoder(const uint8_t* data, int64_t nbytes)
      : words_(reinterpret_cast<const uint32_t*>(data)),
        nwords_(nbytes / 4),
        pos_(2) {
    // a valid stream always carries the 8-byte initial state; guard the
    // unconditional reads below against truncated/corrupt input (callers
    // also reject nbytes < 8 up front — this is defense in depth)
    if (nwords_ < 2) {
      state_ = kRansL;
      pos_ = nwords_;
      return;
    }
    state_ = static_cast<uint64_t>(words_[0]) |
             (static_cast<uint64_t>(words_[1]) << 32);
  }

  uint32_t peek() const { return static_cast<uint32_t>(state_ & kMaxCdfValue); }

  void advance(uint32_t start, uint32_t freq) {
    uint64_t x = state_;
    x = freq * (x >> kPrecision) + (x & kMaxCdfValue) - start;
    state_ = renorm(x);
  }

  uint32_t get_bits() {
    uint64_t x = state_;
    uint32_t val = static_cast<uint32_t>(x & kMaxBypassVal);
    state_ = renorm(x >> kBypassPrecision);
    return val;
  }

  uint32_t get_bypass_value() {
    uint32_t val = get_bits();
    uint32_t n_bypass = val;
    while (val == kMaxBypassVal) {
      val = get_bits();
      n_bypass += val;
    }
    uint32_t raw = 0;
    for (uint32_t j = 0; j < n_bypass; ++j) {
      raw |= get_bits() << (j * kBypassPrecision);
    }
    return raw;
  }

 private:
  uint64_t renorm(uint64_t x) {
    if (x < kRansL && pos_ < nwords_) {
      x = (x << 32) | words_[pos_++];
    }
    return x;
  }

  const uint32_t* words_;
  int64_t nwords_;
  int64_t pos_;
  uint64_t state_;
};

// ---- Gaussian CDF approximations (host-math compat path) -------------------
// Same formulas/order of operations as the reference so encode/decode of
// reference bitstreams round-trips (rans_interface.cpp:95-245).

constexpr float kPi = 3.14159265358979323846f;
constexpr float kInvSqrt2Pi = 0.3989422804014327f;

inline float polya_cdf(float x) {
  return 0.5f * (1.0f + std::copysign(std::sqrt(1.0f - std::exp(-2.0f * x * x / kPi)), x));
}

// Explicit fmaf placements: the reference binary (gcc -O3 default
// -ffp-contract=fast) contracts the A&S polynomial into FMAs, and bitstream
// bit-exactness requires reproducing that exact f32 rounding. The rest of
// this file is compiled with -ffp-contract=off (see ans/cext.py) because the
// reference's GMM accumulation loop is NOT contracted — both facts verified
// against recorded reference bitstreams (tests/test_reference_golden.py).
inline float as_cdf(float x) {
  constexpr float p = 0.2316419f;
  constexpr float b1 = 0.319381530f;
  constexpr float b2 = -0.356563782f;
  constexpr float b3 = 1.781477937f;
  constexpr float b4 = -1.821255978f;
  constexpr float b5 = 1.330274429f;
  float abs_x = std::fabs(x);
  float z_x = kInvSqrt2Pi * std::exp(-0.5f * x * x);
  float t = 1.0f / std::fmaf(p, abs_x, 1.0f);
  float poly =
      t * std::fmaf(t, std::fmaf(t, std::fmaf(t, std::fmaf(t, b5, b4), b3), b2), b1);
  float res = std::fmaf(-z_x, poly, 1.0f);
  return (x >= 0.0f) ? res : 1.0f - res;
}

inline float logistic_cdf(float x) {
  return 1.0f / (1.0f + std::exp(-1.702f * x));
}

// ---- SIMD-equivalent variants (USE_SIMD=1, the reference default) ----------
// The reference's AVX2 kernels (rans_interface.cpp:119-292) use the Cephes
// polynomial exp256_ps (avx_mathfun.h:250-305) instead of libm expf, and a
// pairwise hadd reduction for the K=4 mixture.  Every AVX op involved
// (mul/add/sub/div/sqrt/min/max/floor/fma) is a correctly-rounded per-lane
// f32 op, so this scalar transcription — same constants, same op order,
// fmaf exactly where the reference BINARY has one (explicit _mm256_fmadd_ps
// plus the two mul+add pairs gcc -ffp-contract=fast contracts in the A&S
// path; this file is compiled -ffp-contract=off so nothing else fuses) —
// is bitwise identical to the SIMD lanes
// (tests/test_reference_golden.py::test_gmm_k4_encode_byte_identical[*-1]).

inline float exp_cephes(float x) {
  constexpr float kExpHi = 88.3762626647949f;
  constexpr float kExpLo = -88.3762626647949f;
  constexpr float kLog2E = 1.44269504088896341f;
  constexpr float kC1 = 0.693359375f;
  constexpr float kC2 = -2.12194440e-4f;
  constexpr float kP0 = 1.9875691500E-4f;
  constexpr float kP1 = 1.3981999507E-3f;
  constexpr float kP2 = 8.3334519073E-3f;
  constexpr float kP3 = 4.1665795894E-2f;
  constexpr float kP4 = 1.6666665459E-1f;
  constexpr float kP5 = 5.0000001201E-1f;
  x = std::min(x, kExpHi);
  x = std::max(x, kExpLo);
  float fx = x * kLog2E;
  fx = fx + 0.5f;
  float tmp = std::floor(fx);
  if (tmp > fx) tmp = tmp - 1.0f;  // cmp_gt mask subtract
  fx = tmp;
  tmp = fx * kC1;
  float z = fx * kC2;
  x = x - tmp;
  x = x - z;
  z = x * x;
  float y = kP0;
  y = y * x + kP1;
  y = y * x + kP2;
  y = y * x + kP3;
  y = y * x + kP4;
  y = y * x + kP5;
  y = y * z + x;
  y = y + 1.0f;
  int32_t imm0 = static_cast<int32_t>(fx);  // cvttps: truncate
  imm0 = (imm0 + 0x7f) << 23;
  float pow2n;
  std::memcpy(&pow2n, &imm0, sizeof(pow2n));
  return y * pow2n;
}

inline float polya_cdf_simd(float x) {
  constexpr float kMinusTwoInvPi = -2.0f / kPi;
  float x_sq = x * x;
  float after_exp = exp_cephes(kMinusTwoInvPi * x_sq);
  float after_sqrt = std::sqrt(1.0f - after_exp);
  return 0.5f * (1.0f + std::copysign(after_sqrt, x));
}

inline float as_cdf_simd(float x) {
  constexpr float p = 0.2316419f;
  constexpr float b1 = 0.319381530f;
  constexpr float b2 = -0.356563782f;
  constexpr float b3 = 1.781477937f;
  constexpr float b4 = -1.821255978f;
  constexpr float b5 = 1.330274429f;
  float abs_x = std::fabs(x);
  float x_sq = x * x;
  float z_x = kInvSqrt2Pi * exp_cephes(x_sq * -0.5f);
  // gcc -ffp-contract=fast contracts the _mm256_mul_ps/_mm256_add_ps pairs
  // below into FMAs in the reference binary (GCC lowers these intrinsics to
  // plain vector mul/add, so contraction applies to them just as it does to
  // the scalar path) — verified against recorded streams, like the scalar
  // as_cdf above.  exp256_ps and the Pólya/logistic paths are NOT
  // contracted in that binary (modes 0/2 match with plain ops).
  float t = 1.0f / std::fmaf(p, abs_x, 1.0f);
  float poly = std::fmaf(b5, t, b4);
  poly = std::fmaf(poly, t, b3);
  poly = std::fmaf(poly, t, b2);
  poly = std::fmaf(poly, t, b1);
  poly = poly * t;
  float res_pos = std::fmaf(-z_x, poly, 1.0f);
  // blendv selects by the SIGN BIT (so -0.0f takes the negative branch)
  return std::signbit(x) ? 1.0f - res_pos : res_pos;
}

inline float logistic_cdf_simd(float x) {
  float exp_res = exp_cephes(-1.0f * (1.702f * x));
  return 1.0f / (1.0f + exp_res);
}

inline float gaussian_cdf(float x, int mode) {
  switch (mode) {
    case 1: return as_cdf(x);
    case 2: return logistic_cdf(x);
    default: return polya_cdf(x);
  }
}

inline float gaussian_cdf_simd(float x, int mode) {
  switch (mode) {
    case 1: return as_cdf_simd(x);
    case 2: return logistic_cdf_simd(x);
    default: return polya_cdf_simd(x);
  }
}

inline void gmm_cdf2(float x1, float x2, const float* means, const float* scales,
                     const float* weights, int K, int mode, int use_simd,
                     float* c1, float* c2) {
  // The reference takes its SIMD path only for K==4 (rans_interface.cpp:259)
  if (use_simd && K == 4) {
    float a[4], b[4];
    for (int k = 0; k < 4; ++k) {
      a[k] = weights[k] * gaussian_cdf_simd((x1 - means[k]) / scales[k], mode);
      b[k] = weights[k] * gaussian_cdf_simd((x2 - means[k]) / scales[k], mode);
    }
    // _mm_hadd_ps x2: pairwise reduction (c0+c1)+(c2+c3)
    *c1 = (a[0] + a[1]) + (a[2] + a[3]);
    *c2 = (b[0] + b[1]) + (b[2] + b[3]);
    return;
  }
  float a = 0.0f, b = 0.0f;
  for (int k = 0; k < K; ++k) {
    a += weights[k] * gaussian_cdf((x1 - means[k]) / scales[k], mode);
    b += weights[k] * gaussian_cdf((x2 - means[k]) / scales[k], mode);
  }
  *c1 = a;
  *c2 = b;
}

// ---- Debug-mode CDF validation ---------------------------------------------
// Enabled via env FLASHGMM_DEBUG=1 (runtime check instead of the reference's
// DEBUG_BUILD compile flag; cf. assert_cdfs, rans_interface.cpp:70-80).
// Validation failures return kErrInvalidCdf from the encode entry points.

constexpr int64_t kErrInvalidCdf = INT64_MIN;
constexpr int64_t kErrShortBuffer = INT64_MIN + 1;

inline bool debug_enabled() {
  static int enabled = -1;
  if (enabled == -1) {
    const char* env = std::getenv("FLASHGMM_DEBUG");
    enabled = (env != nullptr && env[0] == '1') ? 1 : 0;
  }
  return enabled == 1;
}

inline bool check_table_cdfs(const int32_t* cdfs, int64_t cdf_stride,
                             const int32_t* cdfs_sizes, int64_t n_cdfs) {
  for (int64_t i = 0; i < n_cdfs; ++i) {
    const int32_t* cdf = cdfs + i * cdf_stride;
    const int32_t size = cdfs_sizes[i];
    if (size < 2 || size > cdf_stride) return false;
    if (cdf[0] != 0) return false;
    if (cdf[size - 1] != (1 << kPrecision)) return false;
    for (int32_t j = 0; j + 1 < size; ++j) {
      if (cdf[j + 1] < cdf[j]) return false;  // must be monotone
    }
  }
  return true;
}

inline bool check_rows(const uint16_t* rows, int64_t n, int64_t row_len) {
  for (int64_t i = 0; i < n; ++i) {
    const uint16_t* row = rows + i * row_len;
    for (int64_t j = 0; j + 1 < row_len; ++j) {
      if (row[j + 1] < row[j]) return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Table path
// ---------------------------------------------------------------------------

// cdfs: [num_cdfs, cdf_stride] row-major int32.
int64_t fg_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                               int64_t n, const int32_t* cdfs, int64_t cdf_stride,
                               const int32_t* cdfs_sizes, const int32_t* offsets,
                               uint8_t* out, int64_t capacity) {
  if (debug_enabled()) {
    int64_t n_cdfs = 0;
    for (int64_t i = 0; i < n; ++i) n_cdfs = std::max<int64_t>(n_cdfs, indexes[i] + 1);
    if (!check_table_cdfs(cdfs, cdf_stride, cdfs_sizes, n_cdfs)) return kErrInvalidCdf;
  }
  SymbolBuffer buf;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * cdf_stride;
    const int32_t max_value = cdfs_sizes[idx] - 2;
    int32_t value = symbols[i] - offsets[idx];

    uint32_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint32_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (value - max_value));
      value = max_value;
    }

    buf.put(static_cast<uint32_t>(cdf[value]),
            static_cast<uint32_t>(cdf[value + 1] - cdf[value]));
    if (value == max_value) buf.put_bypass_value(raw_val);
  }
  return buf.flush(out, capacity);
}

int64_t fg_decode_with_indexes(const uint8_t* data, int64_t nbytes,
                               const int32_t* indexes, int64_t n,
                               const int32_t* cdfs, int64_t cdf_stride,
                               const int32_t* cdfs_sizes, const int32_t* offsets,
                               int32_t* out) {
  if (nbytes < 8) return kErrShortBuffer;
  Decoder dec(data, nbytes);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * cdf_stride;
    const int32_t size = cdfs_sizes[idx];
    const int32_t max_value = size - 2;

    const uint32_t cum_freq = dec.peek();
    const int32_t* end = cdf + size;
    // leftmost element > cum_freq, minus one
    const int32_t* it = std::upper_bound(cdf, end, static_cast<int32_t>(cum_freq));
    int32_t s = static_cast<int32_t>(it - cdf) - 1;
    dec.advance(static_cast<uint32_t>(cdf[s]),
                static_cast<uint32_t>(cdf[s + 1] - cdf[s]));

    int32_t value = s;
    if (value == max_value) {
      const uint32_t raw_val = dec.get_bypass_value();
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = value + offsets[idx];
  }
  return n;
}

// ---------------------------------------------------------------------------
// Rows path: boundary CDF rows precomputed (on TPU)
// rows: [n, row_len] uint16, rows[i][j] = u16(cdf_i(lo + j - 0.5) * 65535)
// ---------------------------------------------------------------------------

int64_t fg_encode_rows(const int32_t* values, int64_t n, const uint16_t* rows,
                       int64_t row_len, int32_t lo, uint8_t* out,
                       int64_t capacity) {
  if (debug_enabled() && !check_rows(rows, n, row_len)) return kErrInvalidCdf;
  SymbolBuffer buf;
  for (int64_t i = 0; i < n; ++i) {
    const uint16_t* row = rows + i * row_len;
    const int32_t v = values[i];
    const int64_t j = static_cast<int64_t>(v) - lo;
    const uint32_t start = row[j];
    const uint32_t pmf = static_cast<uint16_t>(row[j + 1] - row[j]);
    if (pmf == 0) {
      buf.put(kMaxCdfValue, 1);
      buf.put_bypass_value(static_cast<uint32_t>(v));
    } else {
      buf.put(start, pmf);
    }
  }
  return buf.flush(out, capacity);
}

int64_t fg_decode_rows(const uint8_t* data, int64_t nbytes, const uint16_t* rows,
                       int64_t n, int64_t row_len, int32_t lo, int32_t* out) {
  if (nbytes < 8) return kErrShortBuffer;
  Decoder dec(data, nbytes);
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t cum_freq = dec.peek();
    if (cum_freq == kMaxCdfValue) {
      dec.advance(kMaxCdfValue, 1);
      out[i] = static_cast<int32_t>(dec.get_bypass_value());
    } else {
      const uint16_t* row = rows + i * row_len;
      const uint16_t* it =
          std::upper_bound(row, row + row_len, static_cast<uint16_t>(cum_freq));
      int64_t s = (it - row) - 1;
      if (s < 0) s = 0;
      if (s > row_len - 2) s = row_len - 2;
      uint32_t start = row[s];
      uint32_t pmf = static_cast<uint16_t>(row[s + 1] - row[s]);
      if (pmf == 0) {
        pmf = 1;
        if (start + pmf > (1u << kPrecision)) start = (1u << kPrecision) - pmf;
      }
      dec.advance(start, pmf);
      out[i] = lo + static_cast<int32_t>(s);
    }
  }
  return n;
}

// ---------------------------------------------------------------------------
// Host-math GMM path (reference-bitstream compatibility): CDFs evaluated on
// CPU with the same approximations as the reference AVX2 kernels.
// scales/means/weights: [n, K] row-major float32.
// ---------------------------------------------------------------------------

int64_t fg_encode_gmm_host(const int32_t* values, int64_t n, const float* scales,
                           const float* means, const float* weights, int32_t K,
                           int32_t approx_mode, int32_t use_simd, uint8_t* out,
                           int64_t capacity) {
  SymbolBuffer buf;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t v = values[i];
    float c1, c2;
    gmm_cdf2(static_cast<float>(v) - 0.5f, static_cast<float>(v) - 0.5f + 1.0f,
             means + i * K, scales + i * K, weights + i * K, K, approx_mode,
             use_simd, &c1, &c2);
    const uint32_t cdf_value = static_cast<uint16_t>(c1 * kMaxCdfValue);
    const uint32_t cdf_next = static_cast<uint16_t>(c2 * kMaxCdfValue);
    const uint32_t pmf = static_cast<uint16_t>(cdf_next - cdf_value);
    if (pmf == 0) {
      buf.put(kMaxCdfValue, 1);
      buf.put_bypass_value(static_cast<uint32_t>(v));
    } else {
      buf.put(cdf_value, pmf);
    }
  }
  return buf.flush(out, capacity);
}

int64_t fg_decode_gmm_host(const uint8_t* data, int64_t nbytes, int64_t n,
                           const float* scales, const float* means,
                           const float* weights, int32_t K, int32_t max_bs_value,
                           int32_t approx_mode, int32_t use_simd, int32_t* out) {
  if (nbytes < 8) return kErrShortBuffer;
  Decoder dec(data, nbytes);
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t cum_freq = dec.peek();
    if (cum_freq == kMaxCdfValue) {
      dec.advance(kMaxCdfValue, 1);
      out[i] = static_cast<int32_t>(dec.get_bypass_value());
      continue;
    }
    const float* m = means + i * K;
    const float* s = scales + i * K;
    const float* w = weights + i * K;
    int32_t lo = -max_bs_value, hi = max_bs_value, mid = 0;
    uint32_t c1q = 0, c2q = 0;
    while (lo <= hi) {
      mid = lo + (hi - lo) / 2;
      float c1, c2;
      gmm_cdf2(static_cast<float>(mid) - 0.5f,
               static_cast<float>(mid) - 0.5f + 1.0f, m, s, w, K, approx_mode,
               use_simd, &c1, &c2);
      c1q = static_cast<uint16_t>(c1 * kMaxCdfValue);
      c2q = static_cast<uint16_t>(c2 * kMaxCdfValue);
      if (c1q <= cum_freq && c2q > cum_freq) break;
      if (c1q > cum_freq) {
        hi = mid - 1;
      } else {
        lo = mid + 1;
      }
    }
    uint32_t pmf = static_cast<uint16_t>(c2q - c1q);
    uint32_t start = c1q;
    if (pmf == 0) {
      pmf = 1;
      if (start + pmf > (1u << kPrecision)) start = (1u << kPrecision) - pmf;
    }
    dec.advance(start, pmf);
    out[i] = mid;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Streaming decoder (for raster-scan autoregressive models): the decoder
// state persists across calls so the context model can feed back decoded
// symbols (cf. RansDecoder::set_stream/decode_stream,
// rans_interface.cpp:886-956).
// ---------------------------------------------------------------------------

struct StreamingDecoder {
  std::vector<uint8_t> data;
  Decoder* dec;
};

void* fg_decoder_new(const uint8_t* data, int64_t nbytes) {
  if (nbytes < 8) return nullptr;
  auto* sd = new StreamingDecoder();
  sd->data.assign(data, data + nbytes);
  sd->dec = new Decoder(sd->data.data(), nbytes);
  return sd;
}

int64_t fg_decoder_decode(void* handle, const int32_t* indexes, int64_t n,
                          const int32_t* cdfs, int64_t cdf_stride,
                          const int32_t* cdfs_sizes, const int32_t* offsets,
                          int32_t* out) {
  auto* sd = static_cast<StreamingDecoder*>(handle);
  Decoder& dec = *sd->dec;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * cdf_stride;
    const int32_t size = cdfs_sizes[idx];
    const int32_t max_value = size - 2;

    const uint32_t cum_freq = dec.peek();
    const int32_t* it =
        std::upper_bound(cdf, cdf + size, static_cast<int32_t>(cum_freq));
    int32_t s = static_cast<int32_t>(it - cdf) - 1;
    dec.advance(static_cast<uint32_t>(cdf[s]),
                static_cast<uint32_t>(cdf[s + 1] - cdf[s]));

    int32_t value = s;
    if (value == max_value) {
      const uint32_t raw_val = dec.get_bypass_value();
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = value + offsets[idx];
  }
  return n;
}

void fg_decoder_free(void* handle) {
  auto* sd = static_cast<StreamingDecoder*>(handle);
  delete sd->dec;
  delete sd;
}

// Build info probe so Python can detect a stale shared library.
int32_t fg_abi_version() { return 8; }

}  // extern "C"
