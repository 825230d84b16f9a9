// Standalone codec: bitstream format + latent entropy coding + RDOQ.
//
// Bitstream "FGSAB001" (little-endian; Python twin in
// flashgmm_tpu/standalone/format.py — keep byte-compatible):
//   magic[8] | w:u16 | h:u16 | M:u16 | down:u8 | flags:u8
//   | channel-activation bitmap: ceil(M/8) bytes (bit k = channel k coded)
//   | body_len:u32 | body (table-rANS, csrc/rans.cpp format)
// Body symbols: active channels in index order, channel-major, row-major
// within a channel (the NCHW flatten the framework's reference-format
// paths already use), coded with the EntropyBottleneck's quantized CDF
// rows (index = channel id) — the exact coder + tables the Python
// EntropyBottleneck.compress path uses, so the body is the same format.
//
// cf. reference sadl_codec/encoder_generic.h:132-178 (file format with
// channel-activation header) and rdoq.h (RDOQ) — re-designed here: EB
// tables instead of dataset-empirical CDFs, raw bitmap instead of
// per-channel entropy-coded activation, latent-space RDOQ with exported
// synthesis gains instead of per-candidate decoder runs.
#pragma once

#include <cmath>
#include <cstdint>
#include <fstream>
#include <string>
#include <vector>

#include "common.h"

// csrc/rans.cpp C API (linked in)
extern "C" {
int64_t fg_encode_with_indexes(const int32_t *symbols, const int32_t *indexes,
                               int64_t n, const int32_t *cdfs,
                               int64_t cdf_stride, const int32_t *cdfs_sizes,
                               const int32_t *offsets, uint8_t *out,
                               int64_t capacity);
int64_t fg_decode_with_indexes(const uint8_t *data, int64_t nbytes,
                               const int32_t *indexes, int64_t n,
                               const int32_t *cdfs, int64_t cdf_stride,
                               const int32_t *cdfs_sizes,
                               const int32_t *offsets, int32_t *out);
}

namespace fgsc {

struct LatentPlane {
  int h = 0, w = 0, c = 0;
  std::vector<int32_t> symbols;  // [c, h, w] channel-major (NCHW order)
  int32_t &at(int ch, int y, int x) {
    return symbols[(static_cast<size_t>(ch) * h + y) * w + x];
  }
  int32_t at(int ch, int y, int x) const {
    return symbols[(static_cast<size_t>(ch) * h + y) * w + x];
  }
};

// round-half-away-from-zero, matching jnp.round-then-cast semantics the
// EB "symbols" quantize mode produces on TPU (jnp.round is half-to-even;
// EB latents essentially never land on exact .5 so either convention
// yields the same symbols in practice — the codec is self-consistent
// regardless, see net.h header note).
inline int32_t quantize_symbol(float y, float median) {
  return static_cast<int32_t>(std::lround(y - median));
}

inline LatentPlane tensor_to_symbols(const Tensor &y, const ModelCard &m) {
  LatentPlane p;
  p.h = y.h;
  p.w = y.w;
  p.c = y.c;
  p.symbols.resize(static_cast<size_t>(y.h) * y.w * y.c);
  for (int ch = 0; ch < y.c; ++ch)
    for (int iy = 0; iy < y.h; ++iy)
      for (int ix = 0; ix < y.w; ++ix)
        p.at(ch, iy, ix) = quantize_symbol(y.at(iy, ix, ch), m.medians[ch]);
  return p;
}

inline Tensor symbols_to_tensor(const LatentPlane &p, const ModelCard &m) {
  Tensor y;
  y.resize(p.h, p.w, p.c);
  for (int ch = 0; ch < p.c; ++ch)
    for (int iy = 0; iy < p.h; ++iy)
      for (int ix = 0; ix < p.w; ++ix)
        y.at(iy, ix, ch) = static_cast<float>(p.at(ch, iy, ix)) + m.medians[ch];
  return y;
}

// ---------------------------------------------------------------------------
// RDOQ: per-symbol candidate search {s-1, s, s+1} minimizing
//   J(s) = lambda * 255^2 * gain[c]/3 * (y_rel - s)^2 + bits(s)
// (the image-pixel-normalized RD loss restated per latent; gain[c] is the
// summed squared g_s response to a unit step in channel c, exported by
// flashgmm_tpu/standalone/export.py). Candidates falling outside the CDF
// table's in-range region keep the original symbol (the bypass escape is
// both rare and expensive to rate-model).
// ---------------------------------------------------------------------------

inline double symbol_bits(const ModelCard &m, int ch, int32_t s) {
  const int32_t *cdf = &m.cdfs[static_cast<size_t>(ch) * m.cdf_stride];
  const int32_t max_value = m.cdf_lengths[ch] - 2;
  const int32_t v = s - m.offsets[ch];
  if (v < 0 || v >= max_value) return 64.0;  // bypass escape: effectively "don't"
  const double p = static_cast<double>(cdf[v + 1] - cdf[v]) / 65536.0;
  return p > 0.0 ? -std::log2(p) : 64.0;
}

inline void rdoq_latent(LatentPlane &p, const Tensor &y, const ModelCard &m,
                        double lambda, int64_t *changed = nullptr) {
  int64_t n_changed = 0;
  for (int ch = 0; ch < p.c; ++ch) {
    const double w_d = lambda * 65025.0 * m.gains[ch] / 3.0;
    for (int iy = 0; iy < p.h; ++iy)
      for (int ix = 0; ix < p.w; ++ix) {
        const double rel = y.at(iy, ix, ch) - m.medians[ch];
        const int32_t s0 = p.at(ch, iy, ix);
        int32_t best = s0;
        double best_j = w_d * (rel - s0) * (rel - s0) + symbol_bits(m, ch, s0);
        for (int32_t s = s0 - 1; s <= s0 + 1; s += 2) {
          const double j = w_d * (rel - s) * (rel - s) + symbol_bits(m, ch, s);
          if (j < best_j) {
            best_j = j;
            best = s;
          }
        }
        if (best != s0) {
          p.at(ch, iy, ix) = best;
          ++n_changed;
        }
      }
  }
  if (changed) *changed = n_changed;
}

// ---------------------------------------------------------------------------
// Bitstream write / read
// ---------------------------------------------------------------------------

inline std::vector<char> active_channels(const LatentPlane &p) {
  std::vector<char> act(static_cast<size_t>(p.c), 0);
  for (int ch = 0; ch < p.c; ++ch) {
    const int32_t *s = &p.symbols[static_cast<size_t>(ch) * p.h * p.w];
    const size_t n = static_cast<size_t>(p.h) * p.w;
    for (size_t i = 0; i < n; ++i)
      if (s[i] != 0) {
        act[ch] = 1;
        break;
      }
  }
  return act;
}

inline bool write_bitstream(const std::string &path, const LatentPlane &p,
                            const ModelCard &m, int img_w, int img_h,
                            size_t *out_bytes = nullptr) {
  const auto act = active_channels(p);
  std::vector<int32_t> symbols, indexes;
  symbols.reserve(p.symbols.size());
  for (int ch = 0; ch < p.c; ++ch) {
    if (!act[ch]) continue;
    const int32_t *s = &p.symbols[static_cast<size_t>(ch) * p.h * p.w];
    const size_t n = static_cast<size_t>(p.h) * p.w;
    symbols.insert(symbols.end(), s, s + n);
    indexes.insert(indexes.end(), n, ch);
  }
  std::vector<uint8_t> body(symbols.size() * 8 + 65536);
  const int64_t body_len = fg_encode_with_indexes(
      symbols.data(), indexes.data(), static_cast<int64_t>(symbols.size()),
      m.cdfs.data(), m.cdf_stride, m.cdf_lengths.data(), m.offsets.data(),
      body.data(), static_cast<int64_t>(body.size()));
  if (body_len < 0) return false;

  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  f.write("FGSAB001", 8);
  const uint16_t wh[3] = {static_cast<uint16_t>(img_w),
                          static_cast<uint16_t>(img_h),
                          static_cast<uint16_t>(p.c)};
  f.write(reinterpret_cast<const char *>(wh), 6);
  const uint8_t down = static_cast<uint8_t>(m.down), flags = 1;
  f.write(reinterpret_cast<const char *>(&down), 1);
  f.write(reinterpret_cast<const char *>(&flags), 1);
  std::vector<uint8_t> bitmap((p.c + 7) / 8, 0);
  for (int ch = 0; ch < p.c; ++ch)
    if (act[ch]) bitmap[ch / 8] |= static_cast<uint8_t>(1u << (ch % 8));
  f.write(reinterpret_cast<const char *>(bitmap.data()),
          static_cast<std::streamsize>(bitmap.size()));
  const uint32_t blen = static_cast<uint32_t>(body_len);
  f.write(reinterpret_cast<const char *>(&blen), 4);
  f.write(reinterpret_cast<const char *>(body.data()), body_len);
  if (out_bytes) *out_bytes = 16 + bitmap.size() + 4 + static_cast<size_t>(body_len);
  return f.good();
}

inline bool read_bitstream(const std::string &path, const ModelCard &m,
                           LatentPlane &p, int *img_w, int *img_h) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[9] = {0};
  f.read(magic, 8);
  if (std::string(magic) != "FGSAB001") return false;
  uint16_t wh[3];
  f.read(reinterpret_cast<char *>(wh), 6);
  uint8_t down = 0, flags = 0;
  f.read(reinterpret_cast<char *>(&down), 1);
  f.read(reinterpret_cast<char *>(&flags), 1);
  *img_w = wh[0];
  *img_h = wh[1];
  const int M = wh[2];
  if (M != m.latent_channels || down != m.down) {
    std::fprintf(stderr, "[fgsc] bitstream/model mismatch (M=%d vs %d)\n", M,
                 m.latent_channels);
    return false;
  }
  p.c = M;
  p.h = (*img_h + m.down - 1) / m.down;
  p.w = (*img_w + m.down - 1) / m.down;
  p.symbols.assign(static_cast<size_t>(p.c) * p.h * p.w, 0);

  std::vector<uint8_t> bitmap((M + 7) / 8);
  f.read(reinterpret_cast<char *>(bitmap.data()),
         static_cast<std::streamsize>(bitmap.size()));
  uint32_t blen = 0;
  f.read(reinterpret_cast<char *>(&blen), 4);
  // sanity-check the untrusted length against the actual remaining file
  // size before allocating (a corrupt header must not trigger a 4 GiB
  // allocation attempt)
  const std::streampos body_start = f.tellg();
  f.seekg(0, std::ios::end);
  const std::streamoff remaining = f.tellg() - body_start;
  if (!f.good() || remaining < static_cast<std::streamoff>(blen)) {
    std::fprintf(stderr, "[fgsc] truncated/corrupt bitstream (body %u > %lld)\n",
                 blen, static_cast<long long>(remaining));
    return false;
  }
  f.seekg(body_start);
  std::vector<uint8_t> body(blen);
  f.read(reinterpret_cast<char *>(body.data()), blen);
  if (!f.good()) return false;

  std::vector<int32_t> indexes;
  for (int ch = 0; ch < M; ++ch)
    if (bitmap[ch / 8] & (1u << (ch % 8)))
      indexes.insert(indexes.end(), static_cast<size_t>(p.h) * p.w, ch);
  if (indexes.empty()) return true;
  std::vector<int32_t> decoded(indexes.size());
  if (fg_decode_with_indexes(body.data(), blen, indexes.data(),
                             static_cast<int64_t>(indexes.size()),
                             m.cdfs.data(), m.cdf_stride, m.cdf_lengths.data(),
                             m.offsets.data(), decoded.data()) < 0)
    return false;
  size_t pos = 0;
  for (int ch = 0; ch < M; ++ch) {
    if (!(bitmap[ch / 8] & (1u << (ch % 8)))) continue;
    int32_t *dst = &p.symbols[static_cast<size_t>(ch) * p.h * p.w];
    const size_t n = static_cast<size_t>(p.h) * p.w;
    std::copy(decoded.begin() + pos, decoded.begin() + pos + n, dst);
    pos += n;
  }
  return true;
}

}  // namespace fgsc
