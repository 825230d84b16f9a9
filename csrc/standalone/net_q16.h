// Standalone codec: int16 quantized inference for conv/deconv stacks.
//
// Analog of the reference's int16 SADL engines
// (sadl_codec/{encoder,decoder}_int16.cpp + extract_quantizers.py), with a
// different quantizer design: instead of per-layer shifts calibrated on a
// training dataset, activations are quantized DYNAMICALLY per tensor
// (max|x| known exactly at runtime) and weights once at load. Shifts are
// chosen so the int32 accumulator provably cannot overflow:
//   |acc| <= max|x_q| * max_o sum_i |w_q[i,o]|  (any accumulation order)
// so  qa + qw <= 30 - ceil(log2(max|x| * maxL1(w))).
//
// Between convs the accumulator is dequantized to float and bias/ReLU
// applied there (the conv inner loop — all the FLOPs — stays int16*int16
// -> int32, which the compiler maps to vpmaddwd-class SIMD). Like the
// reference, the int16 path supports ReLU-family stacks only (GDN's
// rsqrt does not quantize well; the reference trains
// FactorizedPriorReLU for its int16 codec for the same reason).
#pragma once

#include <cmath>
#include <cstdint>

#include "common.h"
#include "net.h"

namespace fgsc {

struct QLayer {
  std::vector<int16_t> kernel;  // HWIO, scaled by 2^qw
  int qw = 0;
  float max_l1 = 0.0f;  // max over o of sum_i |w[i,o]| (float weights)
};

inline int ilog2_ceil(float v) {
  return v > 0.0f ? static_cast<int>(std::ceil(std::log2(v))) : -30;
}

inline QLayer quantize_weights(const Layer &L) {
  QLayer q;
  float max_w = 0.0f;
  for (float w : L.kernel) max_w = std::max(max_w, std::fabs(w));
  q.qw = std::min(14 - ilog2_ceil(max_w), 20);  // |w_q| <= 2^14
  const float scale = std::ldexp(1.0f, q.qw);
  q.kernel.resize(L.kernel.size());
  for (size_t i = 0; i < L.kernel.size(); ++i)
    q.kernel[i] = static_cast<int16_t>(std::lround(L.kernel[i] * scale));
  // L1 bound per output channel over the full receptive field
  const int ic = L.in_ch, oc = L.out_ch;
  std::vector<float> l1(static_cast<size_t>(oc), 0.0f);
  for (size_t i = 0; i < L.kernel.size(); ++i)
    l1[i % oc] += std::fabs(L.kernel[i]);
  for (float v : l1) q.max_l1 = std::max(q.max_l1, v);
  (void)ic;
  return q;
}

// Quantize an activation tensor; returns the chosen shift qa.
inline int quantize_activations(const Tensor &x, const QLayer &q,
                                std::vector<int16_t> &out) {
  float max_x = 0.0f;
  for (float v : x.data) max_x = std::max(max_x, std::fabs(v));
  int qa = 15 - 1 - ilog2_ceil(max_x);                       // |x_q| < 2^14
  const int acc_budget = 30 - ilog2_ceil(max_x * q.max_l1);  // no i32 overflow
  qa = std::min(qa, acc_budget - q.qw);
  qa = std::max(std::min(qa, 20), -20);
  const float scale = std::ldexp(1.0f, qa);
  out.resize(x.data.size());
  for (size_t i = 0; i < x.data.size(); ++i)
    out[i] = static_cast<int16_t>(std::lround(x.data[i] * scale));
  return qa;
}

inline Tensor conv2d_q16(const Tensor &in, const Layer &L, const QLayer &q) {
  std::vector<int16_t> xq;
  const int qa = quantize_activations(in, q, xq);
  const float deq = std::ldexp(1.0f, -(qa + q.qw));
  const int s = L.stride, p = L.padding;
  const int oh = (in.h + 2 * p - L.kh) / s + 1;
  const int ow = (in.w + 2 * p - L.kw) / s + 1;
  Tensor out;
  out.resize(oh, ow, L.out_ch);
  const int ic = L.in_ch, oc = L.out_ch;
  // Row-strip accumulator + tap-outer loop order for weight-slice reuse
  // (see conv2d in net.h).
  std::vector<int32_t> acc(static_cast<size_t>(ow) * oc);
  for (int oy = 0; oy < oh; ++oy) {
    std::fill(acc.begin(), acc.end(), 0);
    for (int dy = 0; dy < L.kh; ++dy) {
      const int iy = oy * s + dy - p;
      if (iy < 0 || iy >= in.h) continue;
      for (int dx = 0; dx < L.kw; ++dx) {
        const int16_t *w =
            &q.kernel[(static_cast<size_t>(dy) * L.kw + dx) * ic * oc];
        int ox0 = dx - p < 0 ? (p - dx + s - 1) / s : 0;
        int ox1 = ow;
        while (ox1 > ox0 && (ox1 - 1) * s + dx - p >= in.w) --ox1;
        for (int ox = ox0; ox < ox1; ++ox) {
          const int16_t *px =
              &xq[(static_cast<size_t>(iy) * in.w + ox * s + dx - p) * ic];
          dot_accumulate(px, ic, w, oc, &acc[static_cast<size_t>(ox) * oc], oc);
        }
      }
    }
    float *dst = out.row(oy, 0);
    for (int ox = 0; ox < ow; ++ox)
      for (int o = 0; o < oc; ++o)
        dst[static_cast<size_t>(ox) * oc + o] =
            acc[static_cast<size_t>(ox) * oc + o] * deq + L.bias[o];
  }
  return out;
}

inline Tensor conv_transpose2d_q16(const Tensor &in, const Layer &L,
                                   const QLayer &q) {
  std::vector<int16_t> xq;
  const int qa = quantize_activations(in, q, xq);
  const float deq = std::ldexp(1.0f, -(qa + q.qw));
  const int s = L.stride, p = L.padding;
  const int oh = (in.h - 1) * s - 2 * p + L.kh + L.output_padding;
  const int ow = (in.w - 1) * s - 2 * p + L.kw + L.output_padding;
  const int ic = L.in_ch, oc = L.out_ch;
  std::vector<int32_t> acc(static_cast<size_t>(oh) * ow * oc, 0);
  // Tap-outer loop order for weight-slice reuse (see conv_transpose2d in
  // net.h).
  for (int iy = 0; iy < in.h; ++iy) {
    for (int dy = 0; dy < L.kh; ++dy) {
      const int oy = iy * s + dy - p;
      if (oy < 0 || oy >= oh) continue;
      for (int dx = 0; dx < L.kw; ++dx) {
        const int16_t *w =
            &q.kernel[(static_cast<size_t>(dy) * L.kw + dx) * ic * oc];
        int ix0 = dx - p < 0 ? (p - dx + s - 1) / s : 0;
        int ix1 = in.w;
        while (ix1 > ix0 && (ix1 - 1) * s + dx - p >= ow) --ix1;
        for (int ix = ix0; ix < ix1; ++ix) {
          const int16_t *px = &xq[(static_cast<size_t>(iy) * in.w + ix) * ic];
          int32_t *a =
              &acc[(static_cast<size_t>(oy) * ow + ix * s + dx - p) * oc];
          dot_accumulate(px, ic, w, oc, a, oc);
        }
      }
    }
  }
  Tensor out;
  out.resize(oh, ow, oc);
  for (size_t j = 0; j < acc.size(); ++j)
    out.data[j] = acc[j] * deq + L.bias[j % oc];
  return out;
}

// Returns false if the stack contains layers the int16 path cannot run
// (GDN/IGDN) — caller falls back to the float interpreter.
inline bool stack_supports_q16(const std::vector<Layer> &layers) {
  for (const auto &L : layers)
    if (L.type == kGDN || L.type == kIGDN) return false;
  return true;
}

inline Tensor run_stack_q16(const std::vector<Layer> &layers, Tensor x) {
  for (const auto &L : layers) {
    switch (L.type) {
      case kConv: {
        const QLayer q = quantize_weights(L);
        x = conv2d_q16(x, L, q);
        break;
      }
      case kDeconv: {
        const QLayer q = quantize_weights(L);
        x = conv_transpose2d_q16(x, L, q);
        break;
      }
      case kReLU:
        relu_inplace(x);
        break;
      case kLeakyReLU:
        leaky_relu_inplace(x, L.slope);
        break;
      default:
        std::fprintf(stderr, "[fgsc] int16 path: unsupported layer %d\n",
                     L.type);
        std::exit(2);
    }
  }
  return x;
}

}  // namespace fgsc
