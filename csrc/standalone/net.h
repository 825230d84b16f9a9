// Standalone codec: tiny NHWC float inference interpreter for the exported
// g_a / g_s layer stacks (conv, transposed conv, GDN/IGDN, ReLU variants).
//
// Matches the JAX layer semantics exactly in structure (torch-style
// explicit padding, transposed conv as the adjoint of the strided conv,
// GDN as y = x * rsqrt(beta + gamma @ x^2)); floats agree with XLA to
// normal accumulation-order tolerance, which is all the codec needs — the
// bitstream only depends on the rounded integer latent the *encoder*
// produced, and the decoder decodes those exactly (rANS is lossless).
//
// cf. reference compressai/sadl_codec/{encoder,decoder}_generic.h which
// delegate inference to the SADL library; here the interpreter is ~150
// lines because the exported graphs are straight-line conv stacks.
#pragma once

#include <cmath>

#include "common.h"

namespace fgsc {

// out[oy,ox,o] = sum_{dy,dx,i} in[oy*s+dy-p, ox*s+dx-p, i] * w[dy,dx,i,o]
inline Tensor conv2d(const Tensor &in, const Layer &L) {
  const int s = L.stride, p = L.padding;
  const int oh = (in.h + 2 * p - L.kh) / s + 1;
  const int ow = (in.w + 2 * p - L.kw) / s + 1;
  Tensor out;
  out.resize(oh, ow, L.out_ch);
  const int ic = L.in_ch, oc = L.out_ch;
  for (int oy = 0; oy < oh; ++oy) {
    for (int ox = 0; ox < ow; ++ox) {
      float *acc = out.row(oy, ox);
      for (int o = 0; o < oc; ++o) acc[o] = L.bias[o];
      for (int dy = 0; dy < L.kh; ++dy) {
        const int iy = oy * s + dy - p;
        if (iy < 0 || iy >= in.h) continue;
        for (int dx = 0; dx < L.kw; ++dx) {
          const int ix = ox * s + dx - p;
          if (ix < 0 || ix >= in.w) continue;
          const float *px = in.row(iy, ix);
          const float *w = &L.kernel[(static_cast<size_t>(dy) * L.kw + dx) * ic * oc];
          for (int i = 0; i < ic; ++i) {
            const float v = px[i];
            const float *wo = w + static_cast<size_t>(i) * oc;
            for (int o = 0; o < oc; ++o) acc[o] += v * wo[o];  // vectorizes
          }
        }
      }
    }
  }
  return out;
}

// Adjoint of conv2d (torch ConvTranspose2d semantics; cf. layers.py
// ConvTranspose2d which realizes it as an input-dilated conv in XLA):
// out[oy,ox,o] += in[iy,ix,i] * w[dy,dx,i,o]  where  oy = iy*s + dy - p.
// Scatter formulation: iterate input pixels, accumulate into the output
// window — no divisibility tests in the hot loop.
inline Tensor conv_transpose2d(const Tensor &in, const Layer &L) {
  const int s = L.stride, p = L.padding;
  const int oh = (in.h - 1) * s - 2 * p + L.kh + L.output_padding;
  const int ow = (in.w - 1) * s - 2 * p + L.kw + L.output_padding;
  Tensor out;
  out.resize(oh, ow, L.out_ch);
  const int ic = L.in_ch, oc = L.out_ch;
  for (int oy = 0; oy < oh; ++oy)
    for (int ox = 0; ox < ow; ++ox) {
      float *acc = out.row(oy, ox);
      for (int o = 0; o < oc; ++o) acc[o] = L.bias[o];
    }
  for (int iy = 0; iy < in.h; ++iy) {
    for (int ix = 0; ix < in.w; ++ix) {
      const float *px = in.row(iy, ix);
      for (int dy = 0; dy < L.kh; ++dy) {
        const int oy = iy * s + dy - p;
        if (oy < 0 || oy >= oh) continue;
        for (int dx = 0; dx < L.kw; ++dx) {
          const int ox = ix * s + dx - p;
          if (ox < 0 || ox >= ow) continue;
          float *acc = out.row(oy, ox);
          const float *w = &L.kernel[(static_cast<size_t>(dy) * L.kw + dx) * ic * oc];
          for (int i = 0; i < ic; ++i) {
            const float v = px[i];
            const float *wo = w + static_cast<size_t>(i) * oc;
            for (int o = 0; o < oc; ++o) acc[o] += v * wo[o];
          }
        }
      }
    }
  }
  return out;
}

// y[o] = x[o] * rsqrt(beta[o] + sum_i gamma[o,i] * x[i]^2)   (GDN)
// y[o] = x[o] *  sqrt(beta[o] + sum_i gamma[o,i] * x[i]^2)   (inverse GDN)
inline void gdn_inplace(Tensor &t, const Layer &L, bool inverse) {
  const int c = t.c;
  std::vector<float> sq(static_cast<size_t>(c));
  for (int y = 0; y < t.h; ++y) {
    for (int x = 0; x < t.w; ++x) {
      float *px = t.row(y, x);
      for (int i = 0; i < c; ++i) sq[i] = px[i] * px[i];
      for (int o = 0; o < c; ++o) {
        const float *g = &L.gamma[static_cast<size_t>(o) * c];
        float norm = L.beta[o];
        for (int i = 0; i < c; ++i) norm += g[i] * sq[i];
        px[o] = inverse ? px[o] * std::sqrt(norm) : px[o] / std::sqrt(norm);
      }
    }
  }
}

inline void relu_inplace(Tensor &t) {
  for (auto &v : t.data)
    if (v < 0.0f) v = 0.0f;
}

inline void leaky_relu_inplace(Tensor &t, float slope) {
  for (auto &v : t.data)
    if (v < 0.0f) v *= slope;
}

inline Tensor run_stack(const std::vector<Layer> &layers, Tensor x) {
  for (const auto &L : layers) {
    switch (L.type) {
      case kConv:
        x = conv2d(x, L);
        break;
      case kDeconv:
        x = conv_transpose2d(x, L);
        break;
      case kGDN:
        gdn_inplace(x, L, /*inverse=*/false);
        break;
      case kIGDN:
        gdn_inplace(x, L, /*inverse=*/true);
        break;
      case kReLU:
        relu_inplace(x);
        break;
      case kLeakyReLU:
        leaky_relu_inplace(x, L.slope);
        break;
      default:
        std::fprintf(stderr, "[fgsc] unknown layer type %d\n", L.type);
        std::exit(2);
    }
  }
  return x;
}

}  // namespace fgsc
