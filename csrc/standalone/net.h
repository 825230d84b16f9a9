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
//
// Performance: all three O(C^2)-per-pixel ops (conv taps, deconv taps,
// the GDN norm) funnel through one register-blocked kernel,
// dot_accumulate(). The naive formulation streams the output-channel
// accumulator through L1 once per *input channel* (1 FMA per load+store
// — store-port bound) and, for the GDN reduction, cannot vectorize at
// all without float reassociation. Blocking OB accumulators into
// registers across the whole input-channel loop makes every variant
// FMA-bound instead (OB=64 → 4 zmm / 8 ymm accumulators).
#pragma once

#include <cmath>

#include "common.h"

namespace fgsc {

// out[j] += sum_i x[i] * w[i*stride + j]  for j in [0, OB), OB compile-time.
// The accumulator block lives in SIMD registers for the whole i-loop.
template <int OB, typename TA, typename TX, typename TW>
inline void dot_block(const TX *x, int n_in, const TW *w, int stride,
                      TA *out) {
  TA acc[OB];
  for (int j = 0; j < OB; ++j) acc[j] = out[j];
  for (int i = 0; i < n_in; ++i) {
    const TA v = static_cast<TA>(x[i]);
    const TW *wr = w + static_cast<size_t>(i) * stride;
    for (int j = 0; j < OB; ++j) acc[j] += v * static_cast<TA>(wr[j]);
  }
  for (int j = 0; j < OB; ++j) out[j] = acc[j];
}

// Two output pixels sharing one weight stream. The single-pixel kernel
// does one weight load per FMA (load-port bound); amortizing each loaded
// weight vector over two input pixels roughly doubles arithmetic per
// load. Accumulation order per output element is unchanged (bit-exact
// vs two dot_block calls).
template <int OB, typename TA, typename TX, typename TW>
inline void dot_block2(const TX *xa, const TX *xb, int n_in, const TW *w,
                       int stride, TA *oa, TA *ob) {
  TA acca[OB], accb[OB];
  for (int j = 0; j < OB; ++j) {
    acca[j] = oa[j];
    accb[j] = ob[j];
  }
  for (int i = 0; i < n_in; ++i) {
    const TA va = static_cast<TA>(xa[i]);
    const TA vb = static_cast<TA>(xb[i]);
    const TW *wr = w + static_cast<size_t>(i) * stride;
    for (int j = 0; j < OB; ++j) {
      const TA wv = static_cast<TA>(wr[j]);
      acca[j] += va * wv;
      accb[j] += vb * wv;
    }
  }
  for (int j = 0; j < OB; ++j) {
    oa[j] = acca[j];
    ob[j] = accb[j];
  }
}

// out[j] += sum_i x[i] * w[i*stride + j]  for j in [0, n_out).
// TA=float/TX=float/TW=float for the float engine; TA=int32_t with
// int16 x/w for the quantized engine (net_q16.h).
template <typename TA, typename TX, typename TW>
inline void dot_accumulate(const TX *x, int n_in, const TW *w, int stride,
                           TA *out, int n_out) {
  int j = 0;
  for (; j + 64 <= n_out; j += 64)
    dot_block<64>(x, n_in, w + j, stride, out + j);
  if (j + 32 <= n_out) {
    dot_block<32>(x, n_in, w + j, stride, out + j);
    j += 32;
  }
  if (j + 16 <= n_out) {
    dot_block<16>(x, n_in, w + j, stride, out + j);
    j += 16;
  }
  for (; j < n_out; ++j) {
    TA acc = out[j];
    for (int i = 0; i < n_in; ++i)
      acc += static_cast<TA>(x[i]) *
             static_cast<TA>(w[static_cast<size_t>(i) * stride + j]);
    out[j] = acc;
  }
}

// Pixel-pair variant of dot_accumulate (same blocking, shared weights).
template <typename TA, typename TX, typename TW>
inline void dot_accumulate2(const TX *xa, const TX *xb, int n_in,
                            const TW *w, int stride, TA *oa, TA *ob,
                            int n_out) {
  int j = 0;
  for (; j + 32 <= n_out; j += 32)
    dot_block2<32>(xa, xb, n_in, w + j, stride, oa + j, ob + j);
  if (j + 16 <= n_out) {
    dot_block2<16>(xa, xb, n_in, w + j, stride, oa + j, ob + j);
    j += 16;
  }
  if (j < n_out) {
    dot_accumulate(xa, n_in, w + j, stride, oa + j, n_out - j);
    dot_accumulate(xb, n_in, w + j, stride, ob + j, n_out - j);
  }
}

// Four output pixels sharing one weight stream (FMA:weight-load 4:1).
template <int OB, typename TA, typename TX, typename TW>
inline void dot_block4(const TX *const x[4], int n_in, const TW *w,
                       int stride, TA *const out[4]) {
  TA acc[4][OB];
  for (int p = 0; p < 4; ++p)
    for (int j = 0; j < OB; ++j) acc[p][j] = out[p][j];
  for (int i = 0; i < n_in; ++i) {
    const TA v0 = static_cast<TA>(x[0][i]);
    const TA v1 = static_cast<TA>(x[1][i]);
    const TA v2 = static_cast<TA>(x[2][i]);
    const TA v3 = static_cast<TA>(x[3][i]);
    const TW *wr = w + static_cast<size_t>(i) * stride;
    for (int j = 0; j < OB; ++j) {
      const TA wv = static_cast<TA>(wr[j]);
      acc[0][j] += v0 * wv;
      acc[1][j] += v1 * wv;
      acc[2][j] += v2 * wv;
      acc[3][j] += v3 * wv;
    }
  }
  for (int p = 0; p < 4; ++p)
    for (int j = 0; j < OB; ++j) out[p][j] = acc[p][j];
}

template <typename TA, typename TX, typename TW>
inline void dot_accumulate4(const TX *const x[4], int n_in, const TW *w,
                            int stride, TA *const out[4], int n_out) {
  int j = 0;
  for (; j + 16 <= n_out; j += 16) {
    TA *o[4] = {out[0] + j, out[1] + j, out[2] + j, out[3] + j};
    dot_block4<16>(x, n_in, w + j, stride, o);
  }
  if (j < n_out)
    for (int p = 0; p < 4; ++p)
      dot_accumulate(x[p], n_in, w + j, stride, out[p] + j, n_out - j);
}

// out[o] += dot(x, wt[o*n_in : o*n_in+n_in]) for o in [0, n_out) with
// CONTIGUOUS per-output weights (wt is the tap transposed to [o, i]).
// For n_out below a register block (e.g. the final 3-channel synthesis
// conv), the column-blocked kernel above degrades to a scalar strided
// reduction; here the reduction is split into 16 independent partials so
// it vectorizes without float reassociation.
template <typename TX, typename TW>
inline void dot_rows_contig(const TX *x, int n_in, const TW *wt, float *out,
                            int n_out) {
  for (int o = 0; o < n_out; ++o) {
    const TW *wr = wt + static_cast<size_t>(o) * n_in;
    float part[16] = {0.0f};
    int i = 0;
    for (; i + 16 <= n_in; i += 16)
      for (int k = 0; k < 16; ++k)
        part[k] += static_cast<float>(x[i + k]) * static_cast<float>(wr[i + k]);
    float acc = out[o];
    for (; i < n_in; ++i)
      acc += static_cast<float>(x[i]) * static_cast<float>(wr[i]);
    for (int k = 0; k < 16; ++k) acc += part[k];
    out[o] = acc;
  }
}

// Transpose one [ic, oc] tap slice to [oc, ic] (tiny; done once per tap).
inline void transpose_tap(const float *w, int ic, int oc,
                          std::vector<float> &wt) {
  wt.resize(static_cast<size_t>(ic) * oc);
  for (int i = 0; i < ic; ++i)
    for (int o = 0; o < oc; ++o)
      wt[static_cast<size_t>(o) * ic + i] = w[static_cast<size_t>(i) * oc + o];
}

// out[oy,ox,o] = sum_{dy,dx,i} in[oy*s+dy-p, ox*s+dx-p, i] * w[dy,dx,i,o]
//
// Loop order oy → (dy,dx) → ox so each tap's [ic,oc] weight slice (e.g.
// 64 KB at 128×128) is reused across the whole output row from L1/L2;
// pixel-outer order would re-stream the full multi-MB kernel per pixel.
inline Tensor conv2d(const Tensor &in, const Layer &L) {
  const int s = L.stride, p = L.padding;
  const int oh = (in.h + 2 * p - L.kh) / s + 1;
  const int ow = (in.w + 2 * p - L.kw) / s + 1;
  Tensor out;
  out.resize(oh, ow, L.out_ch);
  const int ic = L.in_ch, oc = L.out_ch;
  // small-oc layers: transpose every tap once, outside the row loop
  std::vector<std::vector<float>> wt_taps;
  if (oc < 16) {
    wt_taps.resize(static_cast<size_t>(L.kh) * L.kw);
    for (int t = 0; t < L.kh * L.kw; ++t)
      transpose_tap(&L.kernel[static_cast<size_t>(t) * ic * oc], ic, oc,
                    wt_taps[t]);
  }
  for (int oy = 0; oy < oh; ++oy) {
    float *orow = out.row(oy, 0);
    for (int ox = 0; ox < ow; ++ox)
      for (int o = 0; o < oc; ++o) orow[static_cast<size_t>(ox) * oc + o] = L.bias[o];
    for (int dy = 0; dy < L.kh; ++dy) {
      const int iy = oy * s + dy - p;
      if (iy < 0 || iy >= in.h) continue;
      for (int dx = 0; dx < L.kw; ++dx) {
        const float *w =
            &L.kernel[(static_cast<size_t>(dy) * L.kw + dx) * ic * oc];
        // valid ox range for this tap: 0 <= ox*s + dx - p < in.w
        int ox0 = dx - p < 0 ? (p - dx + s - 1) / s : 0;
        int ox1 = ow;
        while (ox1 > ox0 && (ox1 - 1) * s + dx - p >= in.w) --ox1;
        if (oc < 16) {
          const float *wt = wt_taps[static_cast<size_t>(dy) * L.kw + dx].data();
          for (int ox = ox0; ox < ox1; ++ox)
            dot_rows_contig(in.row(iy, ox * s + dx - p), ic, wt,
                            orow + static_cast<size_t>(ox) * oc, oc);
        } else {
          int ox = ox0;
          for (; ox + 3 < ox1; ox += 4) {
            const float *x4[4];
            float *o4[4];
            for (int p4 = 0; p4 < 4; ++p4) {
              x4[p4] = in.row(iy, (ox + p4) * s + dx - p);
              o4[p4] = orow + static_cast<size_t>(ox + p4) * oc;
            }
            dot_accumulate4(x4, ic, w, oc, o4, oc);
          }
          for (; ox + 1 < ox1; ox += 2)
            dot_accumulate2(in.row(iy, ox * s + dx - p),
                            in.row(iy, (ox + 1) * s + dx - p), ic, w, oc,
                            orow + static_cast<size_t>(ox) * oc,
                            orow + static_cast<size_t>(ox + 1) * oc, oc);
          if (ox < ox1)
            dot_accumulate(in.row(iy, ox * s + dx - p), ic, w, oc,
                           orow + static_cast<size_t>(ox) * oc, oc);
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
  std::vector<std::vector<float>> wt_taps;
  if (oc < 16) {
    wt_taps.resize(static_cast<size_t>(L.kh) * L.kw);
    for (int t = 0; t < L.kh * L.kw; ++t)
      transpose_tap(&L.kernel[static_cast<size_t>(t) * ic * oc], ic, oc,
                    wt_taps[t]);
  }
  for (int oy = 0; oy < oh; ++oy)
    for (int ox = 0; ox < ow; ++ox) {
      float *acc = out.row(oy, ox);
      for (int o = 0; o < oc; ++o) acc[o] = L.bias[o];
    }
  // Loop order iy → (dy,dx) → ix: one output row per (iy,dy), with the
  // tap's weight slice reused across the row (same rationale as conv2d).
  for (int iy = 0; iy < in.h; ++iy) {
    for (int dy = 0; dy < L.kh; ++dy) {
      const int oy = iy * s + dy - p;
      if (oy < 0 || oy >= oh) continue;
      for (int dx = 0; dx < L.kw; ++dx) {
        const float *w =
            &L.kernel[(static_cast<size_t>(dy) * L.kw + dx) * ic * oc];
        // valid ix range for this tap: 0 <= ix*s + dx - p < ow
        int ix0 = dx - p < 0 ? (p - dx + s - 1) / s : 0;
        int ix1 = in.w;
        while (ix1 > ix0 && (ix1 - 1) * s + dx - p >= ow) --ix1;
        if (oc < 16) {
          const float *wt = wt_taps[static_cast<size_t>(dy) * L.kw + dx].data();
          for (int ix = ix0; ix < ix1; ++ix)
            dot_rows_contig(in.row(iy, ix), ic, wt,
                            out.row(oy, ix * s + dx - p), oc);
        } else {
          int ix = ix0;
          for (; ix + 3 < ix1; ix += 4) {
            const float *x4[4];
            float *o4[4];
            for (int p4 = 0; p4 < 4; ++p4) {
              x4[p4] = in.row(iy, ix + p4);
              o4[p4] = out.row(oy, (ix + p4) * s + dx - p);
            }
            dot_accumulate4(x4, ic, w, oc, o4, oc);
          }
          for (; ix + 1 < ix1; ix += 2)
            dot_accumulate2(in.row(iy, ix), in.row(iy, ix + 1), ic, w, oc,
                            out.row(oy, ix * s + dx - p),
                            out.row(oy, (ix + 1) * s + dx - p), oc);
          if (ix < ix1)
            dot_accumulate(in.row(iy, ix), ic, w, oc,
                           out.row(oy, ix * s + dx - p), oc);
        }
      }
    }
  }
  return out;
}

// y[o] = x[o] * rsqrt(beta[o] + sum_i gamma[o,i] * x[i]^2)   (GDN)
// y[o] = x[o] *  sqrt(beta[o] + sum_i gamma[o,i] * x[i]^2)   (inverse GDN)
// gamma is stored [o, i]; transpose once per call so the per-pixel norm is
// the same i-outer blocked dot as the convs (the [o,i] orientation is a
// length-c reduction per o, which strict float semantics keep scalar).
inline void gdn_inplace(Tensor &t, const Layer &L, bool inverse) {
  const int c = t.c;
  std::vector<float> gamma_t(static_cast<size_t>(c) * c);
  for (int o = 0; o < c; ++o)
    for (int i = 0; i < c; ++i)
      gamma_t[static_cast<size_t>(i) * c + o] =
          L.gamma[static_cast<size_t>(o) * c + i];
  std::vector<float> sq(static_cast<size_t>(c));
  std::vector<float> norm(static_cast<size_t>(c));
  for (int y = 0; y < t.h; ++y) {
    for (int x = 0; x < t.w; ++x) {
      float *px = t.row(y, x);
      for (int i = 0; i < c; ++i) sq[i] = px[i] * px[i];
      for (int o = 0; o < c; ++o) norm[o] = L.beta[o];
      dot_accumulate(sq.data(), c, gamma_t.data(), c, norm.data(), c);
      for (int o = 0; o < c; ++o)
        px[o] = inverse ? px[o] * std::sqrt(norm[o])
                        : px[o] / std::sqrt(norm[o]);
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
