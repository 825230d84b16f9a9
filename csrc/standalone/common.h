// Standalone codec: shared types, PPM I/O, model-card loader.
//
// TPU-framework-native analog of the reference's SADL standalone codec
// (compressai/sadl_codec/: build_codec.sh pipeline, encoder/decoder
// _generic/_float/_int16, readme.md workflow). Instead of exporting to
// ONNX and depending on an external inference library (the SADL git
// submodule, absent upstream), flashgmm_tpu exports a self-contained
// binary "model card" (tools: flashgmm_tpu/standalone/export.py) holding
// the g_a/g_s layer stack and the EntropyBottleneck's quantized CDF
// tables; this tiny interpreter (net.h) runs the network and the coder is
// the same rANS used everywhere else in the framework (csrc/rans.cpp).
//
// Design differences from the reference, on purpose:
//  - probability model = the trained EntropyBottleneck tables (exact same
//    tables the Python path codes with), not empirical CDFs re-estimated
//    from a training set (reference extract_cdf.cpp) — so the standalone
//    bitstream body is the same table-rANS format, and Python<->C++
//    interop is testable without a dataset.
//  - RDOQ measures distortion in latent space scaled by exported
//    per-channel synthesis gains (one g_s Jacobian probe at export time)
//    instead of running the decoder per candidate (reference rdoq.h) —
//    orders of magnitude cheaper at encode time.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace fgsc {

// Dense NHWC (N=1) float tensor.
struct Tensor {
  int h = 0, w = 0, c = 0;
  std::vector<float> data;  // [h, w, c] row-major

  void resize(int h_, int w_, int c_) {
    h = h_;
    w = w_;
    c = c_;
    data.assign(static_cast<size_t>(h) * w * c, 0.0f);
  }
  float &at(int y, int x, int ch) {
    return data[(static_cast<size_t>(y) * w + x) * c + ch];
  }
  float at(int y, int x, int ch) const {
    return data[(static_cast<size_t>(y) * w + x) * c + ch];
  }
  float *row(int y, int x) { return &data[(static_cast<size_t>(y) * w + x) * c]; }
  const float *row(int y, int x) const {
    return &data[(static_cast<size_t>(y) * w + x) * c];
  }
};

enum LayerType : int32_t {
  kConv = 0,
  kDeconv = 1,
  kGDN = 2,
  kIGDN = 3,
  kReLU = 4,
  kLeakyReLU = 5,
};

struct Layer {
  int32_t type = kConv;
  // conv / deconv
  int32_t kh = 0, kw = 0, in_ch = 0, out_ch = 0;
  int32_t stride = 1, padding = 0, output_padding = 0;
  std::vector<float> kernel;  // HWIO row-major [kh, kw, in_ch, out_ch]
  std::vector<float> bias;    // [out_ch]
  // gdn / igdn (post-reparametrization, effective values)
  std::vector<float> beta;   // [C]
  std::vector<float> gamma;  // [C, C] row-major, [out, in] orientation
  float slope = 0.01f;       // leaky_relu
};

struct ModelCard {
  std::vector<Layer> g_a;
  std::vector<Layer> g_s;
  int32_t latent_channels = 0;
  int32_t down = 16;  // image padding multiple (2^4 for 4 stride-2 convs)
  // EntropyBottleneck tables (same layout the Python coder uses)
  int32_t cdf_stride = 0;
  std::vector<int32_t> cdfs;         // [M, cdf_stride]
  std::vector<int32_t> cdf_lengths;  // [M]
  std::vector<int32_t> offsets;      // [M]
  std::vector<float> medians;        // [M]
  std::vector<float> gains;          // [M] per-channel synthesis energy (RDOQ)
};

// ---------------------------------------------------------------------------
// Model card format ("FGSAM001"): see flashgmm_tpu/standalone/export.py for
// the writer. All integers little-endian int32, floats IEEE f32.
// ---------------------------------------------------------------------------

namespace detail {

inline int32_t read_i32(std::ifstream &f) {
  int32_t v = 0;
  f.read(reinterpret_cast<char *>(&v), 4);
  return v;
}

inline void read_f32v(std::ifstream &f, std::vector<float> &v, size_t n) {
  v.resize(n);
  f.read(reinterpret_cast<char *>(v.data()), static_cast<std::streamsize>(n * 4));
}

inline void read_i32v(std::ifstream &f, std::vector<int32_t> &v, size_t n) {
  v.resize(n);
  f.read(reinterpret_cast<char *>(v.data()), static_cast<std::streamsize>(n * 4));
}

inline std::vector<Layer> read_layers(std::ifstream &f) {
  const int32_t n = read_i32(f);
  std::vector<Layer> layers(static_cast<size_t>(n));
  for (auto &L : layers) {
    L.type = read_i32(f);
    if (L.type == kConv || L.type == kDeconv) {
      L.kh = read_i32(f);
      L.kw = read_i32(f);
      L.in_ch = read_i32(f);
      L.out_ch = read_i32(f);
      L.stride = read_i32(f);
      L.padding = read_i32(f);
      L.output_padding = read_i32(f);
      read_f32v(f, L.kernel,
                static_cast<size_t>(L.kh) * L.kw * L.in_ch * L.out_ch);
      read_f32v(f, L.bias, static_cast<size_t>(L.out_ch));
    } else if (L.type == kGDN || L.type == kIGDN) {
      const int32_t c = read_i32(f);
      L.in_ch = L.out_ch = c;
      read_f32v(f, L.beta, static_cast<size_t>(c));
      read_f32v(f, L.gamma, static_cast<size_t>(c) * c);
    } else if (L.type == kLeakyReLU) {
      float s;
      f.read(reinterpret_cast<char *>(&s), 4);
      L.slope = s;
    }  // kReLU: no payload
  }
  return layers;
}

}  // namespace detail

inline bool load_model_card(const std::string &path, ModelCard &m) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[9] = {0};
  f.read(magic, 8);
  if (std::string(magic) != "FGSAM001") return false;
  m.latent_channels = detail::read_i32(f);
  m.down = detail::read_i32(f);
  m.g_a = detail::read_layers(f);
  m.g_s = detail::read_layers(f);
  const int32_t M = m.latent_channels;
  m.cdf_stride = detail::read_i32(f);
  detail::read_i32v(f, m.cdfs, static_cast<size_t>(M) * m.cdf_stride);
  detail::read_i32v(f, m.cdf_lengths, static_cast<size_t>(M));
  detail::read_i32v(f, m.offsets, static_cast<size_t>(M));
  detail::read_f32v(f, m.medians, static_cast<size_t>(M));
  detail::read_f32v(f, m.gains, static_cast<size_t>(M));
  return f.good();
}

// ---------------------------------------------------------------------------
// PPM (P6, maxval 255) I/O
// ---------------------------------------------------------------------------

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> data;  // [h, w, 3]
};

inline bool load_ppm(const std::string &path, Image &im) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string magic;
  f >> magic;
  if (magic != "P6") return false;
  // skip comments
  auto next_int = [&f]() {
    int v;
    while (f >> std::ws && f.peek() == '#') f.ignore(4096, '\n');
    f >> v;
    return v;
  };
  im.w = next_int();
  im.h = next_int();
  const int maxval = next_int();
  if (maxval != 255 || im.w <= 0 || im.h <= 0 || im.w > 16384 || im.h > 16384)
    return false;
  f.ignore(1);  // single whitespace after header
  im.data.resize(static_cast<size_t>(im.h) * im.w * 3);
  f.read(reinterpret_cast<char *>(im.data.data()),
         static_cast<std::streamsize>(im.data.size()));
  return f.good();
}

inline bool save_ppm(const std::string &path, const Image &im) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  f << "P6\n" << im.w << " " << im.h << "\n255\n";
  f.write(reinterpret_cast<const char *>(im.data.data()),
          static_cast<std::streamsize>(im.data.size()));
  return f.good();
}

inline Tensor image_to_tensor(const Image &im, int pad_multiple) {
  const int ph = (im.h + pad_multiple - 1) / pad_multiple * pad_multiple;
  const int pw = (im.w + pad_multiple - 1) / pad_multiple * pad_multiple;
  Tensor t;
  t.resize(ph, pw, 3);
  constexpr float kScale = 1.0f / 255.0f;
  for (int y = 0; y < im.h; ++y)
    for (int x = 0; x < im.w; ++x)
      for (int k = 0; k < 3; ++k)
        t.at(y, x, k) = im.data[(static_cast<size_t>(y) * im.w + x) * 3 + k] * kScale;
  // replicate-pad the right/bottom edges (better boundary statistics than
  // zeros; decoder crops so only reconstruction quality near edges is
  // affected)
  for (int y = 0; y < ph; ++y)
    for (int x = 0; x < pw; ++x) {
      if (y < im.h && x < im.w) continue;
      const int sy = y < im.h ? y : im.h - 1;
      const int sx = x < im.w ? x : im.w - 1;
      for (int k = 0; k < 3; ++k) t.at(y, x, k) = t.at(sy, sx, k);
    }
  return t;
}

inline Image tensor_to_image(const Tensor &t, int out_h, int out_w) {
  Image im;
  im.h = out_h;
  im.w = out_w;
  im.data.resize(static_cast<size_t>(out_h) * out_w * 3);
  for (int y = 0; y < out_h; ++y)
    for (int x = 0; x < out_w; ++x)
      for (int k = 0; k < 3; ++k) {
        float v = t.at(y, x, k) * 255.0f + 0.5f;
        v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
        im.data[(static_cast<size_t>(y) * im.w + x) * 3 + k] =
            static_cast<uint8_t>(v);
      }
  return im;
}

}  // namespace fgsc
