// fgsc_encode: standalone image encoder.
//
//   fgsc_encode [--int16] model.fgsam image.ppm bitstream.fgs [lambda]
//
// PPM in -> pad -> g_a (float interpreter, or int16 with --int16 on
// ReLU-family stacks; net_q16.h) -> round(y - median) symbols
// -> optional RDOQ (if lambda given) -> table-rANS bitstream.
// cf. reference compressai/sadl_codec/encoder_generic.h:301-355 (same CLI
// shape: image, bitstream, optional RDOQ lambda; the reference builds
// separate _float/_int16 binaries, here it is a flag).

#include <chrono>
#include <cstdio>
#include <cstring>

#include "codec.h"
#include "common.h"
#include "net.h"
#include "net_q16.h"

int main(int argc, char **argv) {
  bool int16_mode = false;
  for (int i = 1; i < argc; ++i)
    if (std::strcmp(argv[i], "--int16") == 0) {
      int16_mode = true;
      for (int j = i; j + 1 < argc; ++j) argv[j] = argv[j + 1];
      --argc;
      break;
    }
  if (argc != 4 && argc != 5) {
    std::printf(
        "usage: %s [--int16] model.fgsam image.ppm bitstream.fgs [lambda]\n"
        "  lambda: enable latent RDOQ with the given RD weight\n"
        "  --int16: quantized inference (ReLU stacks only)\n",
        argv[0]);
    return 1;
  }
  fgsc::ModelCard m;
  if (!fgsc::load_model_card(argv[1], m)) {
    std::fprintf(stderr, "[fgsc] cannot load model card %s\n", argv[1]);
    return 2;
  }
  fgsc::Image im;
  if (!fgsc::load_ppm(argv[2], im)) {
    std::fprintf(stderr, "[fgsc] cannot load PPM %s\n", argv[2]);
    return 2;
  }

  if (int16_mode && !fgsc::stack_supports_q16(m.g_a)) {
    std::fprintf(stderr,
                 "[fgsc] --int16 needs a ReLU-family g_a (GDN present); "
                 "falling back to float\n");
    int16_mode = false;
  }
  const auto t0 = std::chrono::steady_clock::now();
  fgsc::Tensor x = fgsc::image_to_tensor(im, m.down);
  fgsc::Tensor y = int16_mode ? fgsc::run_stack_q16(m.g_a, std::move(x))
                              : fgsc::run_stack(m.g_a, std::move(x));
  const auto t1 = std::chrono::steady_clock::now();
  std::printf("[fgsc] g_a(%s): %dx%dx%d -> %dx%dx%d in %.0f ms\n",
              int16_mode ? "int16" : "float", im.h, im.w, 3, y.h, y.w, y.c,
              std::chrono::duration<double, std::milli>(t1 - t0).count());

  fgsc::LatentPlane p = fgsc::tensor_to_symbols(y, m);
  if (argc == 5) {
    const double lambda = std::atof(argv[4]);
    int64_t changed = 0;
    fgsc::rdoq_latent(p, y, m, lambda, &changed);
    std::printf("[fgsc] rdoq(lambda=%g): %lld symbols adjusted\n", lambda,
                static_cast<long long>(changed));
  }

  size_t nbytes = 0;
  if (!fgsc::write_bitstream(argv[3], p, m, im.w, im.h, &nbytes)) {
    std::fprintf(stderr, "[fgsc] bitstream write failed\n");
    return 3;
  }
  std::printf("[fgsc] wrote %s: %zu bytes, %.4f bpp\n", argv[3], nbytes,
              8.0 * static_cast<double>(nbytes) / (im.w * im.h));
  return 0;
}
