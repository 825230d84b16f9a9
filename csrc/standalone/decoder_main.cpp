// fgsc_decode: standalone image decoder.
//
//   fgsc_decode [--int16] model.fgsam bitstream.fgs image.ppm
//
// Bitstream -> table-rANS decode symbols -> + medians -> g_s (float
// interpreter, or int16 with --int16 on ReLU-family stacks; net_q16.h)
// -> crop to original size -> PPM.
// cf. reference compressai/sadl_codec/decoder_generic.h:202-220.

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
  if (argc != 4) {
    std::printf("usage: %s [--int16] model.fgsam bitstream.fgs image.ppm\n",
                argv[0]);
    return 1;
  }
  fgsc::ModelCard m;
  if (!fgsc::load_model_card(argv[1], m)) {
    std::fprintf(stderr, "[fgsc] cannot load model card %s\n", argv[1]);
    return 2;
  }
  fgsc::LatentPlane p;
  int img_w = 0, img_h = 0;
  if (!fgsc::read_bitstream(argv[2], m, p, &img_w, &img_h)) {
    std::fprintf(stderr, "[fgsc] cannot read bitstream %s\n", argv[2]);
    return 2;
  }

  if (int16_mode && !fgsc::stack_supports_q16(m.g_s)) {
    std::fprintf(stderr,
                 "[fgsc] --int16 needs a ReLU-family g_s (GDN present); "
                 "falling back to float\n");
    int16_mode = false;
  }
  const auto t0 = std::chrono::steady_clock::now();
  fgsc::Tensor y_hat = fgsc::symbols_to_tensor(p, m);
  fgsc::Tensor x_hat = int16_mode
                           ? fgsc::run_stack_q16(m.g_s, std::move(y_hat))
                           : fgsc::run_stack(m.g_s, std::move(y_hat));
  const auto t1 = std::chrono::steady_clock::now();
  std::printf("[fgsc] g_s(%s): %dx%dx%d -> %dx%dx%d in %.0f ms\n",
              int16_mode ? "int16" : "float", p.h, p.w, p.c, x_hat.h, x_hat.w,
              x_hat.c,
              std::chrono::duration<double, std::milli>(t1 - t0).count());

  const fgsc::Image im = fgsc::tensor_to_image(x_hat, img_h, img_w);
  if (!fgsc::save_ppm(argv[3], im)) {
    std::fprintf(stderr, "[fgsc] cannot write PPM %s\n", argv[3]);
    return 3;
  }
  std::printf("[fgsc] wrote %s (%dx%d)\n", argv[3], img_w, img_h);
  return 0;
}
