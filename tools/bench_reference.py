"""Apples-to-apples benchmark: the ACTUAL reference FlashGMM network on the
same held-out dead-leaves content, same weights, same machine.

Loads the trained flagship weights (weights/ckbd_gmm_n192_k4_synthetic.npz),
exports them into the reference PyTorch ``Cheng2020AnchorCheckerboardGMMv2``
(/root/reference/compressai/models/ckbd_gmm.py) via zoo/torch_export.py,
``update(force=True)``s it, and runs its real ``compress``/``decompress``
(torch CPU + the built reference C++ AVX2 coder, USE_SIMD=1 APPROX_MODE=0 —
the reference defaults) on the same held-out textured-leaves images bench.py
uses (768x512, seeds 500001+).  Timing protocol mirrors the reference's
eval_ckbd.py:113-167: wall-clock around compress()/decompress(), bpp from
byte lengths, PSNR on the 0-255 scale.

Writes results/synthetic/reference-flashgmm-torchcpu.json.  Our own number
on identical content/weights is bench.py's output (BENCH_r*.json) — the
two files together are the measured ours-vs-reference table.

Usage: python tools/bench_reference.py [--n-images 8] [--threads N]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("APPROX_MODE", "0")
os.environ.setdefault("USE_SIMD", "1")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", type=int, default=8)
    p.add_argument("--threads", type=int, default=0,
                   help="torch CPU threads (0 = torch default)")
    p.add_argument("--weights",
                   default=os.path.join(REPO, "weights/ckbd_gmm_n192_k4_synthetic.npz"))
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.datasets.synthetic import textured_leaves
    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.zoo.torch_export import (
        export_torch_state_dict,
        load_into_torch_model,
    )

    ours = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    from flashgmm_tpu.zoo import load_npz_weights

    n_loaded = load_npz_weights(ours, args.weights)
    print(f"loaded {n_loaded} tensors from {args.weights}")

    from tools.ref_bridge import import_reference_compressai

    import_reference_compressai()
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    from compressai.models.ckbd_gmm import (
        Cheng2020AnchorCheckerboardGMMv2 as RefModel,
    )

    ref = RefModel(N=192, K=4)
    load_into_torch_model(ref, export_torch_state_dict(ours))
    ref.eval()
    t0 = time.time()
    ref.update(force=True)
    print(f"reference update() in {time.time()-t0:.1f}s, "
          f"torch threads={torch.get_num_threads()}")

    H, W = 768, 512
    per_image = []
    with torch.no_grad():
        for i in range(args.n_images + 1):  # image 0 = warmup (jit/alloc)
            img = textured_leaves(H, W, seed=500001 + i)
            x = torch.from_numpy(np.transpose(img, (2, 0, 1))[None].copy())
            t0 = time.time()
            out = ref.compress(x)
            t_enc = time.time() - t0
            t0 = time.time()
            dec = ref.decompress(out["strings"], out["shape"])
            t_dec = time.time() - t0
            (s0, _, _), (s1, _, _), z_strings = out["strings"]
            n_bytes = len(s0) + len(s1) + sum(len(s) for s in z_strings)
            bpp = n_bytes * 8.0 / (H * W)
            x_hat = dec["x_hat"].clamp(0, 1)
            mse = torch.mean((x * 255 - x_hat * 255) ** 2).item()
            psnr = 10.0 * np.log10(255.0**2 / mse)
            exact = torch.equal(out["y_hat"], torch.round(out["y_hat"]))
            if i == 0:
                print(f"warmup: enc {t_enc*1e3:.1f} ms dec {t_dec*1e3:.1f} ms")
                continue
            per_image.append(dict(seed=500001 + i, enc_s=t_enc, dec_s=t_dec,
                                  bpp=bpp, psnr=psnr, y_hat_integral=bool(exact)))
            print(f"img {i}: enc {t_enc*1e3:6.1f} ms  dec {t_dec*1e3:6.1f} ms  "
                  f"{bpp:.4f} bpp  {psnr:.2f} dB")

    mean = lambda k: float(np.mean([r[k] for r in per_image]))
    summary = {
        "name": "reference-flashgmm-torchcpu",
        "description": "Actual reference FlashGMM net (torch CPU + C++ AVX2 "
                       "coder, USE_SIMD=1 APPROX_MODE=0) with flashgmm_tpu-"
                       "trained weights on held-out textured-leaves 768x512",
        "hardware": f"CPU, torch {torch.__version__}, "
                    f"{torch.get_num_threads()} threads",
        "results": {
            "psnr-rgb": mean("psnr"),
            "bpp": mean("bpp"),
            "encoding_time": mean("enc_s"),
            "decoding_time": mean("dec_s"),
        },
        "per_image": per_image,
    }
    out_path = os.path.join(REPO, "results/synthetic/reference-flashgmm-torchcpu.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["results"]))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
