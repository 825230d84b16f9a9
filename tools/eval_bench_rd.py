"""Measure the flagship's RD point through the REAL codec on held-out
dead-leaves content and refresh results/synthetic/flashgmm_tpu-ckbd-gmm.json.

Usage (TPU): python tools/eval_bench_rd.py [--images 8]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx

from bench import _load_bench_weights
from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec
from flashgmm_tpu.utils.metrics import ms_ssim, psnr

p = argparse.ArgumentParser()
p.add_argument("--images", type=int, default=8)
p.add_argument("--lanes", type=int, default=512,
               help="small W: single-image files carry W*4*3 bytes of lane-state overhead")
p.add_argument("--out", default="results/synthetic/flashgmm_tpu-ckbd-gmm.json")
p.add_argument("--force", action="store_true",
               help="write results even if they fail the regression floors")
args = p.parse_args()

model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
trained = _load_bench_weights(model)
assert trained, "bench weights missing"
model.update(update_quantiles=True)
codec = FastCheckerboardGmmCodec(model, lanes=args.lanes, cap_divisor=4)

H, W = 768, 512
psnrs, ssims, bpps = [], [], []
for i in range(args.images):
    x = jnp.asarray(textured_leaves(H, W, seed=600000 + i))[None]
    data, enc = codec.encode_to_bytes(x)
    y_shape = tuple(enc["y_hat"].shape[1:])
    rec = codec.decode_bytes(data, y_shape)
    psnrs.append(float(psnr(x, rec)))
    ssims.append(float(ms_ssim(x, rec)))
    bpps.append(len(data) * 8 / (H * W))
    print(f"img {i}: {bpps[-1]:.3f} bpp  {psnrs[-1]:.2f} dB  "
          f"ms-ssim {ssims[-1]:.4f}", flush=True)

# Regression floors (VERDICT r2 item 3): round 2 silently shipped a
# 0.985->0.825 MS-SSIM drop caused by bf16-default convs inside the TPU
# ms_ssim itself (fixed in utils/metrics.py).  Refuse to overwrite the
# published RD point with numbers this far below the trained model's
# known operating point unless --force.
FLOORS = {"psnr": 28.5, "ms_ssim": 0.96}
mean_psnr, mean_ssim = float(np.mean(psnrs)), float(np.mean(ssims))
if not args.force:
    assert mean_psnr >= FLOORS["psnr"], \
        f"PSNR {mean_psnr:.2f} below floor {FLOORS['psnr']} — eval bug or " \
        "weight regression; rerun with --force to override"
    assert mean_ssim >= FLOORS["ms_ssim"], \
        f"MS-SSIM {mean_ssim:.4f} below floor {FLOORS['ms_ssim']} — eval " \
        "bug or weight regression; rerun with --force to override"

out = {
    "name": "flashgmm_tpu-cheng2020-anchor-checkerboard-gmm",
    "description": (
        "Fast on-device codec (interleaved-rANS), N=192 K=4, trained ~19k "
        "steps on dead-leaves content; held-out dead-leaves eval through "
        "the REAL codec incl. all stream overheads; TPU v5e"
    ),
    "results": {
        "psnr-rgb": [float(np.mean(psnrs))],
        "ms-ssim-rgb": [float(np.mean(ssims))],
        "bpp": [float(np.mean(bpps))],
    },
}
os.makedirs(os.path.dirname(args.out), exist_ok=True)
with open(args.out, "w") as f:
    json.dump(out, f, indent=2)
print("wrote", args.out)
