"""VBR 8-gain sweep through the REAL codec (VERDICT r3 item 6).

One MeanScaleHyperpriorVbr model, all 8 Gain levels, real
``compress``/``decompress`` (reference-format coder) including the
variable-step EntropyBottleneck ``update_variable`` path
(vr_entbttlnck=True). Held-out dead-leaves content; asserts a monotone
rate across the gains and writes results/synthetic/vbr_sweep.json.

Usage: python tools/vbr_sweep.py [--weights weights/mshp_vbr_...npz]
       [--images 2] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

p = argparse.ArgumentParser()
p.add_argument("--weights", default="weights/mshp_vbr_n192_m320_synthetic.npz")
p.add_argument("--images", type=int, default=2)
p.add_argument("--hw", type=int, nargs=2, default=(768, 512))
p.add_argument("--cpu", action="store_true")
p.add_argument("--out", default="results/synthetic/vbr_sweep.json")
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.models.vbr import VBR_GAINS, MeanScaleHyperpriorVbr
from flashgmm_tpu.utils.metrics import ms_ssim, psnr
from flashgmm_tpu.zoo import load_npz_weights

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

net = MeanScaleHyperpriorVbr(192, 320, vr_entbttlnck=True, rngs=nnx.Rngs(0))
wpath = os.path.join(ROOT, args.weights)
trained = os.path.exists(wpath)
if trained:
    n = load_npz_weights(net, wpath)
    print(f"loaded {n} tensors from {args.weights}", flush=True)
else:
    print(f"WARNING: {args.weights} missing - sweeping RANDOM weights "
          "(rate still exercises all 8 gains)", flush=True)

H, W = args.hw
images = [jnp.asarray(textured_leaves(H, W, seed=600000 + i))[None]
          for i in range(args.images)]

levels = []
for s in range(len(VBR_GAINS)):
    scale = net._get_scale(s, 0)
    net.update(force=True, scale=scale)
    bpps, psnrs, ssims = [], [], []
    for x in images:
        c = net.compress(x, s=s)
        r = net.decompress(c["strings"], c["shape"], s=s)
        nbytes = sum(len(b) for ss in c["strings"] for b in ss)
        bpps.append(nbytes * 8 / (H * W))
        psnrs.append(float(psnr(x, jnp.clip(r["x_hat"], 0, 1))))
        ssims.append(float(ms_ssim(x, jnp.clip(r["x_hat"], 0, 1))))
    lv = {"s": s, "gain": VBR_GAINS[s],
          "bpp": float(np.mean(bpps)),
          "psnr-rgb": float(np.mean(psnrs)),
          "ms-ssim-rgb": float(np.mean(ssims))}
    levels.append(lv)
    print(json.dumps(lv), flush=True)

bpp_arr = [lv["bpp"] for lv in levels]
assert all(b2 >= b1 * 0.98 for b1, b2 in zip(bpp_arr, bpp_arr[1:])), \
    f"rate not monotone across gains: {bpp_arr}"
if trained:
    psnr_arr = [lv["psnr-rgb"] for lv in levels]
    assert psnr_arr[-1] > psnr_arr[0], \
        f"distortion not improving with gain: {psnr_arr}"

out = {
    "name": "flashgmm_tpu-mbt2018-mean-vbr",
    "description": (
        "ONE MeanScaleHyperpriorVbr model (N=192 M=320, vr_entbttlnck) "
        "swept across all 8 Gain levels through the REAL codec "
        "(update_variable z tables per level); held-out dead-leaves "
        f"{H}x{W}, {args.images} image(s)/level; "
        + ("trained weights" if trained else "RANDOM weights (rate-only)")),
    "results": {
        "psnr-rgb": [lv["psnr-rgb"] for lv in levels],
        "ms-ssim-rgb": [lv["ms-ssim-rgb"] for lv in levels],
        "bpp": [lv["bpp"] for lv in levels],
    },
    "points": {"s": [lv["s"] for lv in levels],
               "gain": [lv["gain"] for lv in levels]},
}
os.makedirs(os.path.dirname(os.path.join(ROOT, args.out)), exist_ok=True)
with open(os.path.join(ROOT, args.out), "w") as f:
    json.dump(out, f, indent=2)
    f.write("\n")
print("wrote", args.out)
