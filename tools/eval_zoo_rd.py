"""Measure a trained zoo model's RD point through the REAL reference-format
codec (model.compress/decompress -> host rANS) on held-out dead-leaves
content, merging the point into a per-arch results JSON keyed by lambda.

This is the generic-arch sibling of eval_bench_rd.py (which drives the two
GMM fast codecs); it covers the google/sensetime line the reference ships
pretrained weights for (reference zoo/image.py:54-260, results/image/).

Usage (TPU):
    python tools/eval_zoo_rd.py --arch mbt2018-mean --N 128 --M 192 \
        --weights weights/mshp_n128_m192_synthetic.npz --lmbda 0.0067 --quality 3
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

p = argparse.ArgumentParser()
p.add_argument("--arch", required=True,
               help="registry name, e.g. mbt2018-mean / bmshj2018-hyperprior "
               "/ cheng2020-anchor-checkerboard")
p.add_argument("--N", type=int, default=None)
p.add_argument("--M", type=int, default=None)
p.add_argument("--weights", required=True)
p.add_argument("--lmbda", type=float, required=True)
p.add_argument("--quality", type=int, default=None,
               help="zoo quality slot this point maps to (metadata)")
p.add_argument("--metric", default="mse")
p.add_argument("--images", type=int, default=6)
p.add_argument("--hw", type=int, nargs=2, default=(768, 512))
p.add_argument("--json", default=None)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.registry import MODELS
from flashgmm_tpu.utils.metrics import ms_ssim, psnr
from flashgmm_tpu.zoo import load_npz_weights

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cls = MODELS[args.arch]
kwargs = {}
if args.N is not None:
    kwargs["N"] = args.N
if args.M is not None:
    kwargs["M"] = args.M
model = cls(rngs=nnx.Rngs(0), **kwargs)
n = load_npz_weights(model, os.path.join(ROOT, args.weights))
assert n > 0, f"no tensors loaded from {args.weights}"
print(f"loaded {n} tensors from {args.weights}", flush=True)
model.update(force=True, update_quantiles=True)

H, W = args.hw
psnrs, msssims, bpps = [], [], []
for i in range(args.images):
    img = textured_leaves(H, W, seed=900000 + i)[None]
    x = jnp.asarray(img)
    out = model.compress(x)
    rec = model.decompress(out["strings"], out["shape"])
    x_hat = np.asarray(rec["x_hat"] if isinstance(rec, dict) else rec)

    def _nbytes(o):
        if isinstance(o, (bytes, bytearray, memoryview)):
            return len(o)
        if isinstance(o, str):
            return len(o.encode())
        try:
            return sum(_nbytes(s) for s in o)
        except TypeError:
            return 0

    bpp = _nbytes(out["strings"]) * 8 / (H * W)
    ps = float(psnr(jnp.asarray(x_hat), x))
    ms = float(ms_ssim(jnp.asarray(x_hat), x))
    bpps.append(bpp)
    psnrs.append(ps)
    msssims.append(ms)
    print(f"img {i}: {bpp:.4f} bpp  {ps:.2f} dB  ms-ssim {ms:.4f}", flush=True)

point = {
    "lambda": args.lmbda,
    "metric": args.metric,
    "quality": args.quality,
    "bpp": float(np.mean(bpps)),
    "psnr-rgb": float(np.mean(psnrs)),
    "ms-ssim-rgb": float(np.mean(msssims)),
    "weights": args.weights,
    "images": args.images,
    "hw": [H, W],
}
print(json.dumps(point), flush=True)

json_path = os.path.join(
    ROOT, args.json or f"results/synthetic/flashgmm_tpu-{args.arch}.json")
points = {}
if os.path.exists(json_path):
    try:
        with open(json_path) as f:
            for pt in json.load(f).get("points", []):
                points[(pt["lambda"], pt.get("metric", "mse"))] = pt
    except Exception:
        pass
points[(args.lmbda, args.metric)] = point
pts = sorted(points.values(), key=lambda q: q["bpp"])
doc = {
    "name": f"flashgmm_tpu-{args.arch}",
    "description": (
        f"{args.arch} trained on synthetic dead-leaves; held-out eval "
        "through the REAL reference-format codec (compress/decompress, "
        "host rANS) incl. all stream overheads"),
    "results": {
        "psnr-rgb": [q["psnr-rgb"] for q in pts],
        "ms-ssim-rgb": [q["ms-ssim-rgb"] for q in pts],
        "bpp": [q["bpp"] for q in pts],
    },
    "points": pts,
}
os.makedirs(os.path.dirname(json_path), exist_ok=True)
with open(json_path, "w") as f:
    json.dump(doc, f, indent=2)
    f.write("\n")
print("wrote", json_path)
