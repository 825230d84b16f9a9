"""Measure a trained model's RD point through the REAL codec on held-out
dead-leaves content and refresh its results/synthetic/ JSON entry.

Usage (TPU):
    python tools/eval_bench_rd.py [--images 8]              # flagship ckbd-GMM
    python tools/eval_bench_rd.py --arch elic [--images 8]  # ELIC2022GMM
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

from flashgmm_tpu.datasets.synthetic import textured_leaves
from flashgmm_tpu.utils.metrics import ms_ssim, psnr

p = argparse.ArgumentParser()
p.add_argument("--arch", choices=("ckbd", "elic"), default="ckbd")
p.add_argument("--images", type=int, default=8)
p.add_argument("--lanes", type=int, default=512,
               help="small W: single-image files carry W*4*3 bytes of lane-state overhead")
p.add_argument("--out", default=None)
p.add_argument("--force", action="store_true",
               help="write results even if they fail the regression floors")
p.add_argument("--hw", type=int, nargs=2, default=(768, 512),
               help="eval image size (smoke-testing override)")
p.add_argument("--weights", default=None,
               help="npz weights override (e.g. a second-lambda point); "
               "default: the arch's bench weights. With --weights the "
               "regression floors are skipped (a lower-rate point sits at "
               "lower PSNR by design); the measured point is MERGED into "
               "the arch's RD-curve file keyed by --lmbda")
p.add_argument("--lmbda", type=float, default=0.0067,
               help="rate-distortion lambda this checkpoint was trained "
               "at; keys the point inside the curve file (re-evaluating "
               "the same lambda replaces its point)")
p.add_argument("--quality", type=int, default=None,
               help="zoo quality slot for this point (metadata)")
p.add_argument("--metric", default="mse", choices=("mse", "ms-ssim"),
               help="distortion metric the checkpoint was trained for "
               "(recorded per point; use a separate --out file for the "
               "ms-ssim line, mirroring the reference's *_ms-ssim files)")
args = p.parse_args()
if args.weights is not None:
    args.force = True


from flashgmm_tpu.zoo import load_npz_weights


def _load_npz(model, path):
    return load_npz_weights(model, path) > 0


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if args.arch == "ckbd":
    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    assert _load_npz(model, args.weights or os.path.join(
        ROOT, "weights/ckbd_gmm_n192_k4_synthetic.npz")), "bench weights missing"
    model.update(update_quantiles=True)
    codec = FastCheckerboardGmmCodec(model, lanes=args.lanes, cap_divisor=4)

    def roundtrip(x):
        data, enc = codec.encode_to_bytes(x)
        y_shape = tuple(enc["y_hat"].shape[1:])
        return data, codec.decode_bytes(data, y_shape)

    default_out = "results/synthetic/flashgmm_tpu-ckbd-gmm.json"
    name = "flashgmm_tpu-cheng2020-anchor-checkerboard-gmm"
    desc = ("Fast on-device codec (interleaved-rANS), N=192 K=4, trained ~19k "
            "steps on dead-leaves content; held-out dead-leaves eval through "
            "the REAL codec incl. all stream overheads; TPU v5e")
else:
    from flashgmm_tpu.models.elic_gmm import Elic2022GMM
    from flashgmm_tpu.runtime import FastElicGmmCodec
    from flashgmm_tpu.runtime.fast_codec import StreamOverflow

    model = Elic2022GMM(N=192, M=320, K=4, rngs=nnx.Rngs(0))
    assert _load_npz(model, args.weights or os.path.join(
        ROOT, "weights/elic_gmm_n192_m320_k4_synthetic.npz")), "elic weights missing"
    model.update(update_quantiles=True)
    codec = FastElicGmmCodec(model, lanes=args.lanes)

    def roundtrip(x):
        out = codec.encode(x)
        try:
            data = codec.to_bytes(out)
        except StreamOverflow:
            out = codec.encode(x, full=True)
            data = codec.to_bytes(out)
        y_shape = tuple(out["y_hat"].shape[1:])
        rec = codec.decode(codec.from_bytes(data, y_shape), y_shape)
        assert np.array_equal(
            np.asarray(codec.decode_y_hat(codec.from_bytes(data, y_shape), y_shape)),
            np.asarray(out["y_hat"])), "ELIC round-trip not exact"
        return data, rec

    default_out = "results/synthetic/flashgmm_tpu-elic-gmm.json"
    name = "flashgmm_tpu-elic2022-gmm"
    desc = ("Fast on-device SCCTX codec (interleaved-rANS, 5 channel groups x "
            "checkerboard), N=192 M=320 K=4, trained on dead-leaves content; "
            "held-out dead-leaves eval through the REAL codec incl. all stream "
            "overheads, y_hat round-trip asserted exact; TPU v5e")

out_path = args.out or default_out

H, W = args.hw
psnrs, ssims, bpps = [], [], []
for i in range(args.images):
    x = jnp.asarray(textured_leaves(H, W, seed=600000 + i))[None]
    data, rec = roundtrip(x)
    psnrs.append(float(psnr(x, rec)))
    ssims.append(float(ms_ssim(x, rec)))
    bpps.append(len(data) * 8 / (H * W))
    print(f"img {i}: {bpps[-1]:.3f} bpp  {psnrs[-1]:.2f} dB  "
          f"ms-ssim {ssims[-1]:.4f}", flush=True)

# Regression floors (VERDICT r2 item 3): round 2 silently shipped a
# 0.985->0.825 MS-SSIM drop caused by bf16-default convs inside the TPU
# ms_ssim itself (fixed in utils/metrics.py).  Refuse to overwrite the
# published RD point with numbers this far below the trained model's
# known operating point unless --force. Floors are per-arch (calibrated
# to each model's trained operating point) and only apply at the
# standard eval size — --hw smoke runs at other sizes skip them.
FLOORS = {"ckbd": {"psnr": 28.5, "ms_ssim": 0.96},
          "elic": {"psnr": 28.5, "ms_ssim": 0.96}}[args.arch]
mean_psnr, mean_ssim = float(np.mean(psnrs)), float(np.mean(ssims))
if (H, W) != (768, 512):
    args.force = True
if not args.force:
    assert mean_psnr >= FLOORS["psnr"], \
        f"PSNR {mean_psnr:.2f} below floor {FLOORS['psnr']} — eval bug or " \
        "weight regression; rerun with --force to override"
    assert mean_ssim >= FLOORS["ms_ssim"], \
        f"MS-SSIM {mean_ssim:.4f} below floor {FLOORS['ms_ssim']} — eval " \
        "bug or weight regression; rerun with --force to override"

# Merge this point into the arch's RD-CURVE file (reference results
# convention, /root/reference/results/image/kodak/*.json: one file per
# model, parallel metric arrays sorted ascending by bpp).  Points are
# keyed by training lambda: re-evaluating a lambda replaces its point.
point = {
    "psnr-rgb": float(np.mean(psnrs)),
    "ms-ssim-rgb": float(np.mean(ssims)),
    "bpp": float(np.mean(bpps)),
    "lambda": float(args.lmbda),
    "zoo-quality": args.quality,
    "metric": args.metric,
    "weights": args.weights and os.path.relpath(args.weights, ROOT),
}
points = []
if os.path.exists(out_path):
    with open(out_path) as f:
        old = json.load(f)
    r = old.get("results", {})
    meta = old.get("points", {})
    n_old = len(r.get("bpp", []))
    for i in range(n_old):
        points.append({
            "psnr-rgb": r["psnr-rgb"][i],
            "ms-ssim-rgb": r["ms-ssim-rgb"][i],
            "bpp": r["bpp"][i],
            "lambda": meta.get("lambda", [None] * n_old)[i],
            "zoo-quality": meta.get("zoo-quality", [None] * n_old)[i],
            "metric": meta.get("metric", ["mse"] * n_old)[i],
            "weights": meta.get("weights", [None] * n_old)[i],
        })
points = [q for q in points if q["lambda"] != point["lambda"]]
points.append(point)
points.sort(key=lambda q: q["bpp"])
out = {
    "name": name,
    "description": desc,
    "results": {
        "psnr-rgb": [q["psnr-rgb"] for q in points],
        "ms-ssim-rgb": [q["ms-ssim-rgb"] for q in points],
        "bpp": [q["bpp"] for q in points],
    },
    "points": {
        "lambda": [q["lambda"] for q in points],
        "zoo-quality": [q["zoo-quality"] for q in points],
        "metric": [q.get("metric", "mse") for q in points],
        "weights": [q["weights"] for q in points],
    },
}
os.makedirs(os.path.dirname(out_path), exist_ok=True)
with open(out_path, "w") as f:
    json.dump(out, f, indent=2)
    f.write("\n")
print("wrote", out_path, f"({len(points)} point(s))")
