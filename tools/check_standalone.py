"""Evaluate the standalone C++ codec on a folder of images (or synthetic
dead-leaves) — analog of the reference's check_kodak.sh
(compressai/sadl_codec/check_kodak.sh: PPM convert -> C++ encode [-> rdoq]
-> C++ decode -> PSNR).

Usage:
    python tools/check_standalone.py [--images DIR] [--n 4] [--size 768 512]
        [--weights W.npz] [--arch bmshj2018-factorized] [--quality-N 32]
        [--rdoq LAMBDA]

Builds `make standalone` binaries if needed, exports a model card, runs
the pure-C++ encoder/decoder per image, and prints a JSON summary
(bpp / PSNR / enc+dec wall ms). With no --images, held-out dead-leaves
content is generated (same family as bench.py).
"""

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def write_ppm(path, img):
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def read_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        f.readline()
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, default=None)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", type=int, nargs=2, default=(768, 512))
    ap.add_argument("--arch", default="bmshj2018-factorized")
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--M", type=int, default=192)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--rdoq", type=float, default=None)
    ap.add_argument("--int16", action="store_true",
                    help="quantized inference (ReLU-family stacks)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import nnx

    from flashgmm_tpu.registry import MODELS
    from flashgmm_tpu.standalone import export_model_card

    subprocess.run(["make", "standalone"], cwd=REPO, check=True,
                   capture_output=True)
    enc = REPO / "build" / "fgsc_encode"
    dec = REPO / "build" / "fgsc_decode"

    model = MODELS[args.arch](N=args.N, M=args.M, rngs=nnx.Rngs(0))
    if args.weights:
        from flashgmm_tpu.zoo import load_npz_weights

        load_npz_weights(model, args.weights)
    model.update(update_quantiles=True)

    tmp = Path(tempfile.mkdtemp(prefix="fgsc_"))
    card = tmp / "model.fgsam"
    print(f"[check] exporting model card ({args.arch} N={args.N} M={args.M})",
          file=sys.stderr)
    export_model_card(model, str(card))

    if args.images:
        from PIL import Image

        exts = {".png", ".jpg", ".jpeg", ".ppm", ".bmp", ".tif", ".tiff"}
        paths = sorted(
            p for p in Path(args.images).iterdir()
            if p.is_file() and p.suffix.lower() in exts
        )[: args.n]
        images = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    else:
        from flashgmm_tpu.datasets.synthetic import textured_leaves

        w, h = args.size
        images = [
            (np.asarray(textured_leaves(h, w, seed=700000 + i)) * 255)
            .clip(0, 255).astype(np.uint8)
            for i in range(args.n)
        ]

    rows = []
    for i, img in enumerate(images):
        ppm = tmp / f"{i}.ppm"
        write_ppm(ppm, img)
        bs = tmp / f"{i}.fgs"
        mode = ["--int16"] if args.int16 else []
        cmd = [str(enc), *mode, str(card), str(ppm), str(bs)]
        if args.rdoq is not None:
            cmd.append(str(args.rdoq))
        t0 = time.time()
        subprocess.run(cmd, check=True, capture_output=True)
        t_enc = (time.time() - t0) * 1000
        rec_ppm = tmp / f"{i}_rec.ppm"
        t0 = time.time()
        subprocess.run([str(dec), *mode, str(card), str(bs), str(rec_ppm)],
                       check=True, capture_output=True)
        t_dec = (time.time() - t0) * 1000
        rec = read_ppm(rec_ppm)
        mse = np.mean((rec.astype(np.float32) - img.astype(np.float32)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-10))
        bpp = bs.stat().st_size * 8 / (img.shape[0] * img.shape[1])
        rows.append({"bpp": bpp, "psnr": psnr, "enc_ms": t_enc, "dec_ms": t_dec})
        print(f"[check] img {i}: {bpp:.4f} bpp, {psnr:.2f} dB, "
              f"enc {t_enc:.0f} ms, dec {t_dec:.0f} ms", file=sys.stderr)

    if not rows:
        print(json.dumps({"error": "no images found", "n_images": 0}))
        return 1
    summary = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    summary.update(arch=args.arch, n_images=len(rows), rdoq=args.rdoq,
                   trained=bool(args.weights), int16=args.int16)
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
