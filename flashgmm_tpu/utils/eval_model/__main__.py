"""Evaluate a model on a directory of images.

Equivalent of ``python -m compressai.utils.eval_model``
(utils/eval_model/__main__.py:106-513): pads inputs, times real
compress/decompress (or runs estimated-entropy evaluation), aggregates
bpp/PSNR/MS-SSIM into a JSON report.

Usage:
    python -m flashgmm_tpu.utils.eval_model checkpoint <image_dir> \
        -a cheng2020-anchor-checkerboard-gmm -p ckpt_dir [--real]
    python -m flashgmm_tpu.utils.eval_model random <image_dir> \
        -a bmshj2018-factorized  # randomly initialized (smoke/benchmarks)
"""

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np


def setup_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", choices=["checkpoint", "torch", "random"],
                   help="weight source")
    p.add_argument("dataset", type=str, help="image directory")
    p.add_argument("-a", "--architecture", required=True)
    p.add_argument("-p", "--path", type=str, help="checkpoint path")
    p.add_argument("-N", type=int, default=192)
    p.add_argument("-M", type=int, default=320)
    p.add_argument("-K", type=int, default=4)
    p.add_argument("--real", action="store_true",
                   help="real entropy coding (default: entropy estimation)")
    p.add_argument("--entropy-estimation", dest="real", action="store_false")
    p.add_argument("--min-div", type=int, default=64)
    p.add_argument("-o", "--output", type=str)
    p.add_argument("--half", action="store_true", help="(unused; bf16 opt-in)")
    return p.parse_args(argv)


def build_model(args):
    from flax import nnx

    from flashgmm_tpu.registry import MODELS

    cls = MODELS[args.architecture]
    kwargs = {}
    import inspect

    sig = inspect.signature(cls.__init__)
    if "N" in sig.parameters:
        kwargs["N"] = args.N
    if "M" in sig.parameters:
        kwargs["M"] = args.M
    if "K" in sig.parameters:
        kwargs["K"] = args.K
    model = cls(**kwargs, rngs=nnx.Rngs(0))

    if args.source == "checkpoint" and args.path:
        from flashgmm_tpu.utils.checkpoint import load_checkpoint

        load_checkpoint(args.path, model)
    elif args.source == "torch" and args.path:
        from flashgmm_tpu.zoo.torch_convert import load_checkpoint_file

        load_checkpoint_file(model, args.path, strict=False)
    model.update(update_quantiles=(args.source == "random"), force=True)
    return model


def inference(model, x):
    import jax
    import jax.numpy as jnp

    from flashgmm_tpu.ops import compute_padding, pad_image, unpad_image
    from flashgmm_tpu.utils.metrics import ms_ssim, psnr

    h, w = x.shape[1:3]
    pad, unpad = compute_padding(h, w, min_div=64)
    x_padded = pad_image(x, pad)

    start = time.time()
    out_enc = model.compress(x_padded)
    enc_time = time.time() - start

    start = time.time()
    kwargs = {k: out_enc[k] for k in ("abs_max",) if k in out_enc}
    out_dec = model.decompress(out_enc["strings"], out_enc["shape"], **kwargs)
    out_dec["x_hat"].block_until_ready()
    dec_time = time.time() - start

    x_hat = unpad_image(out_dec["x_hat"], unpad)
    num_pixels = x.shape[0] * h * w
    bpp = _count_bytes(out_enc["strings"]) * 8.0 / num_pixels
    return {
        "psnr-rgb": float(psnr(x, x_hat)),
        "ms-ssim-rgb": float(ms_ssim(x, x_hat)),
        "bpp": bpp,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def inference_entropy_estimation(model, x):
    import jax.numpy as jnp

    from flashgmm_tpu.ops import compute_padding, pad_image, unpad_image
    from flashgmm_tpu.utils.metrics import ms_ssim, psnr

    h, w = x.shape[1:3]
    pad, unpad = compute_padding(h, w, min_div=64)
    x_padded = pad_image(x, pad)

    start = time.time()
    out = model(x_padded, training=False)
    elapsed = time.time() - start

    x_hat = unpad_image(out["x_hat"], unpad)
    num_pixels = x.shape[0] * h * w
    bpp = sum(
        float(jnp.sum(-jnp.log2(lk))) for lk in out["likelihoods"].values()
    ) / num_pixels
    return {
        "psnr-rgb": float(psnr(x, x_hat)),
        "ms-ssim-rgb": float(ms_ssim(x, x_hat)),
        "bpp": bpp,
        "encoding_time": elapsed / 2,
        "decoding_time": elapsed / 2,
    }


def _count_bytes(strings):
    n = 0
    if isinstance(strings, bytes):
        return len(strings)
    if isinstance(strings, (list, tuple)):
        for s in strings:
            if isinstance(s, int):
                continue
            n += _count_bytes(s)
    elif hasattr(strings, "shape"):
        return 0  # jax arrays (zero_bitmap) are side info; count below
    return n


def main(argv=None):
    args = setup_args(argv)

    import jax.numpy as jnp

    from flashgmm_tpu.datasets.image import IMG_EXTENSIONS, load_image

    model = build_model(args)
    images = sorted(
        f for f in Path(args.dataset).iterdir()
        if f.suffix.lower() in IMG_EXTENSIONS
    )
    if not images:
        raise SystemExit(f"No images found in {args.dataset}")

    results = defaultdict(list)
    for img_path in images:
        x = jnp.asarray(load_image(img_path))[None]
        rv = inference(model, x) if args.real else inference_entropy_estimation(model, x)
        for k, v in rv.items():
            results[k].append(v)

    output = {
        "name": args.architecture,
        "description": f"Inference ({'ans' if args.real else 'entropy estimation'})",
        "results": {k: float(np.mean(v)) for k, v in results.items()},
    }
    print(json.dumps(output, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(output, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
