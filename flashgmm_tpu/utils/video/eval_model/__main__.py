"""Evaluate a video model on raw YUV sequences
(cf. compressai/utils/video/eval_model/__main__.py:234+).

Per-frame pipeline: YUV420 -> RGB 444 -> pad -> compress/decompress ->
PSNR/MS-SSIM + bpp aggregation over the sequence.

Usage:
    python -m flashgmm_tpu.utils.video.eval_model <seq.yuv> [-f N] [--real]
"""

import argparse
import json
import sys

import numpy as np


def setup_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sequence", type=str, help="raw .yuv video path")
    p.add_argument("-a", "--architecture", default="ssf2020")
    p.add_argument("-f", "--frames", type=int, default=8)
    p.add_argument("--gop", type=int, default=8)
    p.add_argument("-p", "--path", type=str, help="checkpoint path")
    p.add_argument("--real", action="store_true")
    p.add_argument("-o", "--output", type=str)
    return p.parse_args(argv)


def main(argv=None):
    args = setup_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.datasets.rawvideo import RawVideoSequence
    from flashgmm_tpu.ops import compute_padding, pad_image, unpad_image
    from flashgmm_tpu.registry import MODELS
    from flashgmm_tpu.transforms import ycbcr2rgb, yuv_420_to_444
    from flashgmm_tpu.utils.metrics import psnr

    seq = RawVideoSequence(args.sequence)
    model = MODELS[args.architecture](rngs=nnx.Rngs(0))
    if args.path:
        from flashgmm_tpu.utils.checkpoint import load_checkpoint

        load_checkpoint(args.path, model)
    model.update(update_quantiles=(args.path is None), force=True)

    n_frames = min(args.frames, len(seq))
    frames = []
    for i in range(n_frames):
        y, u, v = seq.to_float(seq[i])
        yuv = yuv_420_to_444(
            (jnp.asarray(y)[None, :, :, None], jnp.asarray(u)[None, :, :, None],
             jnp.asarray(v)[None, :, :, None])
        )
        rgb = jnp.clip(ycbcr2rgb(yuv), 0, 1)
        frames.append(rgb)

    h, w = frames[0].shape[1:3]
    pad, unpad = compute_padding(h, w, min_div=128)
    frames = [pad_image(f, pad) for f in frames]

    results = {"psnr-rgb": [], "bpp": []}
    num_pixels = h * w
    if args.real:
        strings, shapes = model.compress(frames)
        dec = model.decompress(strings, shapes)
        nbytes = _count(strings)
        for f, d in zip(frames, dec):
            results["psnr-rgb"].append(
                float(psnr(unpad_image(f, unpad), unpad_image(d, unpad)))
            )
        results["bpp"] = [nbytes * 8 / (num_pixels * n_frames)] * n_frames
    else:
        out = model(frames, training=False)
        for f, d, lk in zip(frames, out["x_hat"], out["likelihoods"]):
            results["psnr-rgb"].append(
                float(psnr(unpad_image(f, unpad), unpad_image(jnp.clip(d, 0, 1), unpad)))
            )
            bits = sum(
                float(jnp.sum(-jnp.log2(v)))
                for branch in lk.values() for v in branch.values()
            )
            results["bpp"].append(bits / num_pixels)

    output = {
        "name": args.architecture,
        "sequence": args.sequence,
        "results": {k: float(np.mean(v)) for k, v in results.items()},
    }
    print(json.dumps(output, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(output, f, indent=2)
    return 0


def _count(obj):
    if isinstance(obj, bytes):
        return len(obj)
    if isinstance(obj, dict):
        return sum(_count(v) for v in obj.values())
    if isinstance(obj, (list, tuple)):
        return sum(_count(v) for v in obj)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
