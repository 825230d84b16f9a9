"""Evaluate a video model on raw YUV sequences
(cf. compressai/utils/video/eval_model/__main__.py:234-588).

Per-frame pipeline: YUV420 -> RGB 444 -> pad -> compress/decompress (in
GOP chunks: first frame of each GOP is the keyframe) -> RGB + YUV PSNR,
MS-SSIM, bpp and enc/dec timing aggregated over the sequence.

Usage:
    python -m flashgmm_tpu.utils.video.eval_model <seq.yuv> [-f N] [--real]
"""

import argparse
import json
import sys
import time

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

    import jax.numpy as jnp
    from flax import nnx

    from flashgmm_tpu.datasets.rawvideo import RawVideoSequence
    from flashgmm_tpu.ops import compute_padding, pad_image, unpad_image
    from flashgmm_tpu.registry import MODELS
    from flashgmm_tpu.transforms import rgb2ycbcr, ycbcr2rgb, yuv_420_to_444
    from flashgmm_tpu.utils.metrics import ms_ssim, psnr

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

    results = {
        "psnr-rgb": [], "psnr-yuv": [], "ms-ssim-rgb": [], "bpp": [],
    }
    enc_time = dec_time = 0.0
    num_pixels = h * w

    def add_quality(ref_pad, dec_pad):
        ref = unpad_image(ref_pad, unpad)
        dec = jnp.clip(unpad_image(dec_pad, unpad), 0, 1)
        results["psnr-rgb"].append(float(psnr(ref, dec)))
        results["ms-ssim-rgb"].append(float(ms_ssim(ref, dec)))
        ref_yuv, dec_yuv = rgb2ycbcr(ref), rgb2ycbcr(dec)
        p_yuv = [float(psnr(ref_yuv[..., i], dec_yuv[..., i])) for i in range(3)]
        # reference weighting: (4*Y + U + V)/6 over PER-PLANE PSNRs
        # (utils/video/eval_model/__main__.py:149)
        results["psnr-yuv"].append(
            float((4 * p_yuv[0] + p_yuv[1] + p_yuv[2]) / 6)
        )

    # process in GOPs: frame 0 of each chunk is the keyframe
    for g0 in range(0, n_frames, args.gop):
        gop = frames[g0 : g0 + args.gop]
        if args.real:
            t0 = time.time()
            strings, shapes = model.compress(gop)
            enc_time += time.time() - t0
            t0 = time.time()
            dec = model.decompress(strings, shapes)
            dec_time += time.time() - t0
            nbytes = _count(strings)
            for f, d in zip(gop, dec):
                add_quality(f, d)
                results["bpp"].append(nbytes * 8 / (num_pixels * len(gop)))
        else:
            out = model(gop, training=False)
            for f, d, lk in zip(gop, out["x_hat"], out["likelihoods"]):
                add_quality(f, d)
                bits = sum(
                    float(jnp.sum(-jnp.log2(v)))
                    for branch in lk.values()
                    for v in branch.values()
                )
                results["bpp"].append(bits / num_pixels)

    output = {
        "name": args.architecture,
        "description": f"{args.architecture} "
                       f"{'real coding' if args.real else 'entropy estimation'}",
        "sequence": args.sequence,
        "results": {
            **{k: float(np.mean(v)) for k, v in results.items()},
            "enc_time_per_frame": enc_time / max(n_frames, 1),
            "dec_time_per_frame": dec_time / max(n_frames, 1),
        },
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
