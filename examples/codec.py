"""File-format codec CLI: encode images/videos to self-contained files.

Equivalent of the reference's examples/codec.py: images mirror its header
layout (:148-199); video encode/decode mirror its GOP loop (:255-455) for
ssf2020 — keyframe + inter frames per GOP, raw .yuv input (or a directory
of image frames), decoded frames written as PNGs.

Usage:
    python examples/codec.py encode input.png -o out.fgm \
        -a cheng2020-anchor-checkerboard-gmm --weights ckpt
    python examples/codec.py decode out.fgm -o rec.png --weights ckpt
    python examples/codec.py encode_video frames_dir/ -o out.fgmv \
        --weights ssf.npz --gop 8
    python examples/codec.py decode_video out.fgmv -o rec_dir/ \
        --weights ssf.npz
"""

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

MAGIC = b"FGMT"
ARCHS = [
    "bmshj2018-factorized",
    "bmshj2018-hyperprior",
    "mbt2018-mean",
    "mbt2018",
    "cheng2020-anchor",
    "cheng2020-anchor-checkerboard",
    "cheng2020-anchor-checkerboard-gmm",
    "elic2022-official",
]


def _write_stream(f, s):
    """Recursively serialize the strings structure."""
    if isinstance(s, bytes):
        f.write(struct.pack("<BI", 0, len(s)))
        f.write(s)
    elif isinstance(s, int):
        f.write(struct.pack("<Bi", 1, s))
    elif isinstance(s, (list, tuple)):
        f.write(struct.pack("<BI", 2, len(s)))
        for e in s:
            _write_stream(f, e)
    elif isinstance(s, str):
        b = s.encode()
        f.write(struct.pack("<BI", 4, len(b)))
        f.write(b)
    elif hasattr(s, "shape"):  # jax/numpy array (e.g. zero_bitmap)
        arr = np.asarray(s).astype(np.int32)
        f.write(struct.pack("<BI", 3, arr.size))
        f.write(arr.tobytes())
    elif isinstance(s, dict):  # ssf2020 inter frames: {"motion": ..., ...}
        items = sorted(s.items())
        f.write(struct.pack("<BI", 5, len(items)))
        for k, v in items:
            _write_stream(f, k)
            _write_stream(f, v)
    else:
        raise TypeError(type(s))


def _read_stream(f):
    import jax.numpy as jnp

    tag = struct.unpack("<B", f.read(1))[0]
    if tag == 0:
        (n,) = struct.unpack("<I", f.read(4))
        return f.read(n)
    if tag == 1:
        return struct.unpack("<i", f.read(4))[0]
    if tag == 2:
        (n,) = struct.unpack("<I", f.read(4))
        return tuple(_read_stream(f) for _ in range(n))
    if tag == 3:
        (n,) = struct.unpack("<I", f.read(4))
        return jnp.asarray(np.frombuffer(f.read(n * 4), np.int32))
    if tag == 4:
        (n,) = struct.unpack("<I", f.read(4))
        return f.read(n).decode()
    if tag == 5:
        (n,) = struct.unpack("<I", f.read(4))
        return {_read_stream(f): _read_stream(f) for _ in range(n)}
    raise ValueError(tag)


def _listify(s):
    """Deep tuple->list (the models' decompress APIs take lists)."""
    if isinstance(s, (list, tuple)):
        return [_listify(e) for e in s]
    if isinstance(s, dict):
        return {k: _listify(v) for k, v in s.items()}
    return s


def setup_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    e = sub.add_parser("encode")
    e.add_argument("input")
    e.add_argument("-o", "--output", required=True)
    e.add_argument("-a", "--architecture", default="cheng2020-anchor-checkerboard-gmm")
    e.add_argument("-q", "--quality", type=int, default=1)
    e.add_argument("--weights", type=str)

    d = sub.add_parser("decode")
    d.add_argument("input")
    d.add_argument("-o", "--output", required=True)
    d.add_argument("--weights", type=str)

    ev = sub.add_parser("encode_video")
    ev.add_argument("input", help=".yuv raw video or a directory of frames")
    ev.add_argument("-o", "--output", required=True)
    ev.add_argument("-q", "--quality", type=int, default=5)
    ev.add_argument("--weights", type=str)
    ev.add_argument("--frames", type=int, default=0, help="0 = all")
    ev.add_argument("--gop", type=int, default=8)

    dv = sub.add_parser("decode_video")
    dv.add_argument("input")
    dv.add_argument("-o", "--output", required=True,
                    help="output directory for decoded PNG frames")
    dv.add_argument("--weights", type=str)
    return p.parse_args(argv)


def encode(args):
    import jax.numpy as jnp

    from flashgmm_tpu.datasets.image import load_image
    from flashgmm_tpu.ops import compute_padding, pad_image
    from flashgmm_tpu.zoo import create_model

    model = create_model(args.architecture, args.quality,
                         weights_path=args.weights)
    model.update(force=False)

    x = jnp.asarray(load_image(args.input))[None]
    h, w = x.shape[1:3]
    pad, _ = compute_padding(h, w, min_div=64)
    out = model.compress(pad_image(x, pad))

    with open(args.output, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<BBHH", ARCHS.index(args.architecture),
                            args.quality, h, w))
        _write_stream(f, ["SHAPE", _shape_to_list(out["shape"])])
        _write_stream(f, list(out["strings"]))
        if "abs_max" in out:
            f.write(struct.pack("<i", out["abs_max"]))
    nbytes = Path(args.output).stat().st_size
    print(f"{args.output}: {nbytes} bytes ({nbytes * 8 / (h * w):.3f} bpp)")


def _shape_to_list(shape):
    if isinstance(shape, dict):
        return ["D"] + [x for k, v in sorted(shape.items())
                        for x in (k, _shape_to_list(v))]
    if isinstance(shape, (list, tuple)):
        return ["L"] + [_shape_to_list(s) for s in shape]
    return int(shape)


def _shape_from_list(lst):
    if isinstance(lst, (int, np.integer)):
        return int(lst)
    lst = list(lst)
    tag = lst[0]
    if tag == "D":
        rest = lst[1:]
        return {
            rest[i]: _shape_from_list(rest[i + 1]) for i in range(0, len(rest), 2)
        }
    if tag == "L":
        return tuple(_shape_from_list(s) for s in lst[1:])
    raise ValueError(lst)


def decode(args):
    from flashgmm_tpu.datasets.image import save_image
    from flashgmm_tpu.ops import compute_padding, unpad_image
    from flashgmm_tpu.zoo import create_model

    with open(args.input, "rb") as f:
        assert f.read(4) == MAGIC, "not a FGMT file"
        arch_id, quality, h, w = struct.unpack("<BBHH", f.read(6))
        shape_lst = _read_stream(f)
        assert shape_lst[0] == "SHAPE"
        shape = _shape_from_list(shape_lst[1])
        strings = list(_read_stream(f))
        extra = f.read(4)
        kwargs = {}
        if len(extra) == 4:
            kwargs["abs_max"] = struct.unpack("<i", extra)[0]

    arch = ARCHS[arch_id]
    model = create_model(arch, quality, weights_path=args.weights)
    model.update(force=False)

    out = model.decompress(strings, shape, **kwargs)
    _, unpad = compute_padding(h, w, min_div=64)
    x_hat = unpad_image(out["x_hat"], unpad)
    save_image(args.output, np.asarray(x_hat[0]))
    print(f"decoded {args.input} -> {args.output} ({h}x{w})")


MAGIC_V = b"FGMV"


def _load_video_frames(path, max_frames=0):
    """.yuv file (RawVideoSequence) or a directory of image frames ->
    list of [1, H, W, 3] float RGB arrays."""
    import jax.numpy as jnp

    p = Path(path)
    frames = []
    if p.is_dir():
        from flashgmm_tpu.datasets.image import IMG_EXTENSIONS, load_image

        files = sorted(f for f in p.iterdir()
                       if f.suffix.lower() in IMG_EXTENSIONS)
        if max_frames:
            files = files[:max_frames]
        for f in files:
            frames.append(jnp.asarray(load_image(f))[None])
    else:
        from flashgmm_tpu.datasets.rawvideo import RawVideoSequence
        from flashgmm_tpu.transforms import ycbcr2rgb, yuv_420_to_444

        seq = RawVideoSequence(p)
        n = len(seq) if not max_frames else min(max_frames, len(seq))
        for i in range(n):
            y, u, v = seq.to_float(seq[i])
            yuv = yuv_420_to_444(
                (jnp.asarray(y)[None, :, :, None],
                 jnp.asarray(u)[None, :, :, None],
                 jnp.asarray(v)[None, :, :, None]))
            frames.append(jnp.clip(ycbcr2rgb(yuv), 0, 1))
    if not frames:
        raise SystemExit(f"no frames found in {path}")
    return frames


def _make_video_model(quality, weights):
    from flashgmm_tpu.zoo import create_model

    model = create_model("ssf2020", quality, weights_path=weights)
    model.update(force=True, update_quantiles=weights is None)
    return model


def encode_video(args):
    from flashgmm_tpu.ops import compute_padding, pad_image

    frames = _load_video_frames(args.input, args.frames)
    h, w = frames[0].shape[1:3]
    pad, _ = compute_padding(h, w, min_div=128)
    frames = [pad_image(f, pad) for f in frames]
    model = _make_video_model(args.quality, args.weights)

    with open(args.output, "wb") as f:
        f.write(MAGIC_V)
        f.write(struct.pack("<BHHIB", args.quality, h, w, len(frames),
                            args.gop))
        for g0 in range(0, len(frames), args.gop):
            gop = frames[g0:g0 + args.gop]
            strings, shapes = model.compress(gop)
            _write_stream(f, ["SHAPES", _shape_to_list(tuple(shapes))])
            _write_stream(f, list(strings))
    nbytes = Path(args.output).stat().st_size
    print(f"{args.output}: {nbytes} bytes "
          f"({nbytes * 8 / (h * w * len(frames)):.4f} bpp/frame)")


def decode_video(args):
    from flashgmm_tpu.datasets.image import save_image
    from flashgmm_tpu.ops import compute_padding, unpad_image

    with open(args.input, "rb") as f:
        assert f.read(4) == MAGIC_V, "not a FGMV file"
        quality, h, w, n_frames, gop = struct.unpack("<BHHIB", f.read(10))
        model = _make_video_model(quality, args.weights)
        outdir = Path(args.output)
        outdir.mkdir(parents=True, exist_ok=True)
        _, unpad = compute_padding(h, w, min_div=128)
        idx = 0
        while idx < n_frames:
            shapes_lst = _read_stream(f)
            assert shapes_lst[0] == "SHAPES"
            shapes = list(_shape_from_list(shapes_lst[1]))
            strings = _listify(_read_stream(f))
            rec = model.decompress(strings, shapes)
            for fr in rec:
                fr = unpad_image(fr, unpad)
                save_image(outdir / f"frame_{idx:05d}.png",
                           np.asarray(fr[0]))
                idx += 1
    print(f"decoded {args.input} -> {args.output} ({idx} frames {h}x{w})")


def main(argv=None):
    args = setup_args(argv)
    if args.command == "encode":
        encode(args)
    elif args.command == "decode":
        decode(args)
    elif args.command == "encode_video":
        encode_video(args)
    else:
        decode_video(args)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
