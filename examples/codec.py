"""File-format codec CLI: encode images to self-contained .fgm files.

Equivalent of the reference's examples/codec.py (header layout
:148-199): a small header (magic, model id, quality, original size)
followed by the per-stream payloads.

Usage:
    python examples/codec.py encode input.png -o out.fgm \
        -a cheng2020-anchor-checkerboard-gmm --weights ckpt
    python examples/codec.py decode out.fgm -o rec.png --weights ckpt
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
    raise ValueError(tag)


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


def main(argv=None):
    args = setup_args(argv)
    if args.command == "encode":
        encode(args)
    else:
        decode(args)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
