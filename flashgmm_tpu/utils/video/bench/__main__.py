"""Benchmark classical video codecs (x264/x265 via ffmpeg, VTM) on raw YUV
sequences (cf. compressai/utils/video/bench/__main__.py).

Requires the codec binaries on PATH; raises a clear error otherwise.
"""

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np


def setup_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("codec", choices=["x264", "x265"])
    p.add_argument("sequence", type=str, help=".yuv path (name_WxH_fps_420)")
    p.add_argument("-q", "--qps", type=int, nargs="+", default=[22, 27, 32, 37])
    p.add_argument("-f", "--frames", type=int, default=32)
    p.add_argument("-o", "--output", type=str)
    return p.parse_args(argv)


def run_ffmpeg_codec(codec, seq_path, qp, frames):
    from flashgmm_tpu.datasets.rawvideo import get_raw_video_file_info

    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg binary not found on PATH")
    info = get_raw_video_file_info(seq_path)
    w, h, fps = info["width"], info["height"], info["fps"]
    lib = {"x264": "libx264", "x265": "libx265"}[codec]
    with tempfile.TemporaryDirectory() as tmp:
        out = Path(tmp) / "out.mkv"
        cmd = [
            "ffmpeg", "-y", "-s", f"{w}x{h}", "-pix_fmt", "yuv420p",
            "-framerate", str(fps), "-i", seq_path, "-frames:v", str(frames),
            "-c:v", lib, "-qp", str(qp), "-preset", "medium", str(out),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        nbytes = out.stat().st_size
    return {
        "bpp": nbytes * 8.0 / (w * h * frames),
        "qp": qp,
    }


def main(argv=None):
    args = setup_args(argv)
    results = {"bpp": [], "qp": []}
    for qp in args.qps:
        rv = run_ffmpeg_codec(args.codec, args.sequence, qp, args.frames)
        for k, v in rv.items():
            results[k].append(v)
    output = {"name": args.codec, "results": results}
    print(json.dumps(output, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(output, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
