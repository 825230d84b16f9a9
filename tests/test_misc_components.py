"""Coverage for the smaller subsystems: gain codecs, registry, zoo,
rawvideo parsing, dataset wrappers, interleave layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx


class TestGainCodecs:
    def test_gain_hyperprior_roundtrip(self):
        from flashgmm_tpu.entropy_models import EntropyBottleneck
        from flashgmm_tpu.latent_codecs import (
            GainHyperLatentCodec,
            GainHyperpriorLatentCodec,
            GaussianConditionalLatentCodec,
        )
        from flashgmm_tpu.layers import Sequential, conv, deconv
        from flashgmm_tpu.models.base import get_scale_table

        rngs = nnx.Rngs(0)
        C = 8
        lc = GainHyperpriorLatentCodec(latent_codec={
            "y": GaussianConditionalLatentCodec(quantizer="ste"),
            "hyper": GainHyperLatentCodec(
                entropy_bottleneck=EntropyBottleneck(C, rngs=rngs),
                h_a=conv(C, C, kernel_size=3, stride=1, rngs=rngs),
                h_s=conv(C, 2 * C, kernel_size=3, stride=1, rngs=rngs),
            ),
        })
        gc = lc.latent_codec["y"].gaussian_conditional
        gc.update_scale_table(get_scale_table())
        lc.latent_codec["hyper"].entropy_bottleneck.update(update_quantiles=True)

        y = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, C).astype(np.float32))
        ones = jnp.ones((C,))
        out = lc(y, ones * 2, ones, ones * 0.5, ones, training=False)
        assert out["y_hat"].shape == y.shape
        c = lc.compress(y, ones * 2, ones, ones * 0.5, ones)
        d = lc.decompress(c["strings"], c["shape"], ones * 0.5, ones)
        np.testing.assert_allclose(
            np.asarray(d["y_hat"]), np.asarray(c["y_hat"]), atol=1e-6
        )


class TestRegistryAndZoo:
    def test_registry_has_all_models(self):
        from flashgmm_tpu.registry import MODELS

        expected = [
            "bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean",
            "mbt2018", "cheng2020-anchor", "cheng2020-attn",
            "cheng2020-anchor-checkerboard", "cheng2020-anchor-checkerboard-gmm",
            "elic2022-official", "elic2022-gaussian", "elic2022-chandelier",
            "ssf2020", "bmshj2018-hyperprior-vbr", "mbt2018-mean-vbr",
            "mbt2018-vbr", "sfu-pcc-rec-pointnet", "sigmoid-cdf",
        ]
        for name in expected:
            assert name in MODELS, name

    def test_zoo_create_model(self):
        from flashgmm_tpu.zoo import create_model

        net = create_model("bmshj2018-factorized", quality=1)
        assert net.N == 128 and net.M == 192
        with pytest.raises(ValueError):
            create_model("bmshj2018-factorized", quality=99)

    def test_zoo_pretrained_local_weights(self):
        from flashgmm_tpu.zoo.image import image_models, local_weights

        # the smallest shipped checkpoint: factorized prior
        net = image_models("bmshj2018-factorized", quality=4, pretrained=True)
        assert net.N == 128 and net.M == 192
        # a (arch, quality) slot with no shipped weights raises with the
        # available table in the message
        with pytest.raises(RuntimeError, match="No shipped weights"):
            image_models("bmshj2018-factorized", quality=1, pretrained=True)
        # every table entry points at a file that exists in the repo
        from flashgmm_tpu.zoo.image import _local_weights_path

        for key in local_weights:
            arch, q = key[0], key[1]
            metric = key[2] if len(key) == 3 else "mse"
            assert _local_weights_path(arch, q, metric) is not None, key

    def test_entropy_coder_registry(self):
        import flashgmm_tpu

        assert flashgmm_tpu.get_entropy_coder() == "rans"
        assert "rans" in flashgmm_tpu.available_entropy_coders()
        with pytest.raises(ValueError):
            flashgmm_tpu.set_entropy_coder("bogus")


class TestRawVideo:
    def test_filename_parsing(self):
        from flashgmm_tpu.datasets import get_raw_video_file_info

        info = get_raw_video_file_info("Beauty_1920x1080_120fps_420_8bit.yuv")
        assert info["width"] == 1920 and info["height"] == 1080
        assert info["fps"] == 120.0 and info["bitdepth"] == 8

    def test_sequence_reader(self, tmp_path):
        from flashgmm_tpu.datasets import RawVideoSequence

        w, h, n = 16, 8, 3
        y = np.arange(n * h * w, dtype=np.uint8).reshape(n, h, w)
        u = np.zeros((n, h // 2, w // 2), np.uint8)
        v = np.full((n, h // 2, w // 2), 128, np.uint8)
        path = tmp_path / "test_16x8_30_420.yuv"
        with open(path, "wb") as f:
            for i in range(n):
                f.write(y[i].tobytes())
                f.write(u[i].tobytes())
                f.write(v[i].tobytes())
        seq = RawVideoSequence(path)
        assert len(seq) == 3
        fy, fu, fv = seq[1]
        np.testing.assert_array_equal(fy, y[1])
        np.testing.assert_array_equal(fv, v[1])


class TestDatasetWrappers:
    def test_wrappers(self):
        from flashgmm_tpu.datasets import (
            CacheDataset,
            NdArrayDataset,
            StackDataset,
        )

        a = NdArrayDataset(np.arange(10))
        assert len(a) == 10 and a[3] == 3
        c = CacheDataset(a)
        assert c[5] == 5 and c[5] == 5
        s = StackDataset(a, a)
        assert s[2] == (2, 2)

    def test_pointcloud_loader(self, tmp_path):
        from flashgmm_tpu.datasets import PointCloudFolder

        d = tmp_path / "train"
        d.mkdir()
        np.save(d / "a.npy", np.random.rand(500, 3).astype(np.float32))
        ds = PointCloudFolder(tmp_path, split="train", num_points=128)
        pts = ds[0]
        assert pts.shape == (128, 3)
        assert pts.min() >= 0 and pts.max() <= 1


class TestBasicLayers:
    def test_interleave_reshape_transpose(self):
        from flashgmm_tpu.layers import Interleave, Reshape, Transpose

        x = jnp.arange(1 * 2 * 2 * 4, dtype=jnp.float32).reshape(1, 2, 2, 4)
        out = Interleave(2)(x)
        assert out.shape == x.shape
        assert Reshape((2, 2, 4))(x.reshape(1, -1)).shape == (1, 2, 2, 4)
        assert Transpose((0, 3, 1, 2))(x).shape == (1, 4, 2, 2)


class TestVideoEvalCLI:
    def test_entropy_estimation_pipeline(self, tmp_path):
        """video eval_model CLI end-to-end on a tiny synthetic YUV420
        sequence (estimation mode): yuv parse -> RGB -> GOP forward ->
        RGB/YUV metrics."""
        import io
        import json
        from contextlib import redirect_stdout

        import numpy as np

        from flashgmm_tpu.utils.video.eval_model.__main__ import main

        w, h, frames = 64, 64, 2
        rng = np.random.RandomState(0)
        seq_path = tmp_path / "test_64x64_24fps_420.yuv"
        with open(seq_path, "wb") as f:
            for _ in range(frames):
                f.write(rng.randint(0, 255, w * h * 3 // 2, dtype=np.uint8
                                    ).astype(np.uint8).tobytes())
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main([str(seq_path), "-f", "2", "--gop", "2"])
        assert rc == 0
        out = json.loads(buf.getvalue())
        res = out["results"]
        for k in ("psnr-rgb", "psnr-yuv", "ms-ssim-rgb", "bpp"):
            assert np.isfinite(res[k]), k

    def test_video_bench_commands(self):
        """Video bench pipelines construct correct encoder/decoder
        commands (binaries themselves absent in this environment)."""
        from flashgmm_tpu.utils.video.bench.__main__ import (
            _ffmpeg_decode_cmd,
            _ffmpeg_encode_cmd,
            _vtm_decode_cmd,
            _vtm_encode_cmd,
        )

        enc = _ffmpeg_encode_cmd("libx265", "s.yuv", 640, 480, 30, 27, 16, "o.mkv")
        assert enc[0] == "ffmpeg" and "-qp" in enc and "libx265" in enc
        dec = _ffmpeg_decode_cmd("o.mkv", 640, 480, "r.yuv")
        assert dec[0] == "ffmpeg" and "rawvideo" in dec
        enc = _vtm_encode_cmd("/b", "cfg", "s.yuv", 640, 480, 30, 32, 16, "o.bin")
        assert enc[0].endswith("EncoderAppStatic") and "--InputChromaFormat=420" in enc
        dec = _vtm_decode_cmd("/b", "o.bin", "r.yuv")
        assert dec[0].endswith("DecoderAppStatic")


class TestZooNpz:
    def test_save_load_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from flax import nnx

        from flashgmm_tpu.models.google import FactorizedPrior
        from flashgmm_tpu.zoo import load_npz_weights, save_npz_weights

        net = FactorizedPrior(32, 64, rngs=nnx.Rngs(0))
        path = str(tmp_path / "w.npz")
        save_npz_weights(net, path)
        net2 = FactorizedPrior(32, 64, rngs=nnx.Rngs(9))
        n = load_npz_weights(net2, path)
        assert n > 10
        w1 = nnx.to_flat_state(nnx.state(net, nnx.Param))
        w2 = nnx.to_flat_state(nnx.state(net2, nnx.Param))
        for (p1, v1), (p2, v2) in zip(w1, w2):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(v1.value), np.asarray(v2.value), atol=1e-3
            )

    def test_load_missing_returns_zero(self):
        from flax import nnx

        from flashgmm_tpu.models.google import FactorizedPrior
        from flashgmm_tpu.zoo import load_npz_weights

        net = FactorizedPrior(32, 64, rngs=nnx.Rngs(0))
        assert load_npz_weights(net, "/nonexistent/w.npz") == 0
