"""Video / point-cloud training entry points (examples/train_video.py,
examples/train_pointcloud.py) and their train steps (parallel/train.py).

Mirrors the reference's examples/train_video.py / train_pointcloud.py
surface; CLI tests run one tiny step end-to-end on fake data (the
reference's tests/test_train.py fakedata pattern).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx


class TestVideoTrainStep:
    def test_step_finite_and_updates(self):
        from flashgmm_tpu.models.video.google import ScaleSpaceFlow
        from flashgmm_tpu.parallel import make_train_state
        from flashgmm_tpu.parallel.train import video_train_step

        model = ScaleSpaceFlow(rngs=nnx.Rngs(0))
        opt_net, opt_aux = make_train_state(model)
        rng = np.random.RandomState(0)
        # 128: smallest size keeping the hyper branch shapes aligned
        # (x/16 must be divisible by the hyperprior's 8x downsampling)
        frames = tuple(
            jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
            for _ in range(2)
        )
        before = np.asarray(model.img_encoder.layers[0].kernel.value)
        out = video_train_step(
            model, opt_net, opt_aux, frames, jax.random.key(0), lmbda=1e-2
        )
        for k in ("loss", "bpp_loss", "mse_loss", "aux_loss"):
            assert np.isfinite(float(out[k])), k
        after = np.asarray(model.img_encoder.layers[0].kernel.value)
        assert not np.allclose(before, after)


class TestPointcloudTrainStep:
    def test_chamfer_step(self):
        from flashgmm_tpu.models.pointcloud import PointNetReconstructionPccModel
        from flashgmm_tpu.parallel import make_train_state
        from flashgmm_tpu.parallel.train import pointcloud_train_step

        model = PointNetReconstructionPccModel(
            num_points=64, latent_dim=32, rngs=nnx.Rngs(0)
        )
        opt_net, opt_aux = make_train_state(model)
        pts = jnp.asarray(
            np.random.RandomState(1).rand(2, 64, 3).astype(np.float32)
        )
        out = pointcloud_train_step(
            model, opt_net, opt_aux, pts, jax.random.key(1),
            loss_type="chamfer", lmbda=1.0,
        )
        for k in ("loss", "bpp_loss", "chamfer_loss", "aux_loss"):
            assert np.isfinite(float(out[k])), k


class TestCliEntrypoints:
    def test_train_pointcloud_cli(self, tmp_path):
        from examples.train_pointcloud import main

        root = tmp_path / "clouds" / "train"
        root.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(2):
            np.save(root / f"{i}.npy", rng.rand(200, 3).astype(np.float32))
        rc = main([
            "-d", str(tmp_path / "clouds"), "--num-points", "64",
            "--batch-size", "2", "--epochs", "1", "--steps-per-epoch", "1",
            "--checkpoint-dir", str(tmp_path / "ck"), "--num-workers", "1",
        ])
        assert rc == 0
        assert (tmp_path / "ck" / "latest").exists()

    def test_train_video_cli(self, tmp_path):
        pytest.importorskip("PIL")
        from PIL import Image

        from examples.train_video import main

        seq = tmp_path / "sequences" / "00001" / "0001"
        seq.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(1, 4):
            Image.fromarray(
                (rng.rand(128, 128, 3) * 255).astype(np.uint8)
            ).save(seq / f"im{i}.png")
        (tmp_path / "sep_trainlist.txt").write_text("00001/0001\n")
        rc = main([
            "-d", str(tmp_path), "--tuplet", "2", "--patch-size", "128",
            "--batch-size", "1", "--epochs", "1", "--steps-per-epoch", "1",
            "--checkpoint-dir", str(tmp_path / "ck"), "--num-workers", "1",
        ])
        assert rc == 0
        assert (tmp_path / "ck" / "latest").exists()
