"""Golden-file regression tests (the reference's GENERATE_EXPECTED pattern,
tests/test_eval_model.py / test_train.py).

Regenerate with:  GENERATE_EXPECTED=1 python -m pytest tests/test_golden.py
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

EXPECTED_DIR = Path(__file__).parent / "expected"
GENERATE = os.environ.get("GENERATE_EXPECTED") == "1"


def _check_or_generate(name, results, rtol=1e-4):
    EXPECTED_DIR.mkdir(exist_ok=True)
    path = EXPECTED_DIR / f"{name}.json"
    if GENERATE or not path.exists():
        with open(path, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        if GENERATE:
            pytest.skip(f"generated {path}")
    with open(path) as f:
        expected = json.load(f)
    assert set(results) == set(expected)
    for k, v in expected.items():
        np.testing.assert_allclose(results[k], v, rtol=rtol, err_msg=k)


class TestGoldenEval:
    def test_factorized_entropy_estimation(self):
        """eval_model numbers on the fake dataset must stay stable."""
        import io
        from contextlib import redirect_stdout

        from flashgmm_tpu.utils.eval_model.__main__ import main

        buf = io.StringIO()
        with redirect_stdout(buf):
            main([
                "random", str(Path(__file__).parent / "assets/fakedata/imagefolder/test"),
                "-a", "bmshj2018-factorized", "-N", "32", "-M", "48",
                "--entropy-estimation",
            ])
        out = json.loads(buf.getvalue())
        results = {
            k: v for k, v in out["results"].items()
            if "time" not in k
        }
        _check_or_generate("eval_factorized_ee", results)


class TestGoldenTrain:
    def test_seeded_train_losses(self):
        """A few seeded train steps produce stable losses (training
        determinism; reference tests/test_train.py:44-90)."""
        import jax
        import jax.numpy as jnp
        from flax import nnx

        from flashgmm_tpu.models import FactorizedPrior
        from flashgmm_tpu.parallel import make_train_state
        from flashgmm_tpu.parallel.train import data_parallel_train_step

        model = FactorizedPrior(16, 24, rngs=nnx.Rngs(42))
        opt_net, opt_aux = make_train_state(model, 1e-4, 1e-3)
        rs = np.random.RandomState(42)
        x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32))
        key = jax.random.key(42)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            out = data_parallel_train_step(model, opt_net, opt_aux, x, sub, 0.01)
            losses.append(round(float(out["loss"]), 4))
        _check_or_generate("train_seeded_losses", {"losses": losses}, rtol=1e-3)


IMAGE_ARCHS = [
    "bmshj2018-factorized",
    "bmshj2018-factorized-relu",
    "bmshj2018-hyperprior",
    "mbt2018-mean",
    "mbt2018",
    "cheng2020-anchor",
    "cheng2020-attn",
    "cheng2020-anchor-checkerboard",
    "cheng2020-anchor-checkerboard-gmm",
    "elic2022-gaussian",
    "elic2022-official",
    "elic2022-chandelier",
    "sigmoid-cdf",
]


class TestGoldenAllArchs:
    """Per-arch entropy-estimation goldens (reference tests/expected/
    eval JSONs per model): a fixed seeded image through every registered
    image model with a small config must keep producing the same
    bpp/PSNR. Regenerate with GENERATE_EXPECTED=1 after an intentional
    numerics change."""

    @pytest.mark.parametrize("arch", IMAGE_ARCHS)
    def test_arch_entropy_estimation(self, arch):
        import inspect

        import jax
        import jax.numpy as jnp
        from flax import nnx

        from flashgmm_tpu.registry import MODELS

        cls = MODELS[arch]
        sig = inspect.signature(cls.__init__)
        kwargs = {}
        if "N" in sig.parameters:
            kwargs["N"] = 32
        if "M" in sig.parameters:
            kwargs["M"] = 48
        if "K" in sig.parameters:
            kwargs["K"] = 2
        if "groups" in sig.parameters:
            kwargs["groups"] = [8, 8, 32]
        net = cls(**kwargs, rngs=nnx.Rngs(0))

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        out = net(x, training=False)
        num_pixels = 64 * 64
        bpp = sum(
            float(jnp.sum(-jnp.log2(lk)))
            for lk in jax.tree.leaves(out["likelihoods"])
        ) / num_pixels
        mse = float(jnp.mean((out["x_hat"] - x) ** 2))
        results = {"bpp": round(bpp, 6), "mse": round(mse, 8)}
        _check_or_generate(f"arch_ee_{arch}", results, rtol=2e-3)


class TestGoldenFastFormat:
    """Freeze the fast (TPU-native interleaved) bitstream format: fixed
    weights + fixed input must keep producing byte-identical streams, and
    the committed golden stream must keep decoding to the same y_hat.
    Catches accidental format/CDF-math changes. (CPU-XLA specific —
    regenerate with GENERATE_EXPECTED=1 after an intentional change or an
    XLA version bump that perturbs conv ulps.)"""

    def test_fast_bitstream_frozen(self):
        import hashlib

        import jax.numpy as jnp
        from flax import nnx

        from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
        from flashgmm_tpu.runtime import FastCheckerboardGmmCodec

        net = Cheng2020AnchorCheckerboardGMMv2(N=32, K=2, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        codec = FastCheckerboardGmmCodec(net, lanes=64, cap_divisor=1)
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        data, out = codec.encode_to_bytes(x)
        y_shape = tuple(out["y_hat"].shape[1:])

        bin_path = EXPECTED_DIR / "fast_format_ckbd_n32k2.bin"
        if GENERATE or not bin_path.exists():
            with open(bin_path, "wb") as f:
                f.write(data)
        with open(bin_path, "rb") as f:
            golden = f.read()

        # 1. the committed golden stream still decodes to the encoder's y_hat
        y_hat = codec.decode_y_hat(codec.from_bytes(golden, y_shape), y_shape)
        np.testing.assert_array_equal(
            np.asarray(y_hat), np.asarray(out["y_hat"])
        )
        # 2. re-encoding produces the identical bytes (format + CDF math)
        assert hashlib.sha256(data).hexdigest() == hashlib.sha256(golden).hexdigest()
