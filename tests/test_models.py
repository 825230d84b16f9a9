"""End-to-end model tests: forward, RD loss, compress/decompress round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.losses import rate_distortion_loss
from flashgmm_tpu.models import (
    FactorizedPrior,
    MeanScaleHyperprior,
    ScaleHyperprior,
)


def _image(b=1, h=64, w=64, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(b, h, w, 3).astype(np.float32))


class TestFactorizedPrior:
    def test_forward_and_loss(self):
        net = FactorizedPrior(32, 48, rngs=nnx.Rngs(0))
        x = _image()
        out = net(x, training=True, key=jax.random.key(0))
        assert out["x_hat"].shape == x.shape
        assert set(out["likelihoods"]) == {"y"}
        loss = rate_distortion_loss(out, x, lmbda=0.01)
        assert np.isfinite(float(loss["loss"]))
        assert float(loss["bpp_loss"]) > 0

    def test_compress_decompress(self):
        net = FactorizedPrior(32, 48, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        x = _image()
        out = net.compress(x)
        assert len(out["strings"]) == 1
        assert out["shape"] == (4, 4)
        rec = net.decompress(out["strings"], out["shape"])
        assert rec["x_hat"].shape == x.shape
        assert jnp.all(rec["x_hat"] >= 0) and jnp.all(rec["x_hat"] <= 1)

    def test_deterministic_roundtrip(self):
        """decompress(compress(x)) must equal the quantized-latent forward."""
        net = FactorizedPrior(32, 48, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        x = _image()
        out = net.compress(x)
        rec1 = net.decompress(out["strings"], out["shape"])
        rec2 = net.decompress(out["strings"], out["shape"])
        np.testing.assert_array_equal(rec1["x_hat"], rec2["x_hat"])


class TestHyperpriors:
    @pytest.mark.parametrize("cls", [ScaleHyperprior, MeanScaleHyperprior])
    def test_forward(self, cls):
        net = cls(32, 48, rngs=nnx.Rngs(0))
        x = _image()
        out = net(x, training=True, key=jax.random.key(0))
        assert out["x_hat"].shape == x.shape
        assert set(out["likelihoods"]) == {"y", "z"}

    @pytest.mark.parametrize("cls", [ScaleHyperprior, MeanScaleHyperprior])
    def test_compress_decompress(self, cls):
        net = cls(32, 48, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        x = _image()
        out = net.compress(x)
        assert len(out["strings"]) == 2
        rec = net.decompress(out["strings"], out["shape"])
        assert rec["x_hat"].shape == x.shape

    def test_mean_scale_search_coder(self):
        """FlashGMM-style table-free GSM path on the mean-scale model."""
        net = MeanScaleHyperprior(32, 48, coder="search", rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        x = _image()
        out = net.compress(x)
        rec = net.decompress(out["strings"], out["shape"], abs_max=out["abs_max"])
        assert rec["x_hat"].shape == x.shape

    def test_table_and_search_reconstructions_match(self):
        """Both coding paths decode to the same y_hat -> same x_hat."""
        net_t = MeanScaleHyperprior(32, 48, coder="table", rngs=nnx.Rngs(7))
        net_s = MeanScaleHyperprior(32, 48, coder="search", rngs=nnx.Rngs(7))
        # share weights
        nnx.update(net_s, nnx.state(net_t))
        net_t.update(update_quantiles=True)
        net_s.update(update_quantiles=True)
        x = _image(seed=3)
        out_t = net_t.compress(x)
        out_s = net_s.compress(x)
        rec_t = net_t.decompress(out_t["strings"], out_t["shape"])
        rec_s = net_s.decompress(out_s["strings"], out_s["shape"],
                                 abs_max=out_s["abs_max"])
        np.testing.assert_allclose(
            rec_t["x_hat"], rec_s["x_hat"], atol=1e-5
        )
