"""Checkerboard codec + ckbd-GMM flagship model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.latent_codecs.checkerboard import (
    CheckerboardLatentCodec,
    _checkerboard_mask,
)
from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2


class TestCheckerboardSpatial:
    def setup_method(self):
        self.lc = CheckerboardLatentCodec(anchor_parity="even")

    def test_unembed_embed_roundtrip(self):
        y = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))
        y_ = self.lc.unembed(y)
        assert y_.shape == (2, 2, 8, 4, 3)
        np.testing.assert_array_equal(self.lc.embed(y_), y)

    def test_unembed_separates_parities(self):
        h = w = 4
        mask = np.asarray(_checkerboard_mask(h, w, "even"))
        y = jnp.asarray(mask[None, :, :, None].astype(np.float32))
        y_ = self.lc.unembed(y)
        # chunk 0 (anchors, even parity) holds all ones; chunk 1 all zeros
        assert float(y_[0].min()) == 1.0
        assert float(y_[1].max()) == 0.0

    def test_mask_zeroes_parity(self):
        y = jnp.ones((1, 4, 4, 2))
        masked = self.lc._mask(y, "even")
        # 'even' positions zeroed -> half the elements zero
        assert float(masked.sum()) == y.size / 2
        np.testing.assert_array_equal(
            np.asarray(masked[0, :, :, 0]) + np.asarray(_checkerboard_mask(4, 4, "even")),
            np.ones((4, 4)),
        )


class TestCkbdGMMModel:
    @pytest.fixture(scope="class")
    def net(self):
        net = Cheng2020AnchorCheckerboardGMMv2(N=64, K=4, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        return net

    def test_forward_training(self, net):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        out = net(x, training=True, key=jax.random.key(0))
        assert out["x_hat"].shape == x.shape
        assert set(out["likelihoods"]) == {"y", "z"}
        for lk in out["likelihoods"].values():
            assert jnp.all(lk > 0)

    def test_compress_decompress_y_hat_exact(self, net):
        """The decoder must reconstruct y_hat exactly (anchors feed the
        non-anchor context)."""
        x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
        c = net.compress(x)
        assert len(c["strings"]) == 3  # anchor, non-anchor, z
        y_out = net.latent_codec.decompress(c["strings"], c["shape"])
        np.testing.assert_array_equal(
            np.asarray(y_out["y_hat"]), np.asarray(c["y_hat"])
        )

    def test_decompress_reconstruction(self, net):
        x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32))
        c = net.compress(x)
        r = net.decompress(c["strings"], c["shape"])
        assert r["x_hat"].shape == x.shape
        assert jnp.all(r["x_hat"] >= 0) and jnp.all(r["x_hat"] <= 1)

    def test_strings_structure(self, net):
        x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32))
        c = net.compress(x)
        anchor, non_anchor, z = c["strings"]
        # GMM sub-streams carry (bytes, abs_max, zero_bitmap)
        s, abs_max, zero_bitmap = anchor
        assert isinstance(s, bytes) and isinstance(abs_max, int)
        assert zero_bitmap.shape == (64,)
        assert isinstance(z[0], bytes)
