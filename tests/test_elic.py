"""ELIC (channel groups x checkerboard GMM) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.models.elic_gmm import Elic2022GMM


@pytest.fixture(scope="module")
def net():
    net = Elic2022GMM(N=32, M=64, K=2, groups=[8, 8, 16, 16, 16], rngs=nnx.Rngs(0))
    net.update(update_quantiles=True)
    return net


class TestElicGMM:
    def test_forward(self, net):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        out = net(x, training=True, key=jax.random.key(0))
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 64)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 32)

    def test_compress_decompress_exact_y_hat(self, net):
        x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
        c = net.compress(x)
        # 5 groups x 2 checkerboard passes + z
        assert len(c["strings"]) == 11
        y_out = net.latent_codec.decompress(c["strings"], c["shape"])
        np.testing.assert_array_equal(
            np.asarray(y_out["y_hat"]), np.asarray(c["y_hat"])
        )

    def test_decompress_image(self, net):
        x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32))
        c = net.compress(x)
        r = net.decompress(c["strings"], c["shape"])
        assert r["x_hat"].shape == x.shape
