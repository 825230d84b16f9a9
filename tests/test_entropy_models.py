"""Entropy-model tests, mirroring the reference strategy
(tests/test_entropy_models.py in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
    GaussianMixtureConditional,
)


class TestEntropyModelQuantize:
    def setup_method(self):
        self.em = EntropyBottleneck(4, rngs=nnx.Rngs(0))

    def test_invalid_mode(self):
        with pytest.raises(ValueError):
            self.em.quantize(jnp.zeros((2, 2)), "bad")

    def test_noise_within_half(self):
        x = jnp.zeros((64, 64))
        y = self.em.quantize(x, "noise", key=jax.random.key(0))
        assert jnp.all(jnp.abs(y - x) <= 0.5)

    def test_symbols(self):
        x = jnp.array([0.4, 1.6, -2.4])
        out = self.em.quantize(x, "symbols")
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(out, [0, 2, -2])

    def test_dequantize_with_means(self):
        x = jnp.array([1.4, -0.6])
        means = jnp.array([0.5, 0.5])
        out = self.em.quantize(x, "dequantize", means)
        np.testing.assert_allclose(out, [1.5, -0.5])


class TestEntropyBottleneck:
    def test_forward_shapes(self):
        eb = EntropyBottleneck(16, rngs=nnx.Rngs(0))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16).astype(np.float32))
        y, lk = eb(x, training=True, key=jax.random.key(1))
        assert y.shape == x.shape and lk.shape == x.shape
        assert jnp.all(lk > 0) and jnp.all(lk <= 1)

    def test_forward_inference_rounds(self):
        eb = EntropyBottleneck(8, rngs=nnx.Rngs(0))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 8).astype(np.float32))
        y, _ = eb(x, training=False)
        medians = eb._get_medians()[:, 0, 0]
        expected = jnp.round(x - medians) + medians
        np.testing.assert_allclose(y, expected, atol=1e-6)

    def test_loss_positive(self):
        eb = EntropyBottleneck(8, rngs=nnx.Rngs(0))
        assert float(eb.loss()) > 0

    def test_update_builds_tables(self):
        eb = EntropyBottleneck(8, rngs=nnx.Rngs(0))
        assert eb.update() is True
        assert eb.quantized_cdf.shape[0] == 8
        assert eb.cdf_length.shape == (8,)
        assert eb.update() is False  # no force
        assert eb.update(force=True) is True

    def test_compress_decompress_roundtrip(self):
        eb = EntropyBottleneck(8, rngs=nnx.Rngs(0))
        eb.update(update_quantiles=True)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 8).astype(np.float32))
        strings = eb.compress(x)
        assert len(strings) == 2
        x_hat = eb.decompress(strings, (8, 8))
        medians = eb._get_medians()[:, 0, 0]
        expected = jnp.round(x - medians) + medians
        np.testing.assert_allclose(x_hat, expected, atol=1e-5)


class TestGaussianConditional:
    def test_invalid_scale_table(self):
        with pytest.raises(ValueError):
            GaussianConditional(scale_table=0.5)
        with pytest.raises(ValueError):
            GaussianConditional(scale_table=[])
        with pytest.raises(ValueError):
            GaussianConditional(scale_table=[3, 2, 1])

    def test_forward(self):
        gc = GaussianConditional()
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
        scales = jnp.asarray(np.abs(rs.randn(1, 8, 8, 4)).astype(np.float32) + 0.2)
        y, lk = gc(x, scales, training=True, key=jax.random.key(0))
        assert jnp.all(jnp.abs(y - x) <= 0.5)
        assert jnp.all(lk > 0) and jnp.all(lk <= 1)

    def test_table_roundtrip(self):
        from flashgmm_tpu.models.base import get_scale_table

        gc = GaussianConditional()
        gc.update_scale_table(get_scale_table())
        rs = np.random.RandomState(0)
        x = jnp.asarray((rs.randn(1, 8, 8, 4) * 3).astype(np.float32))
        scales = jnp.asarray(np.abs(rs.randn(1, 8, 8, 4)).astype(np.float32) + 0.2)
        means = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
        indexes = gc.build_indexes(scales)
        strings = gc.compress(x, indexes, means)
        x_hat = gc.decompress(strings, indexes, means=means)
        np.testing.assert_allclose(x_hat, jnp.round(x - means) + means, atol=1e-5)

    def test_search_roundtrip(self):
        gc = GaussianConditional()
        rs = np.random.RandomState(0)
        x = jnp.asarray((rs.randn(1, 8, 8, 4) * 3).astype(np.float32))
        scales = jnp.asarray(np.abs(rs.randn(1, 8, 8, 4)).astype(np.float32) + 0.2)
        means = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
        strings, abs_max = gc.compress_search(x, scales, means)
        x_hat = gc.decompress_search(strings, scales, abs_max, means=means)
        np.testing.assert_allclose(x_hat, jnp.round(x - means) + means, atol=1e-5)


class TestGaussianMixtureConditional:
    K = 3

    def _params(self, rs, b, h, w, m):
        scales = jnp.asarray(
            np.abs(rs.randn(b, h, w, self.K * m)).astype(np.float32) + 0.2
        )
        means = jnp.asarray(rs.randn(b, h, w, self.K * m).astype(np.float32))
        raw_w = rs.rand(b, h, w, self.K, m).astype(np.float32)
        weights = raw_w / raw_w.sum(axis=3, keepdims=True)
        weights = jnp.asarray(weights.reshape(b, h, w, self.K * m))
        return scales, means, weights

    def test_training_forward_noise(self):
        gmm = GaussianMixtureConditional(K=self.K)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
        scales, means, weights = self._params(rs, 1, 8, 8, 4)
        y, lk = gmm(x, scales, means, weights, training=True, key=jax.random.key(0))
        assert jnp.all(jnp.abs(y - x) <= 0.5)
        assert jnp.all(lk > 0) and jnp.all(lk <= 1)

    def test_inference_rounds(self):
        gmm = GaussianMixtureConditional(K=self.K)
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
        scales, means, weights = self._params(rs, 1, 8, 8, 4)
        y, _ = gmm(x, scales, means, weights, training=False)
        np.testing.assert_allclose(y, jnp.round(x))

    def test_k1_degenerates_to_gaussian_conditional(self):
        """K=1 likelihoods equal GaussianConditional (reference
        test_entropy_models.py:456-476)."""
        gmm = GaussianMixtureConditional(K=1)
        gc = GaussianConditional()
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
        scales = jnp.asarray(np.abs(rs.randn(2, 8, 8, 4)).astype(np.float32) + 0.2)
        means = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
        weights = jnp.ones_like(scales)
        y1, lk1 = gmm(x, scales, means, weights, training=False)
        # GMM quantizes with means=None
        lk2 = gc._likelihood(jnp.round(x), scales, means)
        lk2 = gc._likelihood_lower_bound(lk2)
        np.testing.assert_allclose(lk1, lk2, rtol=1e-5, atol=1e-7)

    def test_compress_decompress_roundtrip(self):
        gmm = GaussianMixtureConditional(K=self.K)
        rs = np.random.RandomState(0)
        x = jnp.asarray((rs.randn(1, 8, 8, 6) * 2).astype(np.float32))
        # zero out some channels entirely to exercise the zero_bitmap
        x = x.at[..., 2].set(0.0)
        x = x.at[..., 5].set(0.0)
        scales, means, weights = self._params(rs, 1, 8, 8, 6)
        (string, abs_max, zero_bitmap), y_q = gmm.compress(x, scales, means, weights)
        np.testing.assert_array_equal(
            np.asarray(zero_bitmap), [1, 1, 0, 1, 1, 0]
        )
        y_hat = gmm.decompress(string, abs_max, zero_bitmap, scales, means, weights)
        np.testing.assert_allclose(y_hat, jnp.round(x), atol=1e-6)


class TestHostMathMode:
    def test_gmm_model_roundtrip_host_math(self, monkeypatch):
        """FLASHGMM_HOST_MATH=1 routes model-level GMM coding through the
        reference-exact host coder; round-trip must stay exact."""
        import numpy as _np

        from flashgmm_tpu.ans import cext
        from flashgmm_tpu.entropy_models import GaussianMixtureConditional

        if not cext.available():
            import pytest as _pytest

            _pytest.skip("host coder unavailable")
        monkeypatch.setenv("FLASHGMM_HOST_MATH", "1")
        em = GaussianMixtureConditional(K=2)
        rng = _np.random.RandomState(5)
        b, h, w, m = 1, 8, 8, 6
        y = jnp.asarray(rng.randn(b, h, w, m).astype(_np.float32) * 3)
        scales = jnp.asarray(
            rng.rand(b, h, w, 2 * m).astype(_np.float32) * 2 + 0.2
        )
        means = jnp.asarray(rng.randn(b, h, w, 2 * m).astype(_np.float32))
        weights = jnp.asarray(
            jax.nn.softmax(
                jnp.asarray(rng.randn(b, h, w, 2, m).astype(_np.float32)),
                axis=3,
            ).reshape(b, h, w, 2 * m)
        )
        (s, abs_max, bitmap), y_q = em.compress(y, scales, means, weights)
        y_hat = em.decompress(s, abs_max, bitmap, scales, means, weights)
        _np.testing.assert_array_equal(_np.asarray(y_hat), _np.asarray(y_q))
