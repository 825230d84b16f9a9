"""Fully on-device fast codec: jitted encode/decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from flashgmm_tpu.runtime import FastCheckerboardGmmCodec


@pytest.fixture(scope="module")
def setup():
    net = Cheng2020AnchorCheckerboardGMMv2(N=64, K=4, rngs=nnx.Rngs(0))
    net.update(update_quantiles=True)
    # untrained model + random input = near-max-entropy streams, so test
    # with the cap disabled; the capped+fallback path is tested separately
    codec = FastCheckerboardGmmCodec(net, lanes=64, cap_divisor=1)
    return net, codec


class TestFastCodec:
    def test_encode_decode_reconstruction(self, setup):
        net, codec = setup
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        out = codec.encode(x)
        y_shape = tuple(out["y_hat"].shape[1:])
        x_hat = codec.decode(out, y_shape)
        assert x_hat.shape == x.shape
        # The decoder's reconstruction must match g_s applied to the
        # encoder's y_hat. The codec runs g_s in bf16 (the entropy path
        # stays exact — see test below), so compare against the same bf16
        # transform; allow bf16-ULP wiggle across separate jit programs.
        ref = jnp.clip(codec._transform(net.g_s, out["y_hat"]), 0, 1)
        assert float(jnp.max(jnp.abs(x_hat - ref))) < 1e-2
        # and the f32 render stays in the same visual ballpark
        ref32 = jnp.clip(net.g_s(out["y_hat"]), 0, 1)
        mse = float(jnp.mean((x_hat - ref32) ** 2))
        assert mse < 5e-4  # untrained weights amplify bf16 noise

    def test_symbols_roundtrip_exact(self, setup):
        """Decoded y_hat must equal the encoder's y_hat bit-for-bit."""
        net, codec = setup
        x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
        out = codec.encode(x)
        y_shape = tuple(out["y_hat"].shape[1:])
        y_hat_dec = codec.decode_y_hat(out, y_shape)
        np.testing.assert_array_equal(
            np.asarray(y_hat_dec), np.asarray(out["y_hat"])
        )

    def test_serialization(self, setup):
        net, codec = setup
        x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32))
        out = codec.encode(x)
        data = codec.to_bytes(out)
        assert isinstance(data, bytes) and len(data) == codec.num_bytes(out) + 12
        out2 = codec.from_bytes(data, tuple(out["y_hat"].shape[1:]))
        y_shape = tuple(out["y_hat"].shape[1:])
        np.testing.assert_array_equal(
            np.asarray(codec.decode_y_hat(out2, y_shape)),
            np.asarray(out["y_hat"]),
        )

    def test_capped_overflow_fallback(self, setup):
        """High-entropy input overflows the capped buffer; encode_to_bytes
        must fall back to the uncapped encoder transparently."""
        net, _ = setup
        capped = FastCheckerboardGmmCodec(net, lanes=64, cap_divisor=8)
        x = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32))
        data, out = capped.encode_to_bytes(x)
        y_shape = tuple(out["y_hat"].shape[1:])
        streams = capped.from_bytes(data, y_shape)
        y_hat = capped.decode_y_hat(streams, y_shape)
        np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(out["y_hat"]))

    def test_batched_roundtrip(self, setup):
        """Multi-image batched encode/decode (one stream per pass covering
        the whole batch)."""
        net, codec = setup
        x = jnp.asarray(np.random.RandomState(7).rand(2, 64, 64, 3).astype(np.float32))
        out = codec.encode(x)
        assert out["y_hat"].shape[0] == 2
        y_shape = tuple(out["y_hat"].shape)
        y_hat_dec = codec.decode_y_hat(out, y_shape)
        np.testing.assert_array_equal(np.asarray(y_hat_dec), np.asarray(out["y_hat"]))
        data = codec.to_bytes(out)
        streams = codec.from_bytes(data, y_shape)
        x_hat = codec.decode(streams, y_shape)
        assert x_hat.shape == x.shape

    def test_rate_sane(self, setup):
        net, codec = setup
        x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32))
        out = codec.encode(x)
        bpp = codec.num_bytes(out) * 8 / (64 * 64)
        assert 0 < bpp < 30  # untrained model, just sanity


class TestFastElic:
    def test_elic_fast_roundtrip(self):
        from flashgmm_tpu.models.elic_gmm import Elic2022GMM
        from flashgmm_tpu.runtime import FastElicGmmCodec

        net = Elic2022GMM(N=32, M=64, K=2, groups=[8, 8, 16, 16, 16],
                          rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        codec = FastElicGmmCodec(net, lanes=64)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        out = codec.encode(x)
        assert len(out["streams"]) == 11
        y_shape = tuple(out["y_hat"].shape[1:])
        data = codec.to_bytes(out)
        streams = codec.from_bytes(data, y_shape)
        y_hat = codec.decode_y_hat(streams, y_shape)
        np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(out["y_hat"]))
        x_hat = codec.decode(streams, y_shape)
        assert x_hat.shape == x.shape


class TestFastGsm:
    def test_gsm_fast_roundtrip(self):
        """GSM (single-Gaussian checkerboard) fast codec: decoded y_hat must
        equal the encoder's y_hat bit-for-bit, through serialization."""
        from flashgmm_tpu.models.sensetime import Cheng2020AnchorCheckerboard
        from flashgmm_tpu.runtime import FastCheckerboardGsmCodec

        net = Cheng2020AnchorCheckerboard(N=64, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        codec = FastCheckerboardGsmCodec(net, lanes=64, cap_divisor=1)
        x = jnp.asarray(
            np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
        )
        out = codec.encode(x)
        y_shape = tuple(out["y_hat"].shape[1:])
        data = codec.to_bytes(out)
        streams = codec.from_bytes(data, y_shape)
        y_hat = codec.decode_y_hat(streams, y_shape)
        np.testing.assert_array_equal(np.asarray(y_hat), np.asarray(out["y_hat"]))
        # reconstruction runs and is shaped right
        x_hat = codec.decode(streams, y_shape)
        assert x_hat.shape == x.shape


class TestLatencyCodec:
    def test_certified_roundtrip(self):
        """Fused single-program codec: certified encode must decode to the
        encoder's reconstruction."""
        from flashgmm_tpu.runtime import FastLatencyGmmCodec

        net = Cheng2020AnchorCheckerboardGMMv2(N=64, K=2, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        codec = FastLatencyGmmCodec(net, lanes=64, cap_divisor=1)
        x = jnp.asarray(
            np.random.RandomState(9).rand(1, 64, 64, 3).astype(np.float32)
        )
        # must certify on the fused path (no silent composable fallback)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            data, y_shape = codec.encode_certified(x)
        assert not codec._fallback_digests
        rec = codec.decode(data, y_shape)
        assert rec.shape == x.shape
        # decoding twice is deterministic
        rec2 = codec.decode(data, y_shape)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))

    def test_interop_with_shared_program_codec(self):
        """The latency codec's bitstream layout matches the shared-program
        codec's from_bytes."""
        from flashgmm_tpu.runtime import (
            FastCheckerboardGmmCodec,
            FastLatencyGmmCodec,
        )

        net = Cheng2020AnchorCheckerboardGMMv2(N=64, K=2, rngs=nnx.Rngs(0))
        net.update(update_quantiles=True)
        lat = FastLatencyGmmCodec(net, lanes=64, cap_divisor=1)
        x = jnp.asarray(
            np.random.RandomState(10).rand(1, 64, 64, 3).astype(np.float32)
        )
        data, y_shape = lat.encode_certified(x)
        shared = FastCheckerboardGmmCodec(net, lanes=64, cap_divisor=1)
        streams = shared.from_bytes(data, tuple(y_shape)[1:])
        assert set(streams) == {"z", "y0", "y1"}


class TestPallasGuard:
    def test_pallas_decode_flag_guarded_at_small_lanes(self, setup):
        """pallas_decode=True at lanes % 128 != 0 must fall back to the
        scan (same guard as the encode side), not crash."""
        net, _ = setup
        codec = FastCheckerboardGmmCodec(
            net, lanes=64, cap_divisor=1, bf16_transforms=False,
            pallas_decode=True,
        )
        x = jnp.asarray(
            np.random.RandomState(11).rand(1, 64, 64, 3).astype(np.float32)
        )
        data, enc = codec.encode_to_bytes(x)
        ysh = tuple(enc["y_hat"].shape[1:])
        y = codec.decode_y_hat(codec.from_bytes(data, ysh), ysh)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(enc["y_hat"]))


class TestTiledSynthesis:
    def test_tiled_gs_matches_direct(self, setup):
        """H-tiled g_s (runtime/tiled.py) must reproduce the direct
        transform up to conv ULP noise (final pixels, not coding math)."""
        net, codec = setup
        from flashgmm_tpu.runtime.tiled import make_tiled_gs

        y = jnp.asarray(
            np.random.RandomState(7).rand(1, 24, 8, 64).astype(np.float32))
        direct = jnp.clip(codec._transform(net.g_s, y), 0, 1)
        tiled = make_tiled_gs(codec, tile_h=4, halo=8)(y)
        assert tiled.shape == direct.shape
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(direct), atol=2e-2)
        # overwhelming majority of pixels bit-match the untiled program
        frac = np.mean(np.abs(np.asarray(tiled) - np.asarray(direct)) > 1e-6)
        assert frac < 0.05, f"{frac:.4f} of pixels differ beyond ULP noise"

    def test_tiled_gs_small_input_passthrough(self, setup):
        net, codec = setup
        from flashgmm_tpu.runtime.tiled import make_tiled_gs

        y = jnp.asarray(
            np.random.RandomState(8).rand(1, 8, 8, 64).astype(np.float32))
        out = make_tiled_gs(codec, tile_h=16, halo=8)(y)
        assert out.shape == (1, 128, 128, 3)
