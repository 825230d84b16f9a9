"""rANS coder tests: numpy vs C++ cross-checks, round-trips, and bypass
edge cases."""

import numpy as np
import pytest

from flashgmm_tpu import ans
from flashgmm_tpu.ans import cext, rans_numpy
from flashgmm_tpu.ans.pmf_to_cdf import pmf_to_quantized_cdf

rng = np.random.default_rng(42)


def _random_cdf_setup(num_cdfs=4, max_len=18):
    cdfs = np.zeros((num_cdfs, max_len), np.int32)
    sizes = np.zeros(num_cdfs, np.int32)
    offsets = np.zeros(num_cdfs, np.int32)
    for i in range(num_cdfs):
        length = rng.integers(4, max_len - 1)
        pmf = rng.random(length - 1).astype(np.float32) + 0.01
        pmf /= pmf.sum() * 1.0001  # leave tail mass
        cdf = pmf_to_quantized_cdf(
            np.concatenate([pmf, [1 - pmf.sum()]]), 16
        )
        cdfs[i, : cdf.shape[0]] = cdf
        sizes[i] = cdf.shape[0]
        offsets[i] = rng.integers(-10, 0)
    return cdfs, sizes, offsets


class TestPmfToQuantizedCdf:
    def test_basic_properties(self):
        pmf = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0
        assert cdf[-1] == 65536
        assert np.all(np.diff(cdf) > 0)

    def test_zero_bins_are_stolen(self):
        pmf = np.array([0.5, 0.0, 0.5], np.float32)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert np.all(np.diff(cdf) > 0)

    def test_invalid_pmf_raises(self):
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf(np.array([0.5, -0.1]), 16)
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf(np.array([np.nan]), 16)


class TestTablePath:
    def _roundtrip(self, encode, decode, n=2000):
        cdfs, sizes, offsets = _random_cdf_setup()
        indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
        # symbols mostly in range, some out of range to exercise bypass
        symbols = np.array(
            [
                offsets[i] + rng.integers(-3, sizes[i] + 4)
                for i in indexes
            ],
            np.int32,
        )
        encoded = encode(symbols, indexes, cdfs, sizes, offsets)
        decoded = decode(encoded, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(decoded, symbols)
        return encoded

    def test_numpy_roundtrip(self):
        self._roundtrip(rans_numpy.encode_with_indexes, rans_numpy.decode_with_indexes)

    @pytest.mark.skipif(not cext.available(), reason="C extension unavailable")
    def test_cext_roundtrip(self):
        self._roundtrip(cext.encode_with_indexes, cext.decode_with_indexes)

    @pytest.mark.skipif(not cext.available(), reason="C extension unavailable")
    def test_numpy_cext_bitstreams_identical(self):
        cdfs, sizes, offsets = _random_cdf_setup()
        n = 512
        indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
        symbols = np.array(
            [offsets[i] + rng.integers(-3, sizes[i] + 4) for i in indexes],
            np.int32,
        )
        a = rans_numpy.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        b = cext.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        assert a == b
        # cross-decoding
        np.testing.assert_array_equal(
            rans_numpy.decode_with_indexes(b, indexes, cdfs, sizes, offsets), symbols
        )
        np.testing.assert_array_equal(
            cext.decode_with_indexes(a, indexes, cdfs, sizes, offsets), symbols
        )


def _make_rows(n, max_bs, scales=None):
    """Quantized Gaussian boundary rows computed in numpy float64->float32."""
    lo = -max_bs
    L = 2 * max_bs + 2
    if scales is None:
        scales = rng.uniform(0.2, 8.0, n).astype(np.float32)
    x = (np.arange(L, dtype=np.float32) + (lo - 0.5))[None, :]
    cdf = 0.5 * (
        1.0
        + np.sign(x)
        * np.sqrt(1.0 - np.exp(-2.0 * x * x / np.pi / scales[:, None] ** 2))
    )
    rows = (cdf * 65535.0).astype(np.uint16)
    rows = np.maximum.accumulate(rows, axis=1)  # ensure monotone
    return rows, lo


class TestRowsPath:
    @pytest.mark.parametrize("backend", ["numpy", "cext"])
    def test_roundtrip(self, backend):
        if backend == "cext" and not cext.available():
            pytest.skip("C extension unavailable")
        mod = rans_numpy if backend == "numpy" else cext
        n, max_bs = 3000, 16
        rows, lo = _make_rows(n, max_bs)
        values = np.clip(
            np.round(rng.normal(0, 3, n)), lo + 1, max_bs
        ).astype(np.int32)
        encoded = mod.encode_rows(values, rows, lo)
        decoded = mod.decode_rows(encoded, rows, lo)
        np.testing.assert_array_equal(decoded, values)

    @pytest.mark.skipif(not cext.available(), reason="C extension unavailable")
    def test_numpy_cext_bitstreams_identical(self):
        n, max_bs = 700, 12
        rows, lo = _make_rows(n, max_bs)
        values = np.clip(np.round(rng.normal(0, 2, n)), lo + 1, max_bs).astype(np.int32)
        a = rans_numpy.encode_rows(values, rows, lo)
        b = cext.encode_rows(values, rows, lo)
        assert a == b
        np.testing.assert_array_equal(rans_numpy.decode_rows(b, rows, lo), values)

    @pytest.mark.parametrize("backend", ["numpy", "cext"])
    def test_bypass_zero_pmf(self, backend):
        """Symbols landing in zero-width bins must escape to bypass."""
        if backend == "cext" and not cext.available():
            pytest.skip("C extension unavailable")
        mod = rans_numpy if backend == "numpy" else cext
        n, max_bs = 64, 8
        # very narrow distributions -> most bins have pmf 0
        rows, lo = _make_rows(n, max_bs, scales=np.full(n, 0.05, np.float32))
        values = np.clip(rng.integers(-7, 8, n), lo + 1, max_bs).astype(np.int32)
        encoded = mod.encode_rows(values, rows, lo)
        decoded = mod.decode_rows(encoded, rows, lo)
        np.testing.assert_array_equal(decoded, values)

    @pytest.mark.parametrize("backend", ["numpy", "cext"])
    def test_negative_bypass_values(self, backend):
        if backend == "cext" and not cext.available():
            pytest.skip("C extension unavailable")
        mod = rans_numpy if backend == "numpy" else cext
        n, max_bs = 16, 4
        rows, lo = _make_rows(n, max_bs, scales=np.full(n, 0.01, np.float32))
        values = np.array([-3, -2, -1, 0, 1, 2, 3, -4] * 2, np.int32)
        encoded = mod.encode_rows(values, rows, lo)
        decoded = mod.decode_rows(encoded, rows, lo)
        np.testing.assert_array_equal(decoded, values)


@pytest.mark.skipif(not cext.available(), reason="C extension unavailable")
class TestHostGmmPath:
    def test_roundtrip(self):
        n, K = 500, 4
        scales = rng.uniform(0.11, 5.0, (n, K)).astype(np.float32)
        means = rng.normal(0, 2, (n, K)).astype(np.float32)
        w = rng.random((n, K)).astype(np.float32)
        weights = w / w.sum(1, keepdims=True)
        values = np.round(rng.normal(0, 3, n)).astype(np.int32)
        max_bs = int(np.abs(values).max()) + 1

        enc = ans.RansEncoder()
        dec = ans.RansDecoder()
        s = enc.encode_gmm_host(values, scales, means, weights)
        out = dec.decode_gmm_host(s, scales, means, weights, max_bs)
        np.testing.assert_array_equal(out, values)


class TestRangeCoderBackend:
    def test_table_roundtrip(self):
        from flashgmm_tpu.ans import range_coder as rc

        cdfs, sizes, offsets = _random_cdf_setup()
        n = 1500
        indexes = rng.integers(0, cdfs.shape[0], n).astype(np.int32)
        symbols = np.array(
            [offsets[i] + rng.integers(-3, sizes[i] + 4) for i in indexes],
            np.int32,
        )
        enc = rc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        dec = rc.decode_with_indexes(enc, indexes, cdfs, sizes, offsets)
        np.testing.assert_array_equal(dec, symbols)

    def test_backend_selection(self):
        import jax
        import jax.numpy as jnp
        from flax import nnx

        import flashgmm_tpu
        from flashgmm_tpu.entropy_models import EntropyBottleneck

        flashgmm_tpu.set_entropy_coder("rangecoder")
        try:
            eb = EntropyBottleneck(4, rngs=nnx.Rngs(0))
            assert eb.entropy_coder.name == "rangecoder"
            eb.update(update_quantiles=True)
            x = jnp.asarray(
                np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32)
            )
            strings = eb.compress(x)
            x_hat = eb.decompress(strings, (8, 8))
            medians = eb._get_medians()[:, 0, 0]
            expected = jnp.round(x - medians) + medians
            np.testing.assert_allclose(
                np.asarray(x_hat), np.asarray(expected), atol=1e-5
            )
        finally:
            flashgmm_tpu.set_entropy_coder("rans")

    def test_rows_roundtrip_with_bypass(self):
        """Search-path rows coding on the range coder, incl. the
        cum_freq==65535 bypass sentinel for pmf==0 slots."""
        from flashgmm_tpu.ans import range_coder as rc

        n, L = 400, 16
        lo = -8
        r = np.random.default_rng(3)
        # strictly-monotone random rows ending below 2^16 so the last
        # implied slot keeps nonzero mass
        steps = r.integers(1, 4000, (n, L)).astype(np.uint32)
        rows = np.cumsum(steps, axis=1)
        rows = (rows.astype(np.float64) / rows[:, -1:] * 60000).astype(np.uint16)
        rows[:, 0] = 0
        values = r.integers(lo, lo + L - 2, n).astype(np.int32)
        # force some pmf==0 slots (equal adjacent boundaries) -> bypass
        for i in range(0, n, 37):
            j = int(values[i] - lo)
            rows[i, j + 1] = rows[i, j]
        enc = rc.encode_rows(values, rows, lo)
        out = rc.decode_rows(enc, rows, lo)
        np.testing.assert_array_equal(out, values)

    def test_gmm_model_roundtrip_rangecoder(self):
        """GaussianMixtureConditional real coding over the rangecoder
        backend (the reference's optional backend is table-only; here the
        search path works on it too)."""
        import jax.numpy as jnp

        import flashgmm_tpu
        from flashgmm_tpu.entropy_models import GaussianMixtureConditional

        flashgmm_tpu.set_entropy_coder("rangecoder")
        try:
            K = 3
            gmm = GaussianMixtureConditional(K=K)
            assert gmm.entropy_coder.name == "rangecoder"
            rs = np.random.RandomState(0)
            x = jnp.asarray((rs.randn(1, 8, 8, 6) * 2).astype(np.float32))
            m = 6
            scales = jnp.asarray(
                np.abs(rs.randn(1, 8, 8, K * m)).astype(np.float32) + 0.15
            )
            means = jnp.asarray(rs.randn(1, 8, 8, K * m).astype(np.float32))
            raw_w = np.abs(rs.randn(1, 8, 8, K, m)).astype(np.float32) + 0.1
            weights = jnp.asarray(
                (raw_w / raw_w.sum(3, keepdims=True)).reshape(1, 8, 8, K * m)
            )
            (s, abs_max, zbm), _ = gmm.compress(x, scales, means, weights)
            y_hat = gmm.decompress(s, abs_max, zbm, scales, means, weights)
            np.testing.assert_allclose(
                np.asarray(y_hat), np.asarray(jnp.round(x)), atol=1e-6
            )
        finally:
            flashgmm_tpu.set_entropy_coder("rans")


def test_short_buffer_rejected():
    """Truncated streams (< 8-byte rANS initial state) raise cleanly
    instead of reading out of bounds (csrc/rans.cpp kErrShortBuffer)."""
    from flashgmm_tpu.ans import cext

    if not cext.available():
        pytest.skip("no cext")
    cdfs = np.zeros((1, 4), np.int32)
    cdfs[0] = [0, 30000, 65000, 65536]
    with pytest.raises(ValueError, match="truncated or corrupt"):
        cext.decode_with_indexes(
            b"abc", np.zeros(4, np.int32), cdfs,
            np.array([4], np.int32), np.array([0], np.int32),
        )
    rows = (np.zeros((3, 5), np.uint16)
            + np.arange(5, dtype=np.uint16) * 16000)
    with pytest.raises(ValueError, match="truncated or corrupt"):
        cext.decode_rows(b"ab", rows, -2)
    # the streaming (AR) decoder's constructor must reject it too —
    # fg_decoder_new returns nullptr, which previously went unchecked and
    # segfaulted on first decode()
    with pytest.raises(ValueError, match="truncated or corrupt"):
        cext.StreamingDecoder(
            b"abc", cdfs, np.array([4], np.int32), np.array([0], np.int32)
        )
