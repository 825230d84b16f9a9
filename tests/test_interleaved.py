"""On-device interleaved rANS codec tests (pure-JAX scan implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashgmm_tpu.ans import interleaved as il
from flashgmm_tpu.ans.gaussian_cdf import gmm_guarded_bounds, gmm_guarded_rows

rng = np.random.default_rng(0)


class TestDivision:
    def test_divmod_u32_u16_exhaustive_random(self):
        # precondition (encoder invariant): a < f << 16 (16-bit quotient)
        f = rng.integers(1, 2**16, 20000, dtype=np.uint64)
        a = (rng.random(20000) * (f.astype(np.float64) * 2**16)).astype(
            np.uint64
        )
        a = np.minimum(a, (f << 16) - 1).astype(np.uint32)
        f = f.astype(np.uint32)
        q, r = il.divmod_u32_u16(jnp.asarray(a), jnp.asarray(f))
        np.testing.assert_array_equal(np.asarray(q), a // f)
        np.testing.assert_array_equal(np.asarray(r), a % f)

    def test_edge_cases(self):
        # boundary values within the a < f << 16 precondition
        a = np.array([0, 1, 2**16 - 1, 2**16, (65535 << 16) - 1, 2**31],
                     dtype=np.uint32)
        f = np.array([1, 1, 1, 2, 65535, 65533], dtype=np.uint32)
        assert (a.astype(np.uint64) < (f.astype(np.uint64) << 16)).all()
        q, r = il.divmod_u32_u16(jnp.asarray(a), jnp.asarray(f))
        np.testing.assert_array_equal(np.asarray(q), a // f)
        np.testing.assert_array_equal(np.asarray(r), a % f)


def _gmm_params(n, k=4):
    scales = rng.uniform(0.11, 6.0, (n, k)).astype(np.float32)
    means = rng.normal(0, 3, (n, k)).astype(np.float32)
    w = rng.random((n, k)).astype(np.float32)
    weights = w / w.sum(1, keepdims=True)
    return jnp.asarray(scales), jnp.asarray(means), jnp.asarray(weights)


class TestGuardedRows:
    def test_monotone_and_complete(self):
        scales, means, weights = _gmm_params(64)
        rows = gmm_guarded_rows(scales, means, weights, jnp.int32(-16), 33)
        rows = np.asarray(rows)
        assert rows.shape == (64, 34)
        assert np.all(np.diff(rows, axis=1) >= 1)  # strictly monotone
        assert np.all(rows[:, -1] == 65536)
        assert np.all(rows[:, 0] >= 0)

    def test_bounds_match_rows(self):
        """Encoder bounds must be bit-identical to decoder row entries."""
        n, lo, nb = 256, -16, 33
        scales, means, weights = _gmm_params(n)
        values = jnp.asarray(
            np.clip(np.round(rng.normal(0, 4, n)), lo, lo + nb - 1).astype(np.int32)
        )
        rows = np.asarray(
            gmm_guarded_rows(scales, means, weights, jnp.int32(lo), nb)
        )
        start, freq = gmm_guarded_bounds(
            values, scales, means, weights, jnp.int32(lo), nb
        )
        j = np.asarray(values) - lo
        np.testing.assert_array_equal(
            np.asarray(start), rows[np.arange(n), j]
        )
        np.testing.assert_array_equal(
            np.asarray(freq), rows[np.arange(n), j + 1] - rows[np.arange(n), j]
        )


class TestInterleavedRoundtrip:
    @pytest.mark.parametrize("n,w", [(1000, 64), (4096, 128), (777, 128), (63, 64), (3000, 256)])
    def test_gmm_roundtrip(self, n, w):
        lo, nb = -16, 33
        scales, means, weights = _gmm_params(n)
        values = np.clip(np.round(rng.normal(0, 3, n)), lo, lo + nb - 2).astype(np.int32)
        vals_j = jnp.asarray(values)

        start, freq = gmm_guarded_bounds(
            vals_j, scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        starts = il.to_lanes(start, w)
        freqs = il.to_lanes(jnp.maximum(freq, 1), w)
        active = il.active_mask(n, t, w)

        states, words, emits = il.encode_scan(starts, freqs, active)
        stream, n_words = il.pack_words(words, emits)

        rows = gmm_guarded_rows(scales, means, weights, jnp.int32(lo), nb)
        rows_l = il.to_lanes(rows, w, fill=0)
        # padding rows must still be valid monotone tables
        rows_l = jnp.where(
            active[..., None], rows_l,
            jnp.arange(nb + 1, dtype=jnp.int32) * (65536 // (nb + 1)),
        )
        decoded = il.decode_scan(states, stream, rows_l, active, jnp.int32(lo))
        out = np.asarray(il.from_lanes(decoded, n))
        np.testing.assert_array_equal(out, values)

    def test_rate_reasonable(self):
        """Interleaved stream should be within a few % of the host coder."""
        from flashgmm_tpu.ans import rans_numpy

        n, w, lo, nb = 8192, 128, -16, 33
        scales, means, weights = _gmm_params(n)
        values = np.clip(np.round(rng.normal(0, 3, n)), lo, lo + nb - 2).astype(np.int32)
        vals_j = jnp.asarray(values)

        start, freq = gmm_guarded_bounds(
            vals_j, scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        states, words, emits = il.encode_scan(
            il.to_lanes(start, w), il.to_lanes(jnp.maximum(freq, 1), w),
            il.active_mask(n, t, w),
        )
        stream, n_words = il.pack_words(words, emits)
        il_bytes = int(n_words) * 2 + w * 4

        # host coder on (unguarded) rows for reference rate
        from flashgmm_tpu.ans.gaussian_cdf import gmm_boundary_rows
        rows_u16 = np.asarray(
            gmm_boundary_rows(scales, means, weights, jnp.int32(lo), nb)
        )
        host_bytes = len(rans_numpy.encode_rows(values, rows_u16, lo))
        assert il_bytes < host_bytes * 1.10 + w * 4

    def test_deterministic(self):
        n, w, lo, nb = 512, 64, -8, 17
        scales, means, weights = _gmm_params(n)
        values = np.clip(np.round(rng.normal(0, 2, n)), lo, lo + nb - 2).astype(np.int32)
        start, freq = gmm_guarded_bounds(
            jnp.asarray(values), scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        args = (il.to_lanes(start, w), il.to_lanes(jnp.maximum(freq, 1), w),
                il.active_mask(n, t, w))
        s1, w1, e1 = il.encode_scan(*args)
        s2, w2, e2 = il.encode_scan(*args)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


class TestPallasDecoder:
    @pytest.mark.parametrize("w", [128, 768])
    def test_encoder_interpret_mode_matches_scan(self, w):
        """Pallas encoder produces identical states/words/emission masks to
        interleaved.encode_scan (interpreter mode)."""
        from jax.experimental.pallas import tpu as pltpu

        from flashgmm_tpu.ans.pallas_coder import encode_scan_pallas

        n, lo, nb = 3000, -16, 33
        scales, means, weights = _gmm_params(n)
        values = np.clip(np.round(rng.normal(0, 3, n)), lo + 1, -lo - 1).astype(np.int32)
        start, freq = gmm_guarded_bounds(
            jnp.asarray(values), scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        args = (il.to_lanes(start, w), il.to_lanes(jnp.maximum(freq, 1), w),
                il.active_mask(n, t, w))
        s_ref, w_ref, e_ref = il.encode_scan(*args)
        with pltpu.force_tpu_interpret_mode():
            s_out, w_out, e_out = encode_scan_pallas(*args)
        np.testing.assert_array_equal(np.asarray(s_out), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(e_out), np.asarray(e_ref))
        em = np.asarray(e_ref)
        np.testing.assert_array_equal(
            np.asarray(w_out)[em], np.asarray(w_ref)[em]
        )
        # and the packed stream decodes back to the symbols
        stream, _ = il.pack_words(w_out, e_out)
        rows_l = il.to_lanes(
            gmm_guarded_rows(scales, means, weights, jnp.int32(lo), nb), w
        )
        sym = il.decode_scan(s_out, stream, rows_l, args[2], jnp.int32(lo))
        np.testing.assert_array_equal(
            il.from_lanes(sym, n), values
        )

    @pytest.mark.parametrize("w", [128, 768])
    def test_interpret_mode_matches_scan(self, w):
        """Pallas decoder is bit-identical to the scan decoder (interpreter
        mode; compiled path is TPU-only). w=128 exercises the [W, W]
        triangular rank, w=768 the hierarchical two-stage rank (W > 512)."""
        from jax.experimental.pallas import tpu as pltpu

        from flashgmm_tpu.ans.pallas_coder import decode_scan_pallas

        n, lo, nb = 2000 if w == 128 else 4000, -16, 33
        scales, means, weights = _gmm_params(n)
        values = np.clip(np.round(rng.normal(0, 3, n)), lo + 1, -lo - 1).astype(np.int32)
        start, freq = gmm_guarded_bounds(
            jnp.asarray(values), scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        states, words, emits = il.encode_scan(
            il.to_lanes(start, w), il.to_lanes(freq, w), il.active_mask(n, t, w)
        )
        stream, _ = il.pack_words(words, emits)
        rows_l = il.to_lanes(
            gmm_guarded_rows(scales, means, weights, jnp.int32(lo), nb), w
        )
        active = il.active_mask(n, t, w)
        ref = il.decode_scan(states, stream, rows_l, active, jnp.int32(lo))
        with pltpu.force_tpu_interpret_mode():
            out = decode_scan_pallas(states, stream, rows_l, active, jnp.int32(lo))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestFastDivmod:
    def test_matches_restoring_everywhere(self):
        from flashgmm_tpu.ans.interleaved import (
            divmod_u32_u16,
            divmod_u32_u16_fast,
        )

        rng = np.random.default_rng(7)
        fs = np.concatenate(
            [np.array([1, 2, 3, 65534, 65535]),
             rng.integers(1, 65536, 100000)]
        ).astype(np.uint32)
        amax = (fs.astype(np.uint64) << 16) - 1
        k = rng.integers(0, 1 << 16, fs.shape[0]).astype(np.uint64)
        cases = [
            amax.astype(np.uint32),                       # a = f<<16 - 1
            np.minimum(k * fs, amax).astype(np.uint32),   # exact multiples
            np.minimum(k * fs + 1, amax).astype(np.uint32),
            (rng.random(fs.shape[0]) * amax).astype(np.uint64).astype(np.uint32),
        ]
        for a in cases:
            q0, r0 = jax.jit(divmod_u32_u16)(jnp.asarray(a), jnp.asarray(fs))
            q1, r1 = jax.jit(divmod_u32_u16_fast)(
                jnp.asarray(a), jnp.asarray(fs)
            )
            np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
            np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    def test_fast_flag_roundtrip(self, monkeypatch):
        """encode_scan dispatched through the fast divmod produces byte-
        identical streams (and therefore exact round-trips)."""
        import flashgmm_tpu.ans.interleaved as ilmod

        n, w, lo, nb = 4096, 128, -16, 33
        scales, means, weights = _gmm_params(n)
        values = np.clip(
            np.round(rng.normal(0, 3, n)), lo, lo + nb - 2
        ).astype(np.int32)
        start, freq = gmm_guarded_bounds(
            jnp.asarray(values), scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        args = (il.to_lanes(start, w), il.to_lanes(jnp.maximum(freq, 1), w),
                il.active_mask(n, t, w))

        s0, w0, e0 = il.encode_scan(*args)
        monkeypatch.setattr(ilmod, "_FAST_DIVMOD", True)
        s1, w1, e1 = il.encode_scan(*args)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))

    def test_pallas_encoder_fast_divmod_interpret(self, monkeypatch):
        """Pallas encoder with the fast divmod stays byte-identical to the
        scan in interpret mode."""
        from jax.experimental.pallas import tpu as pltpu

        import flashgmm_tpu.ans.interleaved as ilmod
        import flashgmm_tpu.ans.pallas_coder as pc

        n, w, lo, nb = 2048, 128, -16, 33
        scales, means, weights = _gmm_params(n)
        values = np.clip(
            np.round(rng.normal(0, 3, n)), lo, lo + nb - 2
        ).astype(np.int32)
        start, freq = gmm_guarded_bounds(
            jnp.asarray(values), scales, means, weights, jnp.int32(lo), nb
        )
        t, _ = il.layout(n, w)
        args = (il.to_lanes(start, w), il.to_lanes(jnp.maximum(freq, 1), w),
                il.active_mask(n, t, w))
        s_ref, w_ref, e_ref = il.encode_scan(*args)
        # the Pallas kernel now calls interleaved.divmod_rans directly, so
        # the same flag flips both backends (they cannot drift)
        monkeypatch.setattr(ilmod, "_FAST_DIVMOD", True)
        with pltpu.force_tpu_interpret_mode():
            s1, w1, e1 = pc.encode_scan_pallas(*args)
        np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e1))
