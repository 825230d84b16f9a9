"""Correctness tests for the hand-tiled Pallas conv (ops/pallas_conv.py).

Runs in interpreter mode on CPU; the on-TPU compiled path is certified by
tools/bench_pallas_conv.py and tools/test_codec_exact_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashgmm_tpu.ops.pallas_conv import (
    conv2d_nhwc_pallas,
    conv2d_supported,
    use_pallas_conv,
    pallas_conv_enabled,
)


def _xla_ref(x, w, b, act=None, residual=None):
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    if act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.01 * y)
    if residual is not None:
        y = y + residual
    return y


class TestPallasConv:
    @pytest.mark.parametrize(
        "n,h,w,ci,co,k,act,res",
        [
            (1, 8, 16, 64, 64, 3, None, False),
            (2, 16, 24, 64, 128, 3, "leaky_relu", False),
            (1, 8, 16, 64, 64, 5, None, True),
            (1, 4, 16, 128, 64, 1, None, False),
        ],
    )
    def test_matches_xla(self, n, h, w, ci, co, k, act, res):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(n, h, w, ci).astype("float32"))
        wt = jnp.asarray((rs.randn(k, k, ci, co) * 0.05).astype("float32"))
        b = jnp.asarray(rs.randn(co).astype("float32"))
        resid = (jnp.asarray(rs.randn(n, h, w, co).astype("float32"))
                 if res else None)
        y = conv2d_nhwc_pallas(x, wt, b, activation=act, residual=resid,
                               interpret=True, out_dtype=jnp.float32)
        yr = _xla_ref(x, wt, b, act, resid)
        rel = float(jnp.max(jnp.abs(y - yr))) / float(jnp.max(jnp.abs(yr)))
        assert rel < 1e-5, rel

    def test_supported_gating(self):
        # stride-2, tiny channels, ragged W must all fall back
        assert not conv2d_supported((1, 8, 16, 3, ), (3, 3, 3, 64), (1, 1))
        assert not conv2d_supported((1, 8, 16, 64), (3, 3, 64, 64), (2, 2))
        assert not conv2d_supported((1, 8, 15, 64), (3, 3, 64, 64), (1, 1))
        assert conv2d_supported((1, 8, 16, 64), (3, 3, 64, 64), (1, 1))

    def test_context_flag(self):
        assert not pallas_conv_enabled()
        with use_pallas_conv():
            assert pallas_conv_enabled()
        assert not pallas_conv_enabled()

    def test_f32_compute(self):
        """f32 compute mode (the fenced entropy-parameter chain) matches
        an f32 XLA conv to f32 precision, including W=8 (z-res tensors)."""
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(1, 8, 8, 96).astype("float32"))
        wt = jnp.asarray((rs.randn(3, 3, 96, 64) * 0.05).astype("float32"))
        b = jnp.asarray(rs.randn(64).astype("float32"))
        y = conv2d_nhwc_pallas(x, wt, b, interpret=True,
                               compute_dtype=jnp.float32)
        yr = jax.lax.conv_general_dilated(
            x, wt, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        rel = float(jnp.max(jnp.abs(y - yr))) / float(jnp.max(jnp.abs(yr)))
        assert rel < 1e-5, rel

    def test_deterministic(self):
        """Two invocations produce bitwise-identical outputs (the property
        the canonical-rows design leans on)."""
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(1, 8, 16, 64).astype("float32"))
        wt = jnp.asarray((rs.randn(3, 3, 64, 64) * 0.05).astype("float32"))
        y1 = conv2d_nhwc_pallas(x, wt, None, interpret=True)
        y2 = conv2d_nhwc_pallas(x, wt, None, interpret=True)
        assert np.array_equal(np.asarray(y1), np.asarray(y2))
