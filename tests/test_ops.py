import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashgmm_tpu.ops import (
    NonNegativeParametrizer,
    compute_padding,
    lower_bound,
    pad_image,
    quantize_ste,
    unpad_image,
)


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        out = lower_bound(x, 1.0)
        np.testing.assert_allclose(out, [1.0, 1.0, 2.0])

    def test_grad_identity_above_bound(self):
        g = jax.grad(lambda x: lower_bound(x, 1.0).sum())(jnp.array([2.0, 3.0]))
        np.testing.assert_allclose(g, [1.0, 1.0])

    def test_grad_blocked_below_bound(self):
        # positive cotangent pushing x down is blocked below the bound
        g = jax.grad(lambda x: lower_bound(x, 1.0).sum())(jnp.array([0.5]))
        np.testing.assert_allclose(g, [0.0])

    def test_grad_passes_when_pushing_up(self):
        # negative cotangent (increase x) passes through below the bound
        g = jax.grad(lambda x: -lower_bound(x, 1.0).sum())(jnp.array([0.5]))
        np.testing.assert_allclose(g, [-1.0])


class TestQuantizeSTE:
    def test_rounds(self):
        x = jnp.array([0.3, 0.7, -1.2])
        np.testing.assert_allclose(quantize_ste(x), [0.0, 1.0, -1.0])

    def test_identity_grad(self):
        g = jax.grad(lambda x: quantize_ste(x).sum())(jnp.array([0.3, 2.7]))
        np.testing.assert_allclose(g, [1.0, 1.0])


class TestPadding:
    @pytest.mark.parametrize(
        "h,w,min_div", [(252, 252, 64), (768, 512, 64), (100, 67, 128)]
    )
    def test_roundtrip(self, h, w, min_div):
        pad, unpad = compute_padding(h, w, min_div=min_div)
        x = jnp.asarray(np.random.rand(1, h, w, 3).astype(np.float32))
        xp = pad_image(x, pad)
        assert xp.shape[1] % min_div == 0 and xp.shape[2] % min_div == 0
        xu = unpad_image(xp, unpad)
        np.testing.assert_allclose(xu, x)

    def test_matches_reference_values(self):
        pad, unpad = compute_padding(252, 252, min_div=64)
        assert pad == (2, 2, 2, 2)
        assert unpad == (-2, -2, -2, -2)


class TestNonNegativeParametrizer:
    def test_roundtrip(self):
        p = NonNegativeParametrizer()
        x = jnp.array([0.0, 0.1, 1.0, 10.0])
        reparam = p.init(x)
        out = p(reparam)
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_minimum(self):
        p = NonNegativeParametrizer(minimum=1e-6)
        out = p(jnp.array([-100.0]))
        assert out[0] >= 0
