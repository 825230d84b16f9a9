"""Numerical parity with PyTorch layers (checkpoint-compat contract).

The reference ships PyTorch checkpoints; our NHWC layers must reproduce
torch semantics exactly given converted weights — in particular the
explicit-padding conv windows and ConvTranspose2d/PixelShuffle layouts.
"""

import numpy as np
import pytest
from flax import nnx

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from flashgmm_tpu.layers import GDN, pixel_shuffle  # noqa: E402
from flashgmm_tpu.layers.layers import Conv2d, ConvTranspose2d  # noqa: E402

rs = np.random.RandomState(0)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_torch_conv(w):
    # OIHW -> HWIO
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def from_torch_deconv(w):
    # I O H W -> H W I O
    return jnp.asarray(np.transpose(w, (2, 3, 0, 1)))


@pytest.mark.parametrize(
    "k,s,p,hw",
    [(5, 2, 2, (16, 16)), (3, 1, 1, (9, 11)), (3, 2, 1, (16, 16)), (1, 1, 0, (8, 8)),
     (5, 1, 2, (10, 10)), (3, 2, 1, (15, 13))],
)
def test_conv2d_matches_torch(k, s, p, hw):
    cin, cout = 6, 8
    x = rs.randn(2, cin, *hw).astype(np.float32)
    tconv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=p)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    ours = Conv2d(cin, cout, k, stride=s, padding=p, rngs=nnx.Rngs(0))
    ours.kernel.value = from_torch_conv(tconv.weight.detach().numpy())
    ours.bias.value = jnp.asarray(tconv.bias.detach().numpy())
    out = np.transpose(np.asarray(ours(to_nhwc(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize(
    "k,s,p,op,hw",
    [(5, 2, 2, 1, (8, 8)), (3, 2, 1, 1, (8, 8)), (2, 2, 0, 0, (8, 8)),
     (5, 2, 2, 1, (7, 9))],
)
def test_conv_transpose2d_matches_torch(k, s, p, op, hw):
    cin, cout = 6, 4
    x = rs.randn(2, cin, *hw).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride=s, padding=p, output_padding=op)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    ours = ConvTranspose2d(
        cin, cout, k, stride=s, padding=p, output_padding=op, rngs=nnx.Rngs(0)
    )
    ours.kernel.value = from_torch_deconv(tconv.weight.detach().numpy())
    ours.bias.value = jnp.asarray(tconv.bias.detach().numpy())
    out = np.transpose(np.asarray(ours(to_nhwc(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pixel_shuffle_matches_torch():
    r, c = 2, 3
    x = rs.randn(2, c * r * r, 6, 5).astype(np.float32)
    ref = torch.nn.PixelShuffle(r)(torch.from_numpy(x)).numpy()
    out = np.transpose(
        np.asarray(pixel_shuffle(to_nhwc(x), r)), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(out, ref, atol=0)


def test_gdn_matches_reference_math():
    """GDN output equals the direct formula (torch impl: conv2d over x**2)."""
    c = 8
    x = rs.randn(1, 6, 6, c).astype(np.float32)
    gdn = GDN(c, rngs=nnx.Rngs(0))
    # randomize params in reparam space
    gdn.beta.value = jnp.asarray(np.abs(rs.randn(c)).astype(np.float32) + 0.5)
    gdn.gamma.value = jnp.asarray(np.abs(rs.randn(c, c)).astype(np.float32) * 0.1)
    out = np.asarray(gdn(jnp.asarray(x)))

    beta = np.asarray(gdn.beta_reparam(gdn.beta.value))
    gamma = np.asarray(gdn.gamma_reparam(gdn.gamma.value))
    norm = (x**2) @ gamma.T + beta
    np.testing.assert_allclose(out, x / np.sqrt(norm), rtol=1e-5, atol=1e-6)


def test_leaky_relu_matches_torch():
    from flashgmm_tpu.layers.layers import leaky_relu

    x = rs.randn(100).astype(np.float32)
    ref = torch.nn.functional.leaky_relu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(leaky_relu(jnp.asarray(x))), ref)
