"""Checkpoint converter: full-model numerical parity with a torch twin."""

import numpy as np
import pytest
from flax import nnx

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from flashgmm_tpu.models import ScaleHyperprior  # noqa: E402
from flashgmm_tpu.zoo.torch_convert import load_torch_state_dict  # noqa: E402


class TorchGDN(tnn.Module):
    """Reference-equivalent GDN (compressai/layers/gdn.py:41-92)."""

    def __init__(self, c, inverse=False):
        super().__init__()
        self.inverse = inverse
        ped = (2**-18) ** 2
        self.beta = tnn.Parameter(torch.sqrt(torch.ones(c) + ped))
        self.gamma = tnn.Parameter(torch.sqrt(0.1 * torch.eye(c) + ped))
        self._ped = ped

    def _reparam(self, x, minimum=0.0):
        bound = (minimum + self._ped) ** 0.5
        return torch.clamp(x, min=bound) ** 2 - self._ped

    def forward(self, x):
        c = x.size(1)
        beta = self._reparam(self.beta, 1e-6)
        gamma = self._reparam(self.gamma).reshape(c, c, 1, 1)
        norm = tF.conv2d(x**2, gamma, beta)
        norm = torch.sqrt(norm) if self.inverse else torch.rsqrt(norm)
        return x * norm


def _torch_scale_hyperprior(N, M):
    def conv(i, o, k=5, s=2):
        return tnn.Conv2d(i, o, k, stride=s, padding=k // 2)

    def deconv(i, o, k=5, s=2):
        return tnn.ConvTranspose2d(i, o, k, stride=s, output_padding=s - 1,
                                   padding=k // 2)

    net = tnn.Module()
    net.g_a = tnn.Sequential(
        conv(3, N), TorchGDN(N), conv(N, N), TorchGDN(N),
        conv(N, N), TorchGDN(N), conv(N, M),
    )
    net.g_s = tnn.Sequential(
        deconv(M, N), TorchGDN(N, True), deconv(N, N), TorchGDN(N, True),
        deconv(N, N), TorchGDN(N, True), deconv(N, 3),
    )
    net.h_a = tnn.Sequential(
        conv(M, N, 3, 1), tnn.ReLU(), conv(N, N), tnn.ReLU(), conv(N, N),
    )
    net.h_s = tnn.Sequential(
        deconv(N, N), tnn.ReLU(), deconv(N, N), tnn.ReLU(),
        conv(N, M, 3, 1), tnn.ReLU(),
    )
    return net


def test_scale_hyperprior_transforms_match_torch():
    N, M = 16, 24
    tw = _torch_scale_hyperprior(N, M)
    # randomize
    torch.manual_seed(0)
    for p in tw.parameters():
        with torch.no_grad():
            if p.dim() > 1:
                p.normal_(0, 0.05)

    ours = ScaleHyperprior(N, M, rngs=nnx.Rngs(0))
    unused = load_torch_state_dict(ours, tw.state_dict(), strict=False)
    assert not [k for k in unused if "num_batches" not in k], unused

    x = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        y_t = tw.g_a(x)
        z_t = tw.h_a(torch.abs(y_t))
        s_t = tw.h_s(z_t)
        x_hat_t = tw.g_s(y_t)

    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    y_j = ours.g_a(xj)
    z_j = ours.h_a(jnp.abs(y_j))
    s_j = ours.h_s(z_j)
    x_hat_j = ours.g_s(y_j)

    def cmp(a_t, a_j, tol, name):
        a_j = np.transpose(np.asarray(a_j), (0, 3, 1, 2))
        np.testing.assert_allclose(a_j, a_t.numpy(), atol=tol, err_msg=name)

    cmp(y_t, y_j, 1e-4, "g_a")
    cmp(z_t, z_j, 1e-4, "h_a")
    cmp(s_t, s_j, 1e-4, "h_s")
    cmp(x_hat_t, x_hat_j, 1e-4, "g_s")


def test_entropy_bottleneck_keys_load():
    """EB params with reference key names (incl. legacy) land correctly."""
    from flashgmm_tpu.entropy_models import EntropyBottleneck

    eb = EntropyBottleneck(4, rngs=nnx.Rngs(0))
    rs = np.random.RandomState(0)
    sd = {}
    for i in range(5):
        f_in = 1 if i == 0 else 3
        f_out = 1 if i == 4 else 3
        sd[f"_matrix{i}"] = rs.randn(4, f_out, f_in).astype(np.float32)
        sd[f"_bias{i}"] = rs.randn(4, f_out, 1).astype(np.float32)
        if i < 4:
            sd[f"_factor{i}"] = rs.randn(4, f_out, 1).astype(np.float32)
    sd["quantiles"] = rs.randn(4, 1, 3).astype(np.float32)
    sd["_offset"] = np.zeros(0, np.int32)
    sd["_quantized_cdf"] = np.zeros((0, 0), np.int32)
    sd["_cdf_length"] = np.zeros(0, np.int32)
    sd["target"] = np.zeros(3, np.float32)

    unused = load_torch_state_dict(eb, sd, strict=True)
    assert unused == []
    np.testing.assert_array_equal(np.asarray(eb.matrix2.value), sd["_matrix2"])
    np.testing.assert_array_equal(np.asarray(eb.quantiles.value), sd["quantiles"])
