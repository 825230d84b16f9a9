"""Sigmoid-kernel mixture CDF compressor (compressai/models/sigmoidkernel.py
:16-78): experimental likelihood computed directly from a sigmoid-kernel
mixture, on top of the Cheng2020Attention transforms. Forward/likelihood
only (no real-coding path, matching the reference)."""

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.ops import lower_bound
from flashgmm_tpu.registry import register_model

from .waseda import Cheng2020Attention


@register_model("sigmoid-cdf")
class SigmoidCDFCompressor(Cheng2020Attention):
    def __init__(self, N=192, K=4, *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        super().__init__(N=N, rngs=rngs, **kwargs)
        self.K = int(K)
        from flashgmm_tpu.layers.layers import Conv2d, LeakyReLU
        from flashgmm_tpu.layers import Sequential

        # entropy parameters emit (a, b, w) triplets per mixture component
        self.entropy_parameters = Sequential(
            Conv2d(N * 12 // 3, N * 10 // 3, 1, rngs=rngs), LeakyReLU(),
            Conv2d(N * 10 // 3, N * 8 // 3, 1, rngs=rngs), LeakyReLU(),
            Conv2d(N * 8 // 3, 3 * self.K * N, 1, rngs=rngs),
        )

    def _sigmoid_kernel_likelihood(self, y_hat, params):
        """P(y) = sum_k w_k [sigma(a_k (y+0.5) + b_k) - sigma(a_k (y-0.5) + b_k)]."""
        m = y_hat.shape[-1]
        shape = params.shape[:-1] + (3, self.K, m)
        p = params.reshape(shape)
        a = jax.nn.softplus(p[..., 0, :, :])  # slopes > 0
        b = p[..., 1, :, :]
        w = jax.nn.softmax(p[..., 2, :, :], axis=-2)
        v = y_hat[..., None, :]
        upper = jax.nn.sigmoid(a * (v + 0.5) + b)
        lower_ = jax.nn.sigmoid(a * (v - 0.5) + b)
        lk = jnp.sum(w * (upper - lower_), axis=-2)
        return lower_bound(lk, 1e-9)

    def __call__(self, x, training: bool = True, key=None):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, key=k1)
        params = self.h_s(z_hat)

        if training:
            assert k2 is not None
            y_hat = y + jax.random.uniform(k2, y.shape, y.dtype, -0.5, 0.5)
        else:
            y_hat = jnp.round(y)
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx_params], axis=-1)
        )
        y_likelihoods = self._sigmoid_kernel_likelihood(y_hat, gaussian_params)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }
