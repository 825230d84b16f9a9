"""Generalized Divisive Normalization for NHWC tensors.

TPU-native reformulation of compressai/layers/gdn.py:41-121: the reference's
1x1 conv over ``x**2`` is a channel-mixing matmul in NHWC layout, which maps
straight onto the MXU. Parameters are stored in the same reparametrized
(sqrt) space as the reference so converted checkpoints line up.
"""

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.ops.parametrizers import NonNegativeParametrizer


class GDN(nnx.Module):
    r"""y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j,i] * x[j]^2).

    ``gamma`` is stored as an ``[out, in]`` matrix (same orientation as the
    reference's conv weight) in reparametrized space.
    """

    def __init__(
        self,
        in_channels: int,
        inverse: bool = False,
        beta_min: float = 1e-6,
        gamma_init: float = 0.1,
        *,
        rngs: nnx.Rngs = None,
    ):
        self.inverse = bool(inverse)
        self.beta_reparam = NonNegativeParametrizer(minimum=float(beta_min))
        self.gamma_reparam = NonNegativeParametrizer()

        beta = jnp.ones((in_channels,), jnp.float32)
        self.beta = nnx.Param(self.beta_reparam.init(beta))

        gamma = gamma_init * jnp.eye(in_channels, dtype=jnp.float32)
        self.gamma = nnx.Param(self.gamma_reparam.init(gamma))

    def __call__(self, x):
        beta = self.beta_reparam(self.beta.value)
        gamma = self.gamma_reparam(self.gamma.value)
        # NHWC: channel-mixing matmul (MXU) instead of a 1x1 conv.
        norm = jnp.einsum(
            "...i,oi->...o", x * x, gamma, preferred_element_type=jnp.float32
        ) + beta

        if self.inverse:
            norm = jnp.sqrt(norm)
        else:
            norm = jax.lax.rsqrt(norm)

        # accumulate in f32 (preferred_element_type), compute in x.dtype
        return x * norm.astype(x.dtype)


class GDN1(GDN):
    r"""Simplified GDN: y[i] = x[i] / (beta[i] + sum_j gamma[j,i] * |x[j]|)."""

    def __call__(self, x):
        beta = self.beta_reparam(self.beta.value)
        gamma = self.gamma_reparam(self.gamma.value)
        norm = jnp.einsum(
            "...i,oi->...o", jnp.abs(x), gamma, preferred_element_type=jnp.float32
        ) + beta

        if not self.inverse:
            norm = 1.0 / norm

        return x * norm.astype(x.dtype)
