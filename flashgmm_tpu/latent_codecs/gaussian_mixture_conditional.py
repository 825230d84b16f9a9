"""GMM conditional codec (latent_codecs/gaussian_mixture_conditional.py:43-202).

Chunks ctx params into (scales, means, weights) thirds, softmax-normalizes
the K mixture weights, and codes ``y`` with the table-free GMM rows path.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.entropy_models import GaussianMixtureConditional
from flashgmm_tpu.ops import quantize_ste
from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("GaussianMixtureConditionalLatentCodec")
class GaussianMixtureConditionalLatentCodec(LatentCodec):
    def __init__(
        self,
        K: int = 4,
        scale_table=None,
        gaussian_mixture_conditional: Optional[GaussianMixtureConditional] = None,
        entropy_parameters=None,
        quantizer: str = "noise",
        chunks: Tuple[str, ...] = ("scales", "means", "weights"),
        **kwargs,
    ):
        assert quantizer in ("noise", "weighted_mean_ste"), quantizer
        self.K = K
        self.quantizer = quantizer
        self.gaussian_mixture_conditional = (
            gaussian_mixture_conditional
            or GaussianMixtureConditional(K=K, scale_table=scale_table)
        )
        self.entropy_parameters = entropy_parameters
        self.chunks = tuple(chunks)

    def _apply_ep(self, ctx_params):
        if self.entropy_parameters is None:
            return ctx_params
        return self.entropy_parameters(ctx_params)

    def _chunk(self, params):
        assert self.chunks == ("scales", "means", "weights")
        return jnp.split(params, 3, axis=-1)

    def _reshape_gmm_weight(self, weight):
        """Softmax over the K mixture components (channel-last [.., K*M])."""
        b, h, w, km = weight.shape
        weight = weight.reshape(b, h, w, self.K, km // self.K)
        weight = jax.nn.softmax(weight, axis=-2)
        return weight.reshape(b, h, w, km)

    def _weighted_mean_recenter(self, means_hat, weights):
        """Weighted mean over K and re-centered means for the ste quantizer."""
        b, h, w, km = means_hat.shape
        m = km // self.K
        means_e = means_hat.reshape(b, h, w, self.K, m)
        weights_e = weights.reshape(b, h, w, self.K, m)
        weighted_sum = jnp.sum(means_e * weights_e, axis=-2)
        means_e = means_e - weighted_sum[..., None, :]
        return weighted_sum, means_e.reshape(b, h, w, km)

    def __call__(self, y, ctx_params, training: bool = True, key=None):
        gaussian_params = self._apply_ep(ctx_params)
        scales_hat, means_hat, weights = self._chunk(gaussian_params)
        weights = self._reshape_gmm_weight(weights)
        if self.quantizer == "noise":
            y_hat, y_likelihoods = self.gaussian_mixture_conditional(
                y, scales_hat, means_hat, weights, training=training, key=key
            )
        else:  # weighted_mean_ste
            weighted_sum, means_hat = self._weighted_mean_recenter(means_hat, weights)
            y_hat = quantize_ste(y - weighted_sum) + weighted_sum
            y_hat, y_likelihoods = self.gaussian_mixture_conditional(
                y_hat, scales_hat, means_hat, weights, training=training, key=key
            )
        return {"likelihoods": {"y": y_likelihoods}, "y_hat": y_hat}

    def compress(self, y, ctx_params):
        gaussian_params = self._apply_ep(ctx_params)
        scales_hat, means_hat, weights = self._chunk(gaussian_params)
        weights = self._reshape_gmm_weight(weights)
        if self.quantizer == "noise":
            y_strings, y_hat = self.gaussian_mixture_conditional.compress(
                y, scales_hat, means_hat, weights
            )
        else:
            weighted_sum, means_hat = self._weighted_mean_recenter(means_hat, weights)
            y_q = quantize_ste(y - weighted_sum)
            y_strings, y_hat = self.gaussian_mixture_conditional.compress(
                y_q, scales_hat, means_hat, weights
            )
        return {"strings": [y_strings], "shape": y.shape[1:3], "y_hat": y_hat}

    def decompress(self, strings, shape, ctx_params, **kwargs):
        (y_strings,) = strings
        gaussian_params = self._apply_ep(ctx_params)
        scales_hat, means_hat, weights = self._chunk(gaussian_params)
        weights = self._reshape_gmm_weight(weights)
        if self.quantizer == "noise":
            y_hat = self.gaussian_mixture_conditional.decompress(
                *y_strings, scales_hat, means_hat, weights
            )
        else:
            weighted_sum, means_hat = self._weighted_mean_recenter(means_hat, weights)
            y_hat = self.gaussian_mixture_conditional.decompress(
                *y_strings, scales_hat, means_hat, weights
            )
            y_hat = y_hat + weighted_sum
        assert y_hat.shape[1:3] == tuple(shape)
        return {"y_hat": y_hat}
