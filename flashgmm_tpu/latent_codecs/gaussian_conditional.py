"""Gaussian conditional codec for latent ``y`` given ``ctx_params``
(compressai/latent_codecs/gaussian_conditional.py:48-144)."""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.entropy_models import GaussianConditional
from flashgmm_tpu.ops import quantize_ste
from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("GaussianConditionalLatentCodec")
class GaussianConditionalLatentCodec(LatentCodec):
    """Quantize + code ``y`` with per-element (scale, mean) Gaussians whose
    parameters come from ``ctx_params`` (chunked channel-last)."""

    def __init__(
        self,
        scale_table=None,
        gaussian_conditional: Optional[GaussianConditional] = None,
        entropy_parameters=None,
        quantizer: str = "noise",
        chunks: Tuple[str, ...] = ("scales", "means"),
        **kwargs,
    ):
        self.quantizer = quantizer
        self.gaussian_conditional = gaussian_conditional or GaussianConditional(
            scale_table, **kwargs
        )
        self.entropy_parameters = entropy_parameters  # optional nnx.Module
        self.chunks = tuple(chunks)

    def _apply_ep(self, ctx_params):
        if self.entropy_parameters is None:
            return ctx_params
        return self.entropy_parameters(ctx_params)

    def _chunk(self, params):
        scales, means = None, None
        if self.chunks == ("scales",):
            scales = params
        if self.chunks == ("means",):
            means = params
        if self.chunks == ("scales", "means"):
            scales, means = jnp.split(params, 2, axis=-1)
        if self.chunks == ("means", "scales"):
            means, scales = jnp.split(params, 2, axis=-1)
        return scales, means

    def __call__(self, y, ctx_params, training: bool = True, key=None):
        gaussian_params = self._apply_ep(ctx_params)
        scales_hat, means_hat = self._chunk(gaussian_params)
        if self.quantizer == "ste":
            y_hat = quantize_ste(y - means_hat) + means_hat
            _, y_likelihoods = self.gaussian_conditional(
                y, scales_hat, means_hat, training=training, key=key
            )
        else:
            y_hat, y_likelihoods = self.gaussian_conditional(
                y, scales_hat, means_hat, training=training, key=key
            )
        return {"likelihoods": {"y": y_likelihoods}, "y_hat": y_hat}

    def compress(self, y, ctx_params):
        gaussian_params = self._apply_ep(ctx_params)
        scales_hat, means_hat = self._chunk(gaussian_params)
        indexes = self.gaussian_conditional.build_indexes(scales_hat)
        y_strings = self.gaussian_conditional.compress(y, indexes, means_hat)
        y_hat = self.gaussian_conditional.decompress(
            y_strings, indexes, means=means_hat
        )
        return {"strings": [y_strings], "shape": y.shape[1:3], "y_hat": y_hat}

    def decompress(self, strings, shape, ctx_params, **kwargs):
        (y_strings,) = strings
        gaussian_params = self._apply_ep(ctx_params)
        scales_hat, means_hat = self._chunk(gaussian_params)
        indexes = self.gaussian_conditional.build_indexes(scales_hat)
        y_hat = self.gaussian_conditional.decompress(
            y_strings, indexes, means=means_hat
        )
        assert y_hat.shape[1:3] == tuple(shape)
        return {"y_hat": y_hat}
