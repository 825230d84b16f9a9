"""Trivial EntropyBottleneck wrapper codec
(compressai/latent_codecs/entropy_bottleneck.py:44-88)."""

from typing import Optional

from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("EntropyBottleneckLatentCodec")
class EntropyBottleneckLatentCodec(LatentCodec):
    def __init__(
        self,
        entropy_bottleneck: Optional[EntropyBottleneck] = None,
        channels: int = None,
        *,
        rngs: nnx.Rngs = None,
        **kwargs,
    ):
        if entropy_bottleneck is None:
            entropy_bottleneck = EntropyBottleneck(channels, rngs=rngs, **kwargs)
        self.entropy_bottleneck = entropy_bottleneck

    def __call__(self, y, training: bool = True, key=None):
        y_hat, y_likelihoods = self.entropy_bottleneck(y, training=training, key=key)
        return {"likelihoods": {"y": y_likelihoods}, "y_hat": y_hat}

    def compress(self, y):
        shape = y.shape[1:3]
        y_strings = self.entropy_bottleneck.compress(y)
        y_hat = self.entropy_bottleneck.decompress(y_strings, shape)
        return {"strings": [y_strings], "shape": shape, "y_hat": y_hat}

    def decompress(self, strings, shape, **kwargs):
        (y_strings,) = strings
        y_hat = self.entropy_bottleneck.decompress(y_strings, shape)
        return {"y_hat": y_hat}
