"""Hyper (z) branch codec: h_a -> EntropyBottleneck -> h_s
(compressai/latent_codecs/hyper.py:48-110)."""

from typing import Optional

from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.ops import quantize_ste
from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("HyperLatentCodec")
class HyperLatentCodec(LatentCodec):
    def __init__(
        self,
        entropy_bottleneck: Optional[EntropyBottleneck] = None,
        h_a=None,
        h_s=None,
        quantizer: str = "noise",
        **kwargs,
    ):
        assert entropy_bottleneck is not None
        self.entropy_bottleneck = entropy_bottleneck
        self.h_a = h_a
        self.h_s = h_s
        self.quantizer = quantizer

    def _h_a(self, y):
        return self.h_a(y) if self.h_a is not None else y

    def _h_s(self, z_hat):
        return self.h_s(z_hat) if self.h_s is not None else z_hat

    def __call__(self, y, training: bool = True, key=None):
        z = self._h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, key=key)
        if self.quantizer == "ste":
            z_medians = self.entropy_bottleneck._get_medians()[:, 0, 0]
            z_hat = quantize_ste(z - z_medians) + z_medians
        params = self._h_s(z_hat)
        return {"likelihoods": {"z": z_likelihoods}, "params": params}

    def compress(self, y):
        z = self._h_a(y)
        shape = z.shape[1:3]
        z_strings = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_strings, shape)
        params = self._h_s(z_hat)
        return {"strings": [z_strings], "shape": shape, "params": params}

    def decompress(self, strings, shape, **kwargs):
        (z_strings,) = strings
        z_hat = self.entropy_bottleneck.decompress(z_strings, shape)
        params = self._h_s(z_hat)
        return {"params": params}
