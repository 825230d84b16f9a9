"""Gain-conditioned hyper (z) branch codec
(compressai/latent_codecs/gain/hyper.py:47-...).

Like HyperLatentCodec but z is multiplied by a per-quality gain vector
before the bottleneck and by its inverse after (Cui et al., "Asymmetric
Gained Deep Image Compression").
"""

from typing import Optional

from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.ops import quantize_ste
from flashgmm_tpu.registry import register_module

from ..base import LatentCodec


@register_module("GainHyperLatentCodec")
class GainHyperLatentCodec(LatentCodec):
    def __init__(self, entropy_bottleneck: Optional[EntropyBottleneck] = None,
                 h_a=None, h_s=None, **kwargs):
        assert entropy_bottleneck is not None
        self.entropy_bottleneck = entropy_bottleneck
        self.h_a = h_a
        self.h_s = h_s

    def __call__(self, y, gain, gain_inv, training: bool = True, key=None):
        z = self.h_a(y) if self.h_a else y
        z = z * gain
        _, z_likelihoods = self.entropy_bottleneck(z, training=training, key=key)
        z_medians = self.entropy_bottleneck._get_medians()[:, 0, 0]
        z_hat = quantize_ste(z - z_medians) + z_medians
        z_hat = z_hat * gain_inv
        params = self.h_s(z_hat) if self.h_s else z_hat
        return {"likelihoods": {"z": z_likelihoods}, "params": params}

    def compress(self, y, gain, gain_inv):
        z = self.h_a(y) if self.h_a else y
        z = z * gain
        shape = z.shape[1:3]
        z_strings = self.entropy_bottleneck.compress(z)
        z_hat = self.entropy_bottleneck.decompress(z_strings, shape) * gain_inv
        params = self.h_s(z_hat) if self.h_s else z_hat
        return {"strings": [z_strings], "shape": shape, "params": params}

    def decompress(self, strings, shape, gain_inv, **kwargs):
        (z_strings,) = strings
        z_hat = self.entropy_bottleneck.decompress(z_strings, shape) * gain_inv
        params = self.h_s(z_hat) if self.h_s else z_hat
        return {"params": params}
