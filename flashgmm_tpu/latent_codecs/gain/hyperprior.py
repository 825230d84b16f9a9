"""Gain-conditioned hyperprior composition
(compressai/latent_codecs/gain/hyperprior.py:46-...).

y and z both carry per-quality gain vectors for continuously variable rate.
"""

from typing import Mapping, Optional

from flax import nnx

from flashgmm_tpu.registry import register_module

from ..base import LatentCodec


@register_module("GainHyperpriorLatentCodec")
class GainHyperpriorLatentCodec(LatentCodec):
    def __init__(self, latent_codec: Optional[Mapping[str, LatentCodec]] = None,
                 **kwargs):
        assert latent_codec is not None and "y" in latent_codec and "hyper" in latent_codec
        self.latent_codec = nnx.Dict(latent_codec)

    def __call__(self, y, y_gain, z_gain, y_gain_inv, z_gain_inv,
                 training: bool = True, key=None):
        import jax

        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        hyper_out = self.latent_codec["hyper"](
            y, z_gain, z_gain_inv, training=training, key=k1
        )
        y_out = self.latent_codec["y"](
            y * y_gain, hyper_out["params"], training=training, key=k2
        )
        return {
            "likelihoods": {
                "y": y_out["likelihoods"]["y"],
                "z": hyper_out["likelihoods"]["z"],
            },
            "y_hat": y_out["y_hat"] * y_gain_inv,
        }

    def compress(self, y, y_gain, z_gain, y_gain_inv, z_gain_inv):
        hyper_out = self.latent_codec["hyper"].compress(y, z_gain, z_gain_inv)
        y_out = self.latent_codec["y"].compress(y * y_gain, hyper_out["params"])
        [z_strings] = hyper_out["strings"]
        return {
            "strings": [*y_out["strings"], z_strings],
            "shape": {"y": y_out["shape"], "hyper": hyper_out["shape"]},
            "y_hat": y_out["y_hat"] * y_gain_inv,
        }

    def decompress(self, strings, shape, y_gain_inv, z_gain_inv, **kwargs):
        *y_strings_, z_strings = strings
        hyper_out = self.latent_codec["hyper"].decompress(
            [z_strings], shape["hyper"], z_gain_inv
        )
        y_out = self.latent_codec["y"].decompress(
            y_strings_, shape["y"], hyper_out["params"]
        )
        return {"y_hat": y_out["y_hat"] * y_gain_inv}
