"""Hyperprior composition: hyper branch produces params for the y codec
(compressai/latent_codecs/hyperprior.py:46-139)."""

from typing import Mapping, Optional

from flax import nnx

from flashgmm_tpu.registry import register_module

from .base import LatentCodec


@register_module("HyperpriorLatentCodec")
class HyperpriorLatentCodec(LatentCodec):
    def __init__(self, latent_codec: Optional[Mapping[str, LatentCodec]] = None,
                 **kwargs):
        assert latent_codec is not None and "y" in latent_codec and "hyper" in latent_codec
        self.latent_codec = nnx.Dict(latent_codec)

    def __call__(self, y, training: bool = True, key=None):
        import jax

        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        hyper_out = self.latent_codec["hyper"](y, training=training, key=k1)
        y_out = self.latent_codec["y"](
            y, hyper_out["params"], training=training, key=k2
        )
        return {
            "likelihoods": {
                "y": y_out["likelihoods"]["y"],
                "z": hyper_out["likelihoods"]["z"],
            },
            "y_hat": y_out["y_hat"],
        }

    def compress(self, y):
        hyper_out = self.latent_codec["hyper"].compress(y)
        y_out = self.latent_codec["y"].compress(y, hyper_out["params"])
        [z_strings] = hyper_out["strings"]
        return {
            "strings": [*y_out["strings"], z_strings],
            "shape": {"y": y_out["shape"], "hyper": hyper_out["shape"]},
            "y_hat": y_out["y_hat"],
        }

    def decompress(self, strings, shape, **kwargs):
        *y_strings_, z_strings = strings
        hyper_out = self.latent_codec["hyper"].decompress([z_strings], shape["hyper"])
        y_out = self.latent_codec["y"].decompress(
            y_strings_, shape["y"], hyper_out["params"]
        )
        return {"y_hat": y_out["y_hat"]}
