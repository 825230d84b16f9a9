"""Latent codec protocol (compressai/latent_codecs/base.py:41-89).

A latent codec bundles a probability model with the networks around it:

- ``__call__(y, ...) -> {"likelihoods": {...}, "y_hat": ...}`` (training)
- ``compress(y, ...) -> {"strings": [...], "shape": ..., "y_hat": ...}``
- ``decompress(strings, shape, ...) -> {"y_hat": ...}``

The compositional algebra (hyperprior / checkerboard / channel-groups
nesting) carries over from the reference unchanged — it is a good
abstraction; only the tensors are NHWC and the modules are nnx.
"""

from flax import nnx


class LatentCodec(nnx.Module):
    def __call__(self, y, *args, **kwargs):
        raise NotImplementedError

    def compress(self, y, *args, **kwargs):
        raise NotImplementedError

    def decompress(self, strings, shape, *args, **kwargs):
        raise NotImplementedError

    def _set_group_defaults(self, group_key, group_dict, defaults):
        """Fill in missing sub-codecs from default factories."""
        group_dict = dict(group_dict or {})
        for key, factory in defaults.items():
            if key not in group_dict:
                group_dict[key] = factory()
        setattr(self, group_key, nnx.Dict(group_dict))

    def __getitem__(self, key: str) -> "LatentCodec":
        return self.latent_codec[key]
