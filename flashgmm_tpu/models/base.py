"""Model base classes (compressai/models/base.py:65-213).

``CompressionModel`` walks its module tree to update entropy-model CDF
tables and accumulate the aux loss. ``SimpleVAECompressionModel`` is the
g_a -> latent_codec -> g_s composition used by all FlashGMM models.
"""

import math

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck, GaussianConditional

SCALES_MIN = 0.11
SCALES_MAX = 256
SCALES_LEVELS = 64


def get_scale_table(min=SCALES_MIN, max=SCALES_MAX, levels=SCALES_LEVELS):
    """64 log-spaced scales from 0.11 to 256 (models/base.py:55-62)."""
    return [
        float(s)
        for s in jnp.exp(jnp.linspace(math.log(min), math.log(max), levels))
    ]


def iter_entropy_modules(model):
    """Yield all EntropyBottleneck / GaussianConditional submodules."""
    seen = set()
    for _path, node in nnx.iter_graph(model):
        if isinstance(node, (EntropyBottleneck, GaussianConditional)):
            if id(node) not in seen:
                seen.add(id(node))
                yield node


class CompressionModel(nnx.Module):
    """Base class for models containing entropy-coded bottlenecks."""

    def update(self, scale_table=None, force=False, update_quantiles: bool = False):
        """Build CDF tables after training (models/base.py:117-141)."""
        if scale_table is None:
            scale_table = get_scale_table()
        updated = False
        for module in iter_entropy_modules(self):
            if isinstance(module, EntropyBottleneck):
                updated |= module.update(force=force, update_quantiles=update_quantiles)
            elif isinstance(module, GaussianConditional):
                updated |= module.update_scale_table(scale_table, force=force)
        return updated

    def aux_loss(self):
        """Sum of EntropyBottleneck quantile losses (models/base.py:143-172)."""
        losses = [
            m.loss() for m in iter_entropy_modules(self)
            if isinstance(m, EntropyBottleneck)
        ]
        return sum(losses) if losses else jnp.zeros(())


class SimpleVAECompressionModel(CompressionModel):
    """x -> g_a -> latent codec -> g_s -> x_hat (models/base.py:175-213)."""

    def __call__(self, x, training: bool = True, key=None):
        y = self.g_a(x)
        y_out = self.latent_codec(y, training=training, key=key)
        y_hat = y_out["y_hat"]
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": y_out["likelihoods"]}

    def compress(self, x):
        y = self.g_a(x)
        return self.latent_codec.compress(y)

    def decompress(self, *args, **kwargs):
        y_out = self.latent_codec.decompress(*args, **kwargs)
        x_hat = jnp.clip(self.g_s(y_out["y_hat"]), 0.0, 1.0)
        return {"x_hat": x_hat}
