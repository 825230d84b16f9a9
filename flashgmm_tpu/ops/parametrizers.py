"""Non-negative reparametrization used by GDN.

Functional equivalent of compressai/ops/parametrizers.py:38-64: parameters
are stored as ``sqrt(value + pedestal)`` and squared (minus pedestal) on
use, with a lower bound for training stability.
"""

from .bound_ops import lower_bound


class NonNegativeParametrizer:
    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2**-18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset**2
        self.bound = (self.minimum + self.reparam_offset**2) ** 0.5

    def init(self, x):
        """Map an initial (non-negative) value into reparametrized space."""
        import jax.numpy as jnp

        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x):
        out = lower_bound(x, self.bound)
        return out**2 - self.pedestal
