from .entropy_models import (
    EntropyBottleneck,
    EntropyModel,
    GaussianConditional,
    GaussianMixtureConditional,
)

__all__ = [
    "EntropyModel",
    "EntropyBottleneck",
    "GaussianConditional",
    "GaussianMixtureConditional",
]

from .entropy_models_vbr import EntropyBottleneckVbr, GaussianConditionalVbr  # noqa: E402

__all__ += ["EntropyBottleneckVbr", "GaussianConditionalVbr"]
