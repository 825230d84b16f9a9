from .base import LatentCodec
from .entropy_bottleneck import EntropyBottleneckLatentCodec
from .gaussian_conditional import GaussianConditionalLatentCodec
from .hyper import HyperLatentCodec
from .hyperprior import HyperpriorLatentCodec

__all__ = [
    "LatentCodec",
    "EntropyBottleneckLatentCodec",
    "GaussianConditionalLatentCodec",
    "HyperLatentCodec",
    "HyperpriorLatentCodec",
]
