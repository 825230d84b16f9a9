from .basic import Interleave, Lambda, NamedLayer, Reshape, Transpose
from .gdn import GDN, GDN1
from .layers import (
    AttentionBlock,
    CheckerboardMaskedConv2d,
    MaskedConv2d,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    ResidualBottleneckBlock,
    Sequential,
    conv,
    conv1x1,
    conv3x3,
    deconv,
    leaky_relu,
    pixel_shuffle,
    sequential_channel_ramp,
    subpel_conv3x3,
)

__all__ = [
    "GDN",
    "GDN1",
    "AttentionBlock",
    "MaskedConv2d",
    "CheckerboardMaskedConv2d",
    "ResidualBlock",
    "ResidualBlockUpsample",
    "ResidualBlockWithStride",
    "ResidualBottleneckBlock",
    "Sequential",
    "conv",
    "deconv",
    "conv1x1",
    "conv3x3",
    "subpel_conv3x3",
    "pixel_shuffle",
    "leaky_relu",
    "sequential_channel_ramp",
    "Interleave",
    "Lambda",
    "NamedLayer",
    "Reshape",
    "Transpose",
]

from .layers import SpectralConv2d, SpectralConvTranspose2d  # noqa: E402

__all__ += ["SpectralConv2d", "SpectralConvTranspose2d"]

from .layers import qrelu  # noqa: E402
__all__ += ["qrelu"]
