from .base import (
    CompressionModel,
    SimpleVAECompressionModel,
    get_scale_table,
)
from .ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
from .elic_gmm import Elic2022GMM
from .google import (
    FactorizedPrior,
    FactorizedPriorReLU,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
)
from .sensetime import Cheng2020AnchorCheckerboard, Elic2022Official
from .waseda import Cheng2020Anchor, Cheng2020Attention

__all__ = [
    "CompressionModel",
    "SimpleVAECompressionModel",
    "get_scale_table",
    "FactorizedPrior",
    "FactorizedPriorReLU",
    "ScaleHyperprior",
    "MeanScaleHyperprior",
    "JointAutoregressiveHierarchicalPriors",
    "Cheng2020Anchor",
    "Cheng2020Attention",
    "Cheng2020AnchorCheckerboard",
    "Elic2022Official",
    "Cheng2020AnchorCheckerboardGMMv2",
    "Elic2022GMM",
]

from .chandelier import Elic2022Chandelier  # noqa: E402
from .sigmoidkernel import SigmoidCDFCompressor  # noqa: E402
from .vbr import MeanScaleHyperpriorVbr, ScaleHyperpriorVbr  # noqa: E402
from .video import ScaleSpaceFlow  # noqa: E402

__all__ += [
    "Elic2022Chandelier",
    "SigmoidCDFCompressor",
    "ScaleHyperpriorVbr",
    "MeanScaleHyperpriorVbr",
    "ScaleSpaceFlow",
]
from .vbr import JointAutoregressiveHierarchicalPriorsVbr  # noqa: E402

__all__ += ["JointAutoregressiveHierarchicalPriorsVbr"]
from .pointcloud import PointNetReconstructionPccModel  # noqa: E402

__all__ += ["PointNetReconstructionPccModel"]
