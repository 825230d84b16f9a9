from .sfu_pointnet import PointNetReconstructionPccModel

__all__ = ["PointNetReconstructionPccModel"]
from .sfu_pointnet2 import PointNet2ReconstructionPccModel  # noqa: E402

__all__ += ["PointNet2ReconstructionPccModel"]
