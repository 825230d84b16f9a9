from .sfu_pointnet import PointNetReconstructionPccModel

__all__ = ["PointNetReconstructionPccModel"]
from .sfu_pointnet2 import PointNet2ReconstructionPccModel  # noqa: E402

__all__ += ["PointNet2ReconstructionPccModel"]
from .hrtzxf2022 import Hrtzxf2022PccModel  # noqa: E402

__all__ += ["Hrtzxf2022PccModel"]
