from .sfu_pointnet import PointNetReconstructionPccModel

__all__ = ["PointNetReconstructionPccModel"]
