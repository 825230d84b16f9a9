from .pointnet import PointNetSetMLP, SharedMLP, farthest_point_sample

__all__ = ["SharedMLP", "PointNetSetMLP", "farthest_point_sample"]
