from .pointnet import PointNetSetMLP, SharedMLP, farthest_point_sample

__all__ = ["SharedMLP", "PointNetSetMLP", "farthest_point_sample"]

from .hrtzxf2022 import (  # noqa: E402
    DensityEmbeddingLayer,
    DownsampleLayer,
    EdgeConv,
    FeatsUpsampleLayer,
    PointTransformerLayer,
    PositionEmbeddingLayer,
    RefineLayer,
    SubPointConv,
    UpsampleLayer,
    UpsampleNumLayer,
    XyzsUpsampleLayer,
    icosphere_directions,
    index_points,
    knn_indices,
    nearby_distance_sum,
    select_xyzs_and_feats,
)

__all__ += [
    "DensityEmbeddingLayer", "DownsampleLayer", "EdgeConv",
    "FeatsUpsampleLayer", "PointTransformerLayer", "PositionEmbeddingLayer",
    "RefineLayer", "SubPointConv", "UpsampleLayer", "UpsampleNumLayer",
    "XyzsUpsampleLayer", "icosphere_directions", "index_points",
    "knn_indices", "nearby_distance_sum", "select_xyzs_and_feats",
]

from .pointnet2 import (  # noqa: E402
    PointNetSetAbstraction,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
)

__all__ += [
    "PointNetSetAbstraction", "query_ball_point", "sample_and_group",
    "sample_and_group_all",
]
