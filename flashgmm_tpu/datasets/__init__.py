from .image import ImageFolder, load_image, save_image
from .loader import BatchLoader

__all__ = ["ImageFolder", "BatchLoader", "load_image", "save_image"]
from .rawvideo import RawVideoSequence, VideoFormat, get_raw_video_file_info  # noqa: E402
from .video import VideoFolder, Vimeo90kDataset  # noqa: E402

__all__ += [
    "RawVideoSequence",
    "VideoFormat",
    "get_raw_video_file_info",
    "VideoFolder",
    "Vimeo90kDataset",
]
from .utils import (  # noqa: E402
    CacheDataset,
    NdArrayDataset,
    PreGeneratedMemmapDataset,
    StackDataset,
)

__all__ += [
    "CacheDataset",
    "NdArrayDataset",
    "StackDataset",
    "PreGeneratedMemmapDataset",
]
from .pointcloud import (  # noqa: E402
    ModelNetDataset,
    PointCloudFolder,
    S3disDataset,
    SemanticKittiDataset,
    ShapeNetCorePartDataset,
    load_point_cloud,
)

__all__ += [
    "ModelNetDataset", "PointCloudFolder", "S3disDataset",
    "SemanticKittiDataset", "ShapeNetCorePartDataset",
    "load_point_cloud",
]
