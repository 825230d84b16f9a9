from .functional import (
    rgb2ycbcr,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)

__all__ = ["rgb2ycbcr", "ycbcr2rgb", "yuv_444_to_420", "yuv_420_to_444"]

from .transforms import RGB2YCbCr, YCbCr2RGB, YUV420To444, YUV444To420  # noqa: E402

__all__ += ["RGB2YCbCr", "YCbCr2RGB", "YUV444To420", "YUV420To444"]

from .point import (  # noqa: E402
    GeneratePositionNormals,
    NormalizeScaleV2,
    RandomPermutation,
    RandomRotateFull,
    RandomSample,
    SamplePointsV2,
    ToDict,
)

__all__ += [
    "GeneratePositionNormals", "NormalizeScaleV2", "RandomPermutation",
    "RandomRotateFull", "RandomSample", "SamplePointsV2", "ToDict",
]
