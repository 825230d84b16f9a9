from .fast_codec import FastCheckerboardGmmCodec

__all__ = ["FastCheckerboardGmmCodec"]
from .fast_elic import FastElicGmmCodec  # noqa: E402

__all__ += ["FastElicGmmCodec"]
