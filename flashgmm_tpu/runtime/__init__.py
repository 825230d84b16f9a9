from .fast_codec import FastCheckerboardGmmCodec, FastCheckerboardGsmCodec

__all__ = ["FastCheckerboardGmmCodec", "FastCheckerboardGsmCodec"]
from .fast_elic import FastElicGmmCodec  # noqa: E402

__all__ += ["FastElicGmmCodec"]
from .latency_codec import FastLatencyGmmCodec  # noqa: E402
from .latency_elic import FastLatencyElicCodec  # noqa: E402

__all__ += ["FastLatencyGmmCodec", "FastLatencyElicCodec"]
