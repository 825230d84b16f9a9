from .fast_codec import FastCheckerboardGmmCodec

__all__ = ["FastCheckerboardGmmCodec"]
