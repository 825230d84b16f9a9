"""Entropy-coding backends.

``RansEncoder``/``RansDecoder`` expose the coding primitives over numpy
buffers, dispatching to the native C++ library (csrc/rans.cpp via ctypes)
and falling back to the pure-numpy implementation.
"""

import numpy as np

from . import cext, rans_numpy
from .pmf_to_cdf import pmf_to_quantized_cdf

__all__ = [
    "RansEncoder",
    "RansDecoder",
    "pmf_to_quantized_cdf",
    "use_cext",
]


def use_cext() -> bool:
    return cext.available()


class RansEncoder:
    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        if cext.available():
            return cext.encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets)
        return rans_numpy.encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets)

    def encode_rows(self, values, rows, lo):
        if cext.available():
            return cext.encode_rows(values, rows, lo)
        return rans_numpy.encode_rows(values, rows, lo)

    def encode_gmm_host(self, values, scales, means, weights, approx_mode=0):
        if cext.available():
            return cext.encode_gmm_host(values, scales, means, weights, approx_mode)
        raise NotImplementedError("host GMM math requires the C extension")


class RansDecoder:
    def decode_with_indexes(self, encoded, indexes, cdfs, cdfs_sizes, offsets):
        if cext.available():
            return cext.decode_with_indexes(encoded, indexes, cdfs, cdfs_sizes, offsets)
        return rans_numpy.decode_with_indexes(encoded, indexes, cdfs, cdfs_sizes, offsets)

    def decode_rows(self, encoded, rows, lo):
        if cext.available():
            return cext.decode_rows(encoded, rows, lo)
        return rans_numpy.decode_rows(encoded, rows, lo)

    def decode_gmm_host(self, encoded, scales, means, weights, max_bs_value,
                        approx_mode=0):
        if cext.available():
            return cext.decode_gmm_host(
                encoded, scales, means, weights, max_bs_value, approx_mode)
        raise NotImplementedError("host GMM math requires the C extension")
