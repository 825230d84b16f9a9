"""ctypes bindings for the native host rANS coder (csrc/rans.cpp).

Builds the shared library on first use (g++ -O3). Falls back to the numpy
implementation in :mod:`flashgmm_tpu.ans.rans_numpy` if compilation fails.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_ABI_VERSION = 8

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "csrc", "rans.cpp"))
_LIB_PATH = os.path.join(_HERE, "_librans.so")

_lock = threading.Lock()
_lib = None
_build_error = None


def _build():
    # -ffp-contract=off: gcc's default (=fast) contracts the GMM mixture
    # accumulation into FMAs, which changes f32 rounding vs the reference
    # build and breaks bitstream bit-exactness (tests/expected/reference).
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-ffp-contract=off", "-o", _LIB_PATH, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            need_build = True
            if os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
                if os.path.getmtime(_LIB_PATH) > os.path.getmtime(_SRC):
                    lib = ctypes.CDLL(_LIB_PATH)
                    if lib.fg_abi_version() == _ABI_VERSION:
                        need_build = False
                        _lib = lib
            if need_build:
                _build()
                _lib = ctypes.CDLL(_LIB_PATH)
                assert _lib.fg_abi_version() == _ABI_VERSION
            _declare(_lib)
        except Exception as e:  # pragma: no cover - env without g++
            _build_error = e
            _lib = None
        return _lib


def _declare(lib):
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32

    lib.fg_encode_with_indexes.restype = i64
    lib.fg_encode_with_indexes.argtypes = [
        i32p, i32p, i64, i32p, i64, i32p, i32p, u8p, i64]
    lib.fg_decode_with_indexes.restype = i64
    lib.fg_decode_with_indexes.argtypes = [
        u8p, i64, i32p, i64, i32p, i64, i32p, i32p, i32p]
    lib.fg_encode_rows.restype = i64
    lib.fg_encode_rows.argtypes = [i32p, i64, u16p, i64, i32, u8p, i64]
    lib.fg_decode_rows.restype = i64
    lib.fg_decode_rows.argtypes = [u8p, i64, u16p, i64, i64, i32, i32p]
    lib.fg_encode_gmm_host.restype = i64
    lib.fg_encode_gmm_host.argtypes = [i32p, i64, f32p, f32p, f32p, i32, i32, i32, u8p, i64]
    lib.fg_decode_gmm_host.restype = i64
    lib.fg_decode_gmm_host.argtypes = [u8p, i64, i64, f32p, f32p, f32p, i32, i32, i32, i32, i32p]
    lib.fg_decoder_new.restype = ctypes.c_void_p
    lib.fg_decoder_new.argtypes = [u8p, i64]
    lib.fg_decoder_decode.restype = i64
    lib.fg_decoder_decode.argtypes = [
        ctypes.c_void_p, i32p, i64, i32p, i64, i32p, i32p, i32p]
    lib.fg_decoder_free.restype = None
    lib.fg_decoder_free.argtypes = [ctypes.c_void_p]


_ERR_INVALID_CDF = -(2**63)  # kErrInvalidCdf in csrc/rans.cpp
_ERR_SHORT_BUFFER = -(2**63) + 1  # kErrShortBuffer


def _check_rc(nbytes: int) -> int:
    """Raise on coder error sentinels. Other negative returns pass through:
    the encoder entry points return ``-needed_capacity`` when the output
    buffer was too small (csrc/rans.cpp SymbolBuffer::flush) and the encode
    wrappers retry with that exact capacity."""
    if nbytes == _ERR_INVALID_CDF:
        raise ValueError(
            "invalid CDF table passed to the host coder (non-monotone row or "
            "bad first/last entry); detected because FLASHGMM_DEBUG=1"
        )
    if nbytes == _ERR_SHORT_BUFFER:
        raise ValueError(
            "encoded stream shorter than the 8-byte rANS initial state "
            "(truncated or corrupt input)"
        )
    return nbytes


def _check_decode_rc(nbytes: int) -> int:
    """Decoders have no capacity-retry protocol: any negative is an error."""
    nbytes = _check_rc(nbytes)
    if nbytes < 0:
        raise ValueError(f"host coder error {nbytes}")
    return nbytes


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _enc_capacity(n_symbols: int) -> int:
    # Worst case per symbol: 1 coded slot + ~10 bypass chunks, each possibly
    # emitting a 4-byte renorm word, + 8 flush bytes.
    return 48 * max(n_symbols, 1) + 64


def encode_with_indexes(symbols, indexes, cdfs, cdfs_sizes, offsets) -> bytes:
    lib = _load()
    symbols = np.ascontiguousarray(symbols, dtype=np.int32).ravel()
    indexes = np.ascontiguousarray(indexes, dtype=np.int32).ravel()
    cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
    cdfs_sizes = np.ascontiguousarray(cdfs_sizes, dtype=np.int32).ravel()
    offsets = np.ascontiguousarray(offsets, dtype=np.int32).ravel()
    n = symbols.shape[0]
    out = np.empty(_enc_capacity(n), dtype=np.uint8)
    nbytes = lib.fg_encode_with_indexes(
        _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
        n, _ptr(cdfs, ctypes.c_int32), cdfs.shape[1],
        _ptr(cdfs_sizes, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
        _ptr(out, ctypes.c_uint8), out.shape[0])
    nbytes = _check_rc(nbytes)
    if nbytes < 0:
        out = np.empty(-nbytes, dtype=np.uint8)
        nbytes = lib.fg_encode_with_indexes(
            _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
            n, _ptr(cdfs, ctypes.c_int32), cdfs.shape[1],
            _ptr(cdfs_sizes, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
            _ptr(out, ctypes.c_uint8), out.shape[0])
    return out[:nbytes].tobytes()


def decode_with_indexes(encoded: bytes, indexes, cdfs, cdfs_sizes, offsets):
    lib = _load()
    indexes = np.ascontiguousarray(indexes, dtype=np.int32).ravel()
    cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
    cdfs_sizes = np.ascontiguousarray(cdfs_sizes, dtype=np.int32).ravel()
    offsets = np.ascontiguousarray(offsets, dtype=np.int32).ravel()
    data = np.frombuffer(encoded, dtype=np.uint8)
    out = np.empty(indexes.shape[0], dtype=np.int32)
    _check_decode_rc(lib.fg_decode_with_indexes(
        _ptr(data, ctypes.c_uint8), data.shape[0],
        _ptr(indexes, ctypes.c_int32), indexes.shape[0],
        _ptr(cdfs, ctypes.c_int32), cdfs.shape[1],
        _ptr(cdfs_sizes, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
        _ptr(out, ctypes.c_int32)))
    return out


def encode_rows(values, rows, lo: int) -> bytes:
    lib = _load()
    values = np.ascontiguousarray(values, dtype=np.int32).ravel()
    rows = np.ascontiguousarray(rows, dtype=np.uint16)
    out = np.empty(_enc_capacity(values.shape[0]), dtype=np.uint8)
    nbytes = lib.fg_encode_rows(
        _ptr(values, ctypes.c_int32), values.shape[0],
        _ptr(rows, ctypes.c_uint16), rows.shape[1], int(lo),
        _ptr(out, ctypes.c_uint8), out.shape[0])
    nbytes = _check_rc(nbytes)
    if nbytes < 0:
        out = np.empty(-nbytes, dtype=np.uint8)
        nbytes = lib.fg_encode_rows(
            _ptr(values, ctypes.c_int32), values.shape[0],
            _ptr(rows, ctypes.c_uint16), rows.shape[1], int(lo),
            _ptr(out, ctypes.c_uint8), out.shape[0])
    return out[:nbytes].tobytes()


def decode_rows(encoded: bytes, rows, lo: int):
    lib = _load()
    rows = np.ascontiguousarray(rows, dtype=np.uint16)
    data = np.frombuffer(encoded, dtype=np.uint8)
    out = np.empty(rows.shape[0], dtype=np.int32)
    _check_decode_rc(lib.fg_decode_rows(
        _ptr(data, ctypes.c_uint8), data.shape[0],
        _ptr(rows, ctypes.c_uint16), rows.shape[0], rows.shape[1], int(lo),
        _ptr(out, ctypes.c_int32)))
    return out


def get_use_simd() -> int:
    """Reference USE_SIMD env semantics (rans_interface.cpp:119-130):
    enabled unless the env var is exactly "0". The SIMD and scalar reference
    paths produce DIFFERENT bitstreams (Cephes exp + hadd reduction vs libm
    exp + sequential sum), so this must mirror the encoding side's setting."""
    import os

    return 0 if os.environ.get("USE_SIMD") == "0" else 1


def encode_gmm_host(values, scales, means, weights, approx_mode: int = 0,
                    use_simd=None) -> bytes:
    lib = _load()
    use_simd = get_use_simd() if use_simd is None else int(use_simd)
    values = np.ascontiguousarray(values, dtype=np.int32).ravel()
    scales = np.ascontiguousarray(scales, dtype=np.float32)
    means = np.ascontiguousarray(means, dtype=np.float32)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    K = scales.shape[1]
    out = np.empty(_enc_capacity(values.shape[0]), dtype=np.uint8)
    nbytes = lib.fg_encode_gmm_host(
        _ptr(values, ctypes.c_int32), values.shape[0],
        _ptr(scales, ctypes.c_float), _ptr(means, ctypes.c_float),
        _ptr(weights, ctypes.c_float), K, int(approx_mode), use_simd,
        _ptr(out, ctypes.c_uint8), out.shape[0])
    nbytes = _check_rc(nbytes)
    if nbytes < 0:
        out = np.empty(-nbytes, dtype=np.uint8)
        nbytes = lib.fg_encode_gmm_host(
            _ptr(values, ctypes.c_int32), values.shape[0],
            _ptr(scales, ctypes.c_float), _ptr(means, ctypes.c_float),
            _ptr(weights, ctypes.c_float), K, int(approx_mode), use_simd,
            _ptr(out, ctypes.c_uint8), out.shape[0])
    return out[:nbytes].tobytes()


def encode_gsm_host(values, scales, approx_mode: int = 0) -> bytes:
    """Table-free single-Gaussian (GSM) host encode, bit-identical to the
    reference overload ``encode_with_indexes(symbols, scales, max_value)``
    (rans_interface.cpp:401-456): a K=1 mixture with mean 0 and weight 1
    evaluates to exactly the same f32 CDF."""
    scales = np.ascontiguousarray(scales, dtype=np.float32).reshape(-1, 1)
    zeros = np.zeros_like(scales)
    ones = np.ones_like(scales)
    return encode_gmm_host(values, scales, zeros, ones, approx_mode,
                           use_simd=0)


def decode_gsm_host(encoded: bytes, scales, max_bs_value: int,
                    approx_mode: int = 0):
    """Search-based GSM host decode (cf. rans_interface.cpp:690-764)."""
    scales = np.ascontiguousarray(scales, dtype=np.float32).reshape(-1, 1)
    zeros = np.zeros_like(scales)
    ones = np.ones_like(scales)
    return decode_gmm_host(encoded, scales, zeros, ones, max_bs_value,
                           approx_mode, use_simd=0)


class StreamingDecoder:
    """Stateful table-path decoder for autoregressive models (decode a few
    symbols, feed them to the context model, repeat)."""

    def __init__(self, encoded: bytes, cdfs, cdfs_sizes, offsets):
        self._lib = _load()
        self._data = np.frombuffer(encoded, dtype=np.uint8)
        self._handle = self._lib.fg_decoder_new(
            _ptr(self._data, ctypes.c_uint8), self._data.shape[0]
        )
        if not self._handle:  # nullptr: stream shorter than the rANS state
            raise ValueError(
                "encoded stream shorter than the 8-byte rANS initial state "
                "(truncated or corrupt input)"
            )
        self._cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        self._sizes = np.ascontiguousarray(cdfs_sizes, dtype=np.int32).ravel()
        self._offsets = np.ascontiguousarray(offsets, dtype=np.int32).ravel()

    def decode(self, indexes):
        indexes = np.ascontiguousarray(indexes, dtype=np.int32).ravel()
        out = np.empty(indexes.shape[0], dtype=np.int32)
        self._lib.fg_decoder_decode(
            self._handle, _ptr(indexes, ctypes.c_int32), indexes.shape[0],
            _ptr(self._cdfs, ctypes.c_int32), self._cdfs.shape[1],
            _ptr(self._sizes, ctypes.c_int32), _ptr(self._offsets, ctypes.c_int32),
            _ptr(out, ctypes.c_int32))
        return out

    def close(self):
        if self._handle is not None:
            self._lib.fg_decoder_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_gmm_host(encoded: bytes, scales, means, weights, max_bs_value: int,
                    approx_mode: int = 0, use_simd=None):
    lib = _load()
    use_simd = get_use_simd() if use_simd is None else int(use_simd)
    scales = np.ascontiguousarray(scales, dtype=np.float32)
    means = np.ascontiguousarray(means, dtype=np.float32)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    data = np.frombuffer(encoded, dtype=np.uint8)
    out = np.empty(scales.shape[0], dtype=np.int32)
    _check_decode_rc(lib.fg_decode_gmm_host(
        _ptr(data, ctypes.c_uint8), data.shape[0], scales.shape[0],
        _ptr(scales, ctypes.c_float), _ptr(means, ctypes.c_float),
        _ptr(weights, ctypes.c_float), scales.shape[1], int(max_bs_value),
        int(approx_mode), use_simd, _ptr(out, ctypes.c_int32)))
    return out
