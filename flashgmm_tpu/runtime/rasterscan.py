"""Host-side raster-scan autoregression for PixelCNN-style context models.

The AR decode chain (mbt2018 / cheng2020-anchor) is inherently serial per
pixel — the reference runs it as a per-pixel GPU+CPU loop
(models/google.py:616-736). Here both encode and decode run the per-pixel
context math in numpy float32 (identical op order on both sides, so the
scale-table indexes always agree), feeding the native streaming rANS
decoder. Dense (training) forwards stay fully on TPU.
"""

import numpy as np

from flashgmm_tpu.ans import RansEncoder, cext


def _leaky_relu(x):
    return np.where(x >= 0, x, 0.01 * x)


class HostEntropyParameters:
    """1x1-conv chain as numpy matmuls; weights pulled from nnx modules."""

    def __init__(self, ep_module):
        import jax

        self.layers = []
        for layer in ep_module.layers:
            if hasattr(layer, "kernel"):
                w = np.asarray(jax.device_get(layer.kernel.value))  # [1,1,i,o]
                b = np.asarray(jax.device_get(layer.bias.value))
                self.layers.append((w.reshape(w.shape[2], w.shape[3]), b))
            else:
                self.layers.append(None)  # activation

    def __call__(self, v):
        for entry in self.layers:
            if entry is None:
                v = _leaky_relu(v)
            else:
                w, b = entry
                v = v @ w + b
        return v


class HostMaskedConv:
    """5x5 masked conv at a single spatial position."""

    def __init__(self, conv_module):
        import jax

        self.kernel = np.asarray(
            jax.device_get(conv_module.kernel.value * conv_module.mask.value)
        )  # [kh, kw, C, O]
        self.bias = np.asarray(jax.device_get(conv_module.bias.value))
        kh, kw, c, o = self.kernel.shape
        self.k = kh
        self.flat = self.kernel.reshape(-1, o)

    def __call__(self, window):
        """window: [k, k, C] -> [O]."""
        return window.reshape(-1) @ self.flat + self.bias


def build_indexes_np(scales, scale_table, scale_bound):
    scales = np.maximum(scales, scale_bound)
    idx = np.full(scales.shape, len(scale_table) - 1, np.int32)
    for s in scale_table[:-1]:
        idx -= (scales <= s).astype(np.int32)
    return idx


def raster_scan_compress_single_stream(
    y, params, ctx_conv, ep, gc_tables, scale_table, scale_bound, vbr=None,
):
    """y: [H, W, C] numpy; params: [H, W, P] hyper side-params.

    Returns the encoded byte string. The y_hat feedback uses
    ``quantize + means`` exactly like the decoder will reconstruct.

    ``vbr`` (optional) is a dict with keys {scale, rescale, ctx_scl,
    offset_fn} enabling the gain-scaled VBR path (models/vbr.py: the AR
    context is additionally conditioned on the quantization scale and
    symbols are coded in the gain-scaled domain).
    """
    h, w, c = y.shape
    pad = (ctx_conv.k - 1) // 2
    y_hat = np.zeros((h + 2 * pad, w + 2 * pad, c), np.float32)
    y_hat[pad : pad + h, pad : pad + w] = y

    cdfs, cdf_lengths, offsets = gc_tables
    symbols = np.empty(h * w * c, np.int32)
    indexes = np.empty(h * w * c, np.int32)
    n = 0
    for i in range(h):
        for j in range(w):
            window = y_hat[i : i + ctx_conv.k, j : j + ctx_conv.k]
            ctx = ctx_conv(window)
            if vbr is not None:
                ctx = ctx + vbr["ctx_scl"]
            gp = ep(np.concatenate([params[i, j], ctx]))
            scales_hat, means_hat = np.split(gp, 2)
            if vbr is None:
                idx = build_indexes_np(scales_hat, scale_table, scale_bound)
                y_q = np.round(y[i, j] - means_hat).astype(np.int32)
                y_hat[i + pad, j + pad] = y_q + means_hat
            else:
                s, rs = vbr["scale"], vbr["rescale"]
                idx = build_indexes_np(scales_hat * s, scale_table, scale_bound)
                y_q = np.round((y[i, j] - means_hat) * s).astype(np.int32)
                rec = _vbr_reconstruct(y_q, scales_hat, means_hat, s, rs, vbr)
                y_hat[i + pad, j + pad] = rec
            symbols[n : n + c] = y_q
            indexes[n : n + c] = idx
            n += c

    enc = RansEncoder()
    return enc.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)


def _vbr_reconstruct(y_q, scales_hat, means_hat, s, rs, vbr):
    """Gain-scaled reconstruction with optional quantization offsets."""
    offset_fn = vbr.get("offset_fn")
    q = y_q.astype(np.float32)
    if offset_fn is None:
        return q * rs + means_hat
    q_abs = np.abs(q)
    signs = np.sign(q)
    q_stdev = np.maximum(scales_hat * s, vbr["scale_bound"])
    q_off = offset_fn(q_stdev, s)
    q_off = np.where(q_abs < 1e-4, 0.0, q_off)
    return signs * (q_abs + q_off) * rs + means_hat


def raster_scan_decompress_single_stream(
    string, params, ctx_conv, ep, gc_tables, scale_table, scale_bound, shape,
    vbr=None,
):
    """Returns y_hat [H, W, C] numpy."""
    h, w, c = shape
    pad = (ctx_conv.k - 1) // 2
    y_hat = np.zeros((h + 2 * pad, w + 2 * pad, c), np.float32)

    cdfs, cdf_lengths, offsets = gc_tables
    dec = cext.StreamingDecoder(string, cdfs, cdf_lengths, offsets)
    try:
        for i in range(h):
            for j in range(w):
                window = y_hat[i : i + ctx_conv.k, j : j + ctx_conv.k]
                ctx = ctx_conv(window)
                if vbr is not None:
                    ctx = ctx + vbr["ctx_scl"]
                gp = ep(np.concatenate([params[i, j], ctx]))
                scales_hat, means_hat = np.split(gp, 2)
                if vbr is None:
                    idx = build_indexes_np(scales_hat, scale_table, scale_bound)
                    rv = dec.decode(idx)
                    y_hat[i + pad, j + pad] = rv + means_hat
                else:
                    s, rs = vbr["scale"], vbr["rescale"]
                    idx = build_indexes_np(
                        scales_hat * s, scale_table, scale_bound
                    )
                    rv = dec.decode(idx)
                    y_hat[i + pad, j + pad] = _vbr_reconstruct(
                        rv.astype(np.float32), scales_hat, means_hat, s, rs, vbr
                    )
    finally:
        dec.close()
    return y_hat[pad : pad + h, pad : pad + w]
