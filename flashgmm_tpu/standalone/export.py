"""Model-card exporter for the standalone C++ codec (csrc/standalone/).

Analog of the reference's extraction pipeline
(compressai/sadl_codec/extract_codec.py + extract_cdf.cpp +
extract_quantizers.py, orchestrated by build_codec.sh) re-designed for
this framework: instead of ONNX -> SADL conversion plus dataset-empirical
CDFs, the card serializes the layer stacks directly (they are
straight-line conv programs) together with the model's own trained
EntropyBottleneck tables — built by ``model.update()``, the same tables
every other coding path in the framework uses.

Card format "FGSAM001" (little-endian; reader: csrc/standalone/common.h):

    magic[8]
    latent_channels:i32  down:i32
    g_a: n_layers:i32, then per layer:
        type:i32 (0 conv | 1 deconv | 2 gdn | 3 igdn | 4 relu | 5 leaky)
        conv/deconv: kh kw in out stride pad outpad :i32,
                     kernel f32[kh*kw*in*out] (HWIO), bias f32[out]
        gdn/igdn:    C:i32, beta f32[C], gamma f32[C*C] ([out, in])
        leaky:       slope f32
    g_s: same
    cdf_stride:i32, cdfs i32[M*stride], cdf_lengths i32[M],
    offsets i32[M], medians f32[M], gains f32[M]
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np

from flashgmm_tpu.layers.gdn import GDN
from flashgmm_tpu.layers.layers import (
    Conv2d,
    ConvTranspose2d,
    LeakyReLU,
    ReLU,
    Sequential,
)

_MAGIC = b"FGSAM001"


def _pack_i32(*vals):
    return struct.pack("<" + "i" * len(vals), *vals)


def _pack_f32(arr):
    return np.ascontiguousarray(arr, np.float32).tobytes()


def _layer_record(layer):
    if isinstance(layer, Conv2d) or isinstance(layer, ConvTranspose2d):
        is_deconv = isinstance(layer, ConvTranspose2d)
        kernel = np.asarray(jax.device_get(layer.kernel.value), np.float32)
        kh, kw, in_ch, out_ch = kernel.shape
        sh, sw = layer.stride
        (ph_pair, pw_pair) = layer.padding
        if kh != kw or sh != sw or ph_pair != pw_pair:
            raise ValueError("standalone export supports square convs only")
        if is_deconv:
            # stored as ((k-1-p, k-1-p+op), ...): recover p and op
            ph = kh - 1 - ph_pair[0]
            op = ph_pair[1] - ph_pair[0]
        else:
            if ph_pair[0] != ph_pair[1]:
                raise ValueError("standalone export: asymmetric conv padding")
            ph = ph_pair[0]
            op = 0
        bias = (
            np.asarray(jax.device_get(layer.bias.value), np.float32)
            if layer.bias is not None
            else np.zeros((out_ch,), np.float32)
        )
        rec = _pack_i32(1 if is_deconv else 0, kh, kw, in_ch, out_ch, sh, ph, op)
        return rec + _pack_f32(kernel) + _pack_f32(bias)
    if isinstance(layer, GDN):
        beta = np.asarray(
            jax.device_get(layer.beta_reparam(layer.beta.value)), np.float32
        )
        gamma = np.asarray(
            jax.device_get(layer.gamma_reparam(layer.gamma.value)), np.float32
        )
        c = beta.shape[0]
        rec = _pack_i32(3 if layer.inverse else 2, c)
        return rec + _pack_f32(beta) + _pack_f32(gamma)
    if isinstance(layer, ReLU):
        return _pack_i32(4)
    if isinstance(layer, LeakyReLU):
        return _pack_i32(5) + struct.pack("<f", float(layer.negative_slope))
    raise ValueError(
        f"standalone export: unsupported layer {type(layer).__name__} "
        "(conv/deconv/GDN/ReLU/LeakyReLU stacks only)"
    )


def _stack_records(seq: Sequential) -> bytes:
    layers = list(seq)
    return _pack_i32(len(layers)) + b"".join(_layer_record(l) for l in layers)


def synthesis_gains(model, latent_hw: int = 8, chunk: int = 16) -> np.ndarray:
    """Per-channel synthesis energy: ``||g_s(base + e_c) - g_s(base)||^2``
    for a centered unit impulse in channel c around the median latent.

    Feeds the C++ encoder's latent-space RDOQ (csrc/standalone/codec.h);
    replaces the reference rdoq.h's per-candidate decoder runs with a
    one-time Jacobian-style probe. Finite step of 1.0 = the actual
    quantization step.
    """
    eb = model.entropy_bottleneck
    medians = np.asarray(
        jax.device_get(jax.lax.stop_gradient(eb._get_medians())[:, 0, 0]),
        np.float32,
    )
    m_ch = medians.shape[0]
    base = jnp.broadcast_to(
        jnp.asarray(medians)[None, None, None, :], (1, latent_hw, latent_hw, m_ch)
    )

    g_s = jax.jit(lambda y: model.g_s(y))
    x0 = g_s(base)
    cy = latent_hw // 2
    gains = np.empty((m_ch,), np.float32)
    for lo in range(0, m_ch, chunk):
        hi = min(lo + chunk, m_ch)
        onehots = jnp.eye(m_ch, dtype=jnp.float32)[lo:hi]  # [b, C]
        batch = jnp.tile(base, (hi - lo, 1, 1, 1))
        batch = batch.at[:, cy, cy, :].add(onehots)
        xs = g_s(batch)
        d = xs - x0
        gains[lo:hi] = np.asarray(
            jax.device_get(jnp.sum(d * d, axis=(1, 2, 3))), np.float32
        )
    return gains


def export_model_card(model, path: str, *, compute_gains: bool = True) -> int:
    """Write the standalone model card for a factorized-prior model.

    The model must expose ``g_a``/``g_s`` Sequential stacks of
    conv/deconv/GDN/ReLU layers and an ``entropy_bottleneck`` with built
    tables (call ``model.update()`` first). Returns bytes written.
    """
    eb = model.entropy_bottleneck
    cdfs = np.asarray(jax.device_get(eb._quantized_cdf.value), np.int32)
    if cdfs.size == 0:
        raise ValueError("EntropyBottleneck tables empty — run model.update()")
    cdf_lengths = np.asarray(jax.device_get(eb._cdf_length.value), np.int32).ravel()
    offsets = np.asarray(jax.device_get(eb._offset.value), np.int32).ravel()
    medians = np.asarray(
        jax.device_get(jax.lax.stop_gradient(eb._get_medians())[:, 0, 0]),
        np.float32,
    )
    m_ch = int(cdfs.shape[0])
    gains = (
        synthesis_gains(model)
        if compute_gains
        else np.ones((m_ch,), np.float32)
    )

    down = int(getattr(model, "downsampling_factor", 16))
    blob = (
        _MAGIC
        + _pack_i32(m_ch, down)
        + _stack_records(model.g_a)
        + _stack_records(model.g_s)
        + _pack_i32(int(cdfs.shape[1]))
        + np.ascontiguousarray(cdfs, np.int32).tobytes()
        + np.ascontiguousarray(cdf_lengths, np.int32).tobytes()
        + np.ascontiguousarray(offsets, np.int32).tobytes()
        + _pack_f32(medians)
        + _pack_f32(gains)
    )
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)
