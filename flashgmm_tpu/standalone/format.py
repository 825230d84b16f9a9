"""Python twin of the standalone bitstream ("FGSAB001").

Byte-compatible with csrc/standalone/codec.h: streams produced here decode
with the C++ ``fgsc_decode`` binary and vice versa (the body is the same
table-rANS format both the C++ standalone codec and the framework's host
coder emit — csrc/rans.cpp). Used for interop tests and as a pure-Python
encode/decode path through the JAX model.

Layout (little-endian):
    magic[8]="FGSAB001" | w:u16 h:u16 M:u16 | down:u8 flags:u8
    | bitmap: ceil(M/8) bytes (bit k = channel k coded)
    | body_len:u32 | body
Body symbols: active channels ascending, channel-major, row-major spatial,
index = channel id, coded with the EntropyBottleneck tables.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np

from flashgmm_tpu.ans import cext

_MAGIC = b"FGSAB001"


def _eb_tables(model):
    eb = model.entropy_bottleneck
    cdfs = np.asarray(jax.device_get(eb._quantized_cdf.value), np.int32)
    lengths = np.asarray(jax.device_get(eb._cdf_length.value), np.int32).ravel()
    offsets = np.asarray(jax.device_get(eb._offset.value), np.int32).ravel()
    medians = np.asarray(
        jax.device_get(jax.lax.stop_gradient(eb._get_medians())[:, 0, 0]),
        np.float32,
    )
    return cdfs, lengths, offsets, medians


def replicate_pad(x: np.ndarray, multiple: int) -> np.ndarray:
    """Pad [H, W, C] to a size multiple with edge replication (matches the
    C++ encoder's image_to_tensor padding)."""
    h, w = x.shape[:2]
    ph = (h + multiple - 1) // multiple * multiple
    pw = (w + multiple - 1) // multiple * multiple
    return np.pad(x, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")


def pack_bitstream(symbols: np.ndarray, model, img_w: int, img_h: int) -> bytes:
    """Pack integer symbols [Hl, Wl, M] (= round(y - median)) into a
    standalone bitstream."""
    cdfs, lengths, offsets, _ = _eb_tables(model)
    m_ch = int(cdfs.shape[0])
    hl, wl, c = symbols.shape
    if c != m_ch:
        raise ValueError(f"symbols C={c} != model latent channels {m_ch}")
    down = int(getattr(model, "downsampling_factor", 16))

    sym_cm = np.ascontiguousarray(
        np.transpose(symbols.astype(np.int32), (2, 0, 1))
    )  # [C, H, W]
    active = np.any(sym_cm != 0, axis=(1, 2))
    act_idx = np.nonzero(active)[0]
    flat_syms = sym_cm[act_idx].reshape(-1)
    flat_idx = np.repeat(act_idx.astype(np.int32), hl * wl)
    body = (
        cext.encode_with_indexes(flat_syms, flat_idx, cdfs, lengths, offsets)
        if flat_syms.size
        else b""
    )

    bitmap = np.packbits(active.astype(np.uint8), bitorder="little").tobytes()
    header = (
        _MAGIC
        + struct.pack("<HHHBB", img_w, img_h, m_ch, down, 1)
        + bitmap
        + struct.pack("<I", len(body))
    )
    return header + body


def unpack_bitstream(data: bytes, model):
    """Parse a standalone bitstream -> (symbols [Hl, Wl, M], img_w, img_h)."""
    if data[:8] != _MAGIC:
        raise ValueError("bad standalone bitstream magic")
    img_w, img_h, m_ch, down, flags = struct.unpack_from("<HHHBB", data, 8)
    cdfs, lengths, offsets, _ = _eb_tables(model)
    if m_ch != cdfs.shape[0]:
        raise ValueError("bitstream/model channel mismatch")
    if down != int(getattr(model, "downsampling_factor", 16)):
        raise ValueError(
            f"bitstream downsampling {down} != model's "
            f"{getattr(model, 'downsampling_factor', 16)}"
        )
    if flags != 1:
        raise ValueError(f"unknown bitstream flags {flags}")
    nbm = (m_ch + 7) // 8
    bitmap = np.unpackbits(
        np.frombuffer(data, np.uint8, nbm, 16), bitorder="little"
    )[:m_ch].astype(bool)
    (body_len,) = struct.unpack_from("<I", data, 16 + nbm)
    body = data[16 + nbm + 4 : 16 + nbm + 4 + body_len]

    hl = (img_h + down - 1) // down
    wl = (img_w + down - 1) // down
    sym_cm = np.zeros((m_ch, hl, wl), np.int32)
    act_idx = np.nonzero(bitmap)[0]
    if act_idx.size:
        flat_idx = np.repeat(act_idx.astype(np.int32), hl * wl)
        decoded = cext.decode_with_indexes(body, flat_idx, cdfs, lengths, offsets)
        sym_cm[act_idx] = np.asarray(decoded, np.int32).reshape(-1, hl, wl)
    return np.transpose(sym_cm, (1, 2, 0)), img_w, img_h


def encode_bitstream(model, image: np.ndarray) -> bytes:
    """Encode an [H, W, 3] float image in [0, 1] (or uint8) through the JAX
    g_a into a standalone bitstream."""
    x = np.asarray(image)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    img_h, img_w = x.shape[:2]
    down = int(getattr(model, "downsampling_factor", 16))
    xp = replicate_pad(x.astype(np.float32), down)
    y = np.asarray(jax.device_get(model.g_a(jnp.asarray(xp)[None]))[0])
    _, _, _, medians = _eb_tables(model)
    # round-half-away-from-zero, matching the C++ encoder (codec.h)
    rel = y - medians[None, None, :]
    symbols = np.sign(rel) * np.floor(np.abs(rel) + 0.5)
    return pack_bitstream(symbols.astype(np.int32), model, img_w, img_h)


def decode_bitstream(model, data: bytes) -> np.ndarray:
    """Decode a standalone bitstream through the JAX g_s -> [H, W, 3] float."""
    symbols, img_w, img_h = unpack_bitstream(data, model)
    _, _, _, medians = _eb_tables(model)
    y_hat = symbols.astype(np.float32) + medians[None, None, :]
    x_hat = np.asarray(jax.device_get(model.g_s(jnp.asarray(y_hat)[None]))[0])
    return np.clip(x_hat[:img_h, :img_w], 0.0, 1.0)
