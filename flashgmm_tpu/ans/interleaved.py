"""Fully on-device interleaved rANS codec (the TPU-native fast path).

The reference's coder (rans_interface.cpp) is a single serial 64-bit rANS
chain on the CPU — fundamentally unmappable to TPU, and on this setup every
device<->host round trip costs ~30 ms of tunnel latency. This module removes
the host from the loop entirely: W independent 32-bit rANS lanes advance in
lockstep as vector ops inside one XLA computation, so both encoding and
decoding run on-chip and only final bitstream bytes cross the host boundary.

Design (cf. PAPERS.md: Giesen interleaved entropy coders; Recoil):

* Symbols are round-robined over W lanes: symbol i -> (step t = i // W,
  lane = i % W). Each lane runs its own 32-bit rANS chain (state in
  [2^16, 2^32), 16-bit probabilities, 16-bit word renormalization), so a
  step is W-wide pure vector math — no cross-lane dependencies.
* With state bound L = 2^16 equal to the emission base b = 2^16, each
  encode/decode step emits/consumes AT MOST ONE u16 word per lane, and the
  encoder's emission mask at (reverse) step t equals the decoder's
  consumption mask at (forward) step t. Words are therefore laid out in
  decoder consumption order — (t, lane)-sorted — via a vectorized stream
  compaction; the decoder re-expands each step's chunk with a cumsum +
  one-hot matmul (MXU), no serial host logic anywhere.
* **No bypass/escape coding.** Quantized CDF rows are "guarded" to be
  strictly monotone (every bin gets pmf >= 1 by blending in 1/65536-per-bin
  of uniform mass — rate cost ~L/2^16 ≈ 0.1%), so every in-range symbol is
  codable and the decoder's bin search always lands exactly.
* TPU has no 64-bit vector integer ops and no fast u32 division, so the
  encoder's ``state // freq`` uses an exact base-2^8 long division built
  from float-estimated small divisions with integer correction.

Stream format (self-contained per tensor, assembled by the caller):
  per pass: W u32 lane states (decoder init) + n_words u16 words.
"""

import os

import jax
import jax.numpy as jnp

RANS_L = jnp.uint32(1 << 16)
M_TOTAL = 1 << 16  # probability denominator
MASK16 = jnp.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# exact u32 // u16 division — pure integer shift-subtract
# ---------------------------------------------------------------------------
# An earlier float32-reciprocal implementation (floor(a * (1/f)) with ±1
# corrections) was EXACT standalone but silently wrong when fused into a
# large XLA program on TPU: the fused lowering used a lower-precision
# reciprocal whose error exceeded the correction margin, desynchronizing
# ~1-per-thousand rANS lanes only at skewed frequencies (found with
# trained-EB tables; tools/test_codec_exact_tpu.py reproduces). Integer
# restoring division is immune to any float lowering choice.


def divmod_u32_u16(a, f):
    """Exact (a // f, a % f) for u32 a in the rANS range and 1 <= f < 2^16.

    Precondition (encoder invariant): a < f << 16, so the quotient fits in
    16 bits — a classic 16-iteration restoring long division where the
    remainder stays < 2^17 throughout.
    """
    r = a >> 16
    q = jnp.zeros_like(a)
    one = jnp.uint32(1)
    for i in range(15, -1, -1):
        r = (r << 1) | ((a >> i) & one)
        ge = r >= f
        r = jnp.where(ge, r - f, r)
        q = jnp.where(ge, q | (one << i), q)
    return q, r


def divmod_u32_u16_fast(a, f):
    """Exact (a // f, a % f) under the same precondition, ~4x fewer VPU ops.

    Two-level float32 quotient estimate + integer correction, hardened
    against the exact failure mode in the module header (a fused TPU
    lowering substituting a ~2^-8-relative-error reciprocal for the f32
    division, which overwhelmed a +-1 correction):

      q0 = trunc(f32(a) / f32(f))           # error <= ~256 even at 2^-8
      r0 = a - q0*f                         # |r0| < 2^24: EXACT in f32
      q1 = floor(f32(r0) / f32(f))          # error <= 256 * 2^-8 <= 1
      q  = q0 + q1 (+-2 integer correction) # unconditional exactness

    The second division's operand is small enough that even the degraded
    reciprocal leaves error < 1, and the final correction absorbs +-2.
    Property-tested vs the restoring version on CPU incl. edge operands
    (tests/test_interleaved.py); blessed byte-exact inside the big fused
    programs on the v5e by tools/test_codec_exact_tpu.py (2026-08-19) and
    now the default (FLASHGMM_FAST_DIVMOD=0 restores the restoring path).
    """
    ff = f.astype(jnp.float32)
    q0 = (a.astype(jnp.float32) / ff).astype(jnp.uint32)
    r0 = (a - q0 * f).astype(jnp.int32)  # |r0| < 2^24 by the q0 bound
    q1 = jnp.floor(r0.astype(jnp.float32) / ff).astype(jnp.int32)
    q = (q0.astype(jnp.int32) + q1).astype(jnp.uint32)
    r = a - q * f  # mod 2^32: huge if q overshot
    big = jnp.uint32(1) << 31
    for _ in range(2):
        over = r >= big  # negative in two's complement -> q too large
        under = (~over) & (r >= f)  # q too small
        q = q + under.astype(jnp.uint32) - over.astype(jnp.uint32)
        r = jnp.where(over, r + f, jnp.where(under, r - f, r))
    return q, r


_FAST_DIVMOD = os.environ.get("FLASHGMM_FAST_DIVMOD", "1") == "1"


def divmod_rans(a, f):
    """Encoder divmod dispatch: the float-estimate fast path (default) or
    restoring division (FLASHGMM_FAST_DIVMOD=0).

    The fast path was blessed on the v5e 2026-08-19: bit-exact round
    trips inside the big fused programs with trained-EB tables
    (tools/test_codec_exact_tpu.py — 4 seeds + batch-4 + the Pallas
    lanes=512 backend) and measurably faster encode (8.15 -> 7.32 ms
    single-image device latency at lanes=512; tools/measure_device_latency
    with/without the flag)."""
    return divmod_u32_u16_fast(a, f) if _FAST_DIVMOD else divmod_u32_u16(a, f)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_scan(starts, freqs, active):
    """Run W interleaved rANS encoders over T steps.

    Args:
        starts: uint32 [T, W] quantized CDF at each symbol (< 2^16).
        freqs: uint32 [T, W] bin widths (>= 1, < 2^16).
        active: bool [T, W] validity mask (padding lanes are skipped).

    Returns:
        states: uint32 [W] final lane states (decoder init values).
        words: uint16 [T, W] candidate emission words.
        emits: bool [T, W] emission mask (in decoder consumption order).
    """
    T, W = starts.shape

    def step(x, inp):
        start, freq, act = inp
        x_max = freq << 16
        emit = act & (x >= x_max)
        word = (x & MASK16).astype(jnp.uint16)
        x1 = jnp.where(emit, x >> 16, x)
        q, r = divmod_rans(x1, freq)
        x2 = (q << 16) + r + start
        x = jnp.where(act, x2, x)
        return x, (word, emit)

    init = jnp.full((W,), RANS_L, jnp.uint32)
    states, (words, emits) = jax.lax.scan(
        step, init, (starts, freqs, active), reverse=True
    )
    return states, words, emits


def pack_words(words, emits):
    """Compact [T, W] emissions into a flat u16 stream in (t, lane) order.

    Returns (stream [T*W] u16 zero-padded, n_words i32).
    """
    T, W = words.shape
    flat_w = words.reshape(-1)
    flat_e = emits.reshape(-1)
    pos = jnp.cumsum(flat_e.astype(jnp.int32)) - 1
    n_words = jnp.maximum(pos[-1] + 1, 0).astype(jnp.int32)
    # out-of-bounds scatter indices are dropped
    idx = jnp.where(flat_e, pos, T * W)
    stream = jnp.zeros((T * W,), jnp.uint16).at[idx].set(
        flat_w, mode="drop", unique_indices=False
    )
    return stream, n_words


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _distribute(chunk, rank, w: int):
    """word[i] = chunk[rank[i]] (u16 values, exact in f32).

    A plain one-hot matmul is W^2 — at W=2048 that's a 16 MB f32 operand
    per scan step, which dominates the decode (HBM/VMEM traffic, not
    FLOPs). Factor rank = q*128 + r and select in two stages: a [W, W/128]
    one-hot matmul picks each lane's 128-word block (MXU), then a [W, 128]
    one-hot multiply-reduce picks the word within the block (VPU). Both
    stages fit comfortably in VMEM at any practical W.
    """
    BLK = 128
    cf = chunk.astype(jnp.float32)
    if w <= BLK or w % BLK:
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (w, w), 1) == rank[:, None]
        ).astype(jnp.float32)
        out = jnp.dot(sel, cf, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return out.astype(jnp.int32)
    nb = w // BLK
    q = rank // BLK
    r = rank % BLK
    sel_q = (
        jax.lax.broadcasted_iota(jnp.int32, (w, nb), 1) == q[:, None]
    ).astype(jnp.float32)
    rowvec = jnp.dot(
        sel_q, cf.reshape(nb, BLK), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [W, BLK] — HIGHEST: default-precision MXU dots take bf16 operands,
    # which cannot represent all u16 word values
    sel_r = (
        jax.lax.broadcasted_iota(jnp.int32, (w, BLK), 1) == r[:, None]
    ).astype(jnp.float32)
    return jnp.sum(rowvec * sel_r, axis=1).astype(jnp.int32)


def decode_scan(states, stream, rows, active, lo):
    """Decode T*W symbols with per-symbol guarded CDF rows.

    Args:
        states: uint32 [W] lane init states (from the encoder).
        stream: uint16 [>= n_words + W] word stream in consumption order.
        rows: int32 [T, W, L] strictly-monotone boundary CDFs,
            rows[..., 0] is the CDF below the first bin, rows[..., L-1]
            = 65536. Symbol value = lo + bin.
        active: bool [T, W].
        lo: int32 scalar, value of the first bin.

    Returns:
        symbols: int32 [T, W] decoded values (0 where inactive).
    """
    T, W, L = rows.shape

    # pad stream so dynamic_slice never clamps short
    stream = jnp.concatenate([stream, jnp.zeros((W,), jnp.uint16)])

    def step(carry, inp):
        x, g = carry
        row, act = inp  # [W, L], [W]
        cf = (x & MASK16).astype(jnp.int32)
        below = row <= cf[:, None]
        s = jnp.sum(below.astype(jnp.int32), axis=1) - 1
        s = jnp.clip(s, 0, L - 2)
        # rows are strictly monotone, so row[s] / row[s+1] are the masked
        # max/min — three fused row passes, no one-hot temporaries
        start = jnp.max(jnp.where(below, row, 0), axis=1)
        nxt = jnp.min(jnp.where(below, 65536, row), axis=1)
        freq = (nxt - start).astype(jnp.uint32)

        x2 = freq * (x >> 16) + cf.astype(jnp.uint32) - start.astype(jnp.uint32)
        need = act & (x2 < RANS_L)
        rank = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)

        chunk = jax.lax.dynamic_slice(stream, (g,), (W,))
        word = _distribute(chunk, rank, W)

        x3 = jnp.where(need, (x2 << 16) | word.astype(jnp.uint32), x2)
        x = jnp.where(act, x3, x)
        g = g + jnp.sum(need.astype(jnp.int32))
        sym = jnp.where(act, lo + s, 0)
        return (x, g), sym

    (x_fin, g_fin), symbols = jax.lax.scan(
        step, (states, jnp.int32(0)), (rows, active)
    )
    return symbols


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def layout(n: int, w: int):
    """(T, pad) for laying n symbols over w lanes."""
    t = -(-max(n, 1) // w)
    return t, t * w - n


def to_lanes(x, w: int, fill=0):
    """[N, ...] -> [T, W, ...] row-major with padding."""
    n = x.shape[0]
    t, pad = layout(n, w)
    if pad:
        pad_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        x = jnp.concatenate([x, pad_block])
    return x.reshape((t, w) + x.shape[1:])


def active_mask(n: int, t: int, w: int):
    idx = jax.lax.broadcasted_iota(jnp.int32, (t, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)
    return idx < n


def from_lanes(x, n: int):
    """[T, W, ...] -> [N, ...]."""
    t, w = x.shape[:2]
    return x.reshape((t * w,) + x.shape[2:])[:n]
