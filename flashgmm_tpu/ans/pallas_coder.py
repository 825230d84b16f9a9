"""Pallas TPU kernel for the interleaved rANS decoder (experimental).

The lax.scan decoder pays XLA while-loop overhead per step; this kernel
runs the T steps as a sequential Pallas grid (8 steps per grid iteration to
satisfy TPU tiling and amortize iteration overhead) with the lane states in
VMEM scratch — grid iterations execute in order on TPU, so scratch carries
the rANS state. Math is identical to interleaved.decode_scan and is
verified bit-exact against it in interpreter mode
(tests/test_interleaved.py::TestPallasDecoder).

Status: the Mosaic compiled path is still being brought up on this
environment's remote-compile tunnel (long kernel compile times; dynamic
VMEM loads already reworked to aligned 2W windows and prefix sums to
tri-matmuls for Mosaic). The production decoder remains
interleaved.decode_scan; this kernel is the round-2 optimization target.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS_PER_BLOCK = 8


def _decode_kernel(states_ref, stream_ref, rows_ref, active_ref, lo_ref,
                   out_ref, x_scratch, g_scratch):
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        x_scratch[:] = states_ref[:]
        g_scratch[0] = 0

    W = states_ref.shape[0]
    L = rows_ref.shape[2]
    lane_col2 = jax.lax.broadcasted_iota(jnp.int32, (W, 2 * W), 1)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    # strict lower-triangular matrix: prefix sums as an MXU matmul
    # (Mosaic has no cumsum primitive)
    tri = (lane_col < lane_row).astype(jnp.float32)
    bin_col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)

    for k in range(STEPS_PER_BLOCK):
        x = x_scratch[:]
        g = g_scratch[0]
        row = rows_ref[k]  # [W, L] int32
        act = active_ref[k]  # [W] bool

        cf = (x & 0xFFFF).astype(jnp.int32)
        s = jnp.sum((row <= cf[:, None]).astype(jnp.int32), axis=1) - 1
        s = jnp.clip(s, 0, L - 2)
        oh_s = (bin_col == s[:, None]).astype(jnp.int32)
        oh_s1 = (bin_col == (s + 1)[:, None]).astype(jnp.int32)
        start = jnp.sum(row * oh_s, axis=1)
        nxt = jnp.sum(row * oh_s1, axis=1)
        freq = (nxt - start).astype(jnp.uint32)

        x2 = freq * (x >> 16) + cf.astype(jnp.uint32) - start.astype(jnp.uint32)
        need = act & (x2 < (1 << 16))
        need_i = need.astype(jnp.int32)
        rank = jnp.dot(
            tri, need.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

        # Mosaic requires lane-aligned dynamic vector loads: read an aligned
        # 2W window and fold the misalignment into the one-hot distribute.
        g_al = pl.multiple_of((g // W) * W, W)
        off = g - g_al
        chunk = stream_ref[pl.ds(g_al, 2 * W)]  # [2W] int32
        sel = (lane_col2 == (rank + off)[:, None]).astype(jnp.int32)
        word = jnp.sum(sel * chunk[None, :], axis=1)

        x3 = jnp.where(need, (x2 << 16) | word.astype(jnp.uint32), x2)
        x_scratch[:] = jnp.where(act, x3, x)
        g_scratch[0] = g + jnp.sum(need_i)
        out_ref[k] = jnp.where(act, lo_ref[0] + s, 0)


def decode_scan_pallas(states, stream, rows, active, lo):
    """Drop-in replacement for interleaved.decode_scan (TPU).

    Pads T to a multiple of 8; the stream is widened to int32.
    """
    T, W, L = rows.shape
    tb = -(-T // STEPS_PER_BLOCK)
    t_pad = tb * STEPS_PER_BLOCK - T
    if t_pad:
        rows = jnp.concatenate(
            [rows, jnp.tile(rows[-1:], (t_pad, 1, 1))], axis=0
        )
        active = jnp.concatenate(
            [active, jnp.zeros((t_pad, W), bool)], axis=0
        )
    stream_i32 = jnp.concatenate(
        [stream.astype(jnp.int32), jnp.zeros((2 * W,), jnp.int32)]
    )
    lo_arr = jnp.full((1,), lo, jnp.int32)

    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((tb * STEPS_PER_BLOCK, W), jnp.int32),
        grid=(tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # states
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stream (resident)
            pl.BlockSpec((STEPS_PER_BLOCK, W, L), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEPS_PER_BLOCK, W), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo
        ],
        out_specs=pl.BlockSpec((STEPS_PER_BLOCK, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(states, stream_i32, rows, active, lo_arr)
    return out[:T]
