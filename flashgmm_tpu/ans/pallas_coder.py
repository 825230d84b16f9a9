"""Pallas TPU kernel for the interleaved rANS decoder.

The lax.scan decoder pays XLA while-loop overhead per step; this kernel
runs the T steps as a sequential Pallas grid (STEPS_PER_BLOCK steps per
grid iteration) with the lane states in VMEM scratch — grid iterations
execute in order on TPU, so scratch carries the rANS state chain.

Mosaic/VMEM constraints shaped the design (cf. pallas guide):
- the word stream is laid out [S, 128] (128-wide rows) so each step's
  consumption window is a small dynamic sublane slice (8-aligned); each
  lane's word is selected by a [W, NWIN] one-hot MXU matmul picking the
  128-row plus a [W, 128] one-hot multiply-reduce picking the word — no
  W x W temporaries, so the kernel scales to W = 2048+;
- MXU matmuls pass operands through bf16 multipliers, so only bf16-exact
  values may ride them: selectors are 0/1, the u16 words are byte-split
  (the f32 ACCUMULATION is exact); this mirrors the XLA one-hot-sum
  desync hazard found in the fast codec;
- no cumsum primitive (and no 1-D vector reshape, which rules out a
  hierarchical scheme): consumption ranks come from a [W, W]
  strict-triangular MXU matmul — 0/1 operands with f32 accumulation are
  exact, and the W^2 footprint caps the kernel at W <= 512;
- rows stream through BlockSpec double-buffering.

Math is identical to interleaved.decode_scan; bit-equality is asserted in
interpret mode on CPU (tests/test_interleaved.py) and compiled on TPU
(tools/test_pallas_tpu.py).

STATUS (round 2): the Mosaic path COMPILES and decodes BIT-EXACTLY on the
v5e (W=256 and W=512 verified against encode_scan round-trips), but runs
~100x slower than the XLA scan — some kernel op scalarizes (suspects: u32
vector ops, the SMEM-scalar stream cursor update, or the dynamic window
load). The production decoder therefore remains interleaved.decode_scan;
this kernel is kept as the correctness-proven base for future tuning.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS_PER_BLOCK = 8
BLK = 128


# ablation switches for on-TPU profiling (tools/profile_pallas_variants.py):
# each skips one stage of the per-step pipeline so the scalarizing op can
# be isolated by differential timing. Production value: all False.
ABLATE = dict(no_search=False, no_lookup=False, no_rank=False,
              no_window=False, rank_cumsum=False)


def _decode_kernel(states_ref, stream_ref, rows_ref, active_ref, lo_ref,
                   out_ref, x_scratch, g_scratch):
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        x_scratch[:] = states_ref[:]
        g_scratch[0] = 0

    W = states_ref.shape[0]
    L = rows_ref.shape[2]
    nb = W // BLK  # lane rows of 128
    NWIN = nb + 16  # stream rows a step can touch (W words + align slack)

    bin_col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
    # strict lower-triangular [W, W] for the rank prefix sum: 0/1 operands
    # are bf16-exact and the MXU accumulates in f32, so counts <= W are
    # exact; the W^2 footprint caps the kernel at W <= 512 (Mosaic cannot
    # reshape 1-D vectors, which rules out a hierarchical prefix sum)
    lane_colW = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    lane_rowW = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    tri = (lane_colW < lane_rowW).astype(jnp.float32)
    win_col = jax.lax.broadcasted_iota(jnp.int32, (W, NWIN), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 1)

    for k in range(STEPS_PER_BLOCK):
        x = x_scratch[:]
        g = g_scratch[0]
        row = rows_ref[k]  # [W, L] int32
        act = active_ref[k]  # [W] bool

        cf = (x & 0xFFFF).astype(jnp.int32)
        if ABLATE["no_search"]:
            s = jnp.zeros((W,), jnp.int32)
        else:
            s = jnp.sum((row <= cf[:, None]).astype(jnp.int32), axis=1) - 1
            s = jnp.clip(s, 0, L - 2)
        if ABLATE["no_lookup"]:
            start = jnp.zeros((W,), jnp.int32)
            freq = jnp.full((W,), 1, jnp.uint32)
        else:
            oh_s = (bin_col == s[:, None]).astype(jnp.int32)
            oh_s1 = (bin_col == (s + 1)[:, None]).astype(jnp.int32)
            start = jnp.sum(row * oh_s, axis=1)
            nxt = jnp.sum(row * oh_s1, axis=1)
            freq = (nxt - start).astype(jnp.uint32)

        x2 = freq * (x >> 16) + cf.astype(jnp.uint32) - start.astype(jnp.uint32)
        need = act & (x2 < (1 << 16))
        need_i = need.astype(jnp.int32)

        # exclusive prefix sum of `need` over lanes
        if ABLATE["no_rank"]:
            rank = jnp.zeros((W,), jnp.int32)
        elif ABLATE["rank_cumsum"]:
            # lifts the W<=512 tri-matmul cap IF Mosaic lowers cumsum
            rank = jnp.cumsum(need_i) - need_i
        else:
            rank = jnp.dot(
                tri, need.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        if ABLATE["no_window"]:
            word = jnp.zeros((W,), jnp.int32)
        else:
            # stream rows are 128 wide: dynamic 8-aligned sublane window
            srow8 = pl.multiple_of((g // BLK // 8) * 8, 8)
            off = g - srow8 * BLK
            window = stream_ref[pl.ds(srow8, NWIN), :]  # [NWIN, 128] int32
            idx = rank + off  # < W + 8*128 <= NWIN*128
            q = idx // BLK
            r = idx - q * BLK
            sel_q = (win_col == q[:, None]).astype(jnp.float32)  # [W, NWIN]
            w_lo = (window & 0xFF).astype(jnp.float32)
            w_hi = (window >> 8).astype(jnp.float32)
            rv_lo = jnp.dot(sel_q, w_lo, preferred_element_type=jnp.float32)
            rv_hi = jnp.dot(sel_q, w_hi, preferred_element_type=jnp.float32)
            sel_r = (lane128 == r[:, None]).astype(jnp.float32)  # [W, 128]
            word = (
                jnp.sum(rv_lo * sel_r, axis=1).astype(jnp.int32)
                + (jnp.sum(rv_hi * sel_r, axis=1).astype(jnp.int32) << 8)
            )

        x3 = jnp.where(need, (x2 << 16) | word.astype(jnp.uint32), x2)
        x_scratch[:] = jnp.where(act, x3, x)
        g_scratch[0] = g + jnp.sum(need_i)
        out_ref[k] = jnp.where(act, lo_ref[0] + s, 0)


def decode_scan_pallas(states, stream, rows, active, lo):
    """Drop-in replacement for interleaved.decode_scan (TPU).

    Requires W to be a multiple of 128. Pads T to a multiple of
    STEPS_PER_BLOCK; the u16 stream is widened to int32 and reshaped
    [S, 128] with enough zero-padding rows for the aligned window reads.
    """
    T, W, L = rows.shape
    assert W % BLK == 0, "pallas decoder needs lanes % 128 == 0"
    tb = -(-T // STEPS_PER_BLOCK)
    t_pad = tb * STEPS_PER_BLOCK - T
    if t_pad:
        rows = jnp.concatenate(
            [rows, jnp.tile(rows[-1:], (t_pad, 1, 1))], axis=0
        )
        active = jnp.concatenate(
            [active, jnp.zeros((t_pad, W), bool)], axis=0
        )
    nwin = W // BLK + 16
    n_rows = -(-stream.shape[0] // BLK)
    flat = jnp.concatenate(
        [
            stream.astype(jnp.int32),
            jnp.zeros(
                (n_rows * BLK - stream.shape[0] + (nwin + 8) * BLK,),
                jnp.int32,
            ),
        ]
    )
    stream2d = flat.reshape(-1, BLK)
    lo_arr = jnp.full((1,), lo, jnp.int32)

    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((tb * STEPS_PER_BLOCK, W), jnp.int32),
        grid=(tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # states
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stream [S, 128]
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
    )(states, stream2d, rows, active, lo_arr)
    return out[:T]
