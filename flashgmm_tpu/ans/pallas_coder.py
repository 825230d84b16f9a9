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
- no cumsum primitive (and no 1-D vector reshape): consumption ranks come
  from a [W, W] strict-triangular MXU matmul at W <= 512 (0/1 operands
  with f32 accumulation are exact) and from a hierarchical two-stage
  one-hot-matmul prefix sum above that (see _decode_kernel).

Math is identical to interleaved.decode_scan; bit-equality is asserted in
interpret mode on CPU (tests/test_interleaved.py), compiled on TPU
(tools/test_pallas_tpu.py), and inside the full fused decode program with
trained weights (tools/test_codec_exact_tpu.py, lanes=512 case).

STATUS (round 3): round 2 reported this kernel "~100x slower than the
scan" — that was a TIMING ARTIFACT of the axon tunnel (block_until_ready
acks without waiting; the old harness measured RTT, not execution). With
the fori_loop-slope probe (tools/profile_pallas_variants.py) on the v5e:
W=512 Pallas 0.39 ms vs scan 2.36 ms (6x, bit-exact, T=384/196k syms,
~500M syms/s); at W=1024 the scan's fewer-steps advantage wins (0.60 vs
2.47 ms). Production policy (fast_codec._pallas_decode_default): Pallas
decode at W <= 512 on TPU, XLA scan otherwise.

ROOT CAUSE of the round-3 "lanes=512 desync inside the fused latency
program" (round 4, tools/debug_pallas_fused.py +
tools/debug_pallas_incontext.py): the KERNEL IS INNOCENT. Bisection
showed each float-rows y pass desyncs independently while the z pass
(integer-table rows) never does; and scan-vs-kernel on IDENTICAL traced
rows inside the same fused context agree 0/147456. What actually breaks
is the latency codec's cross-program contract: its encode and decode are
separate XLA programs whose float CDF -> quantized-rows pipelines only
produce bit-identical integers when the two programs are structurally
identical. Swapping the decode backend to this custom call perturbs
XLA's fusion of the SURROUNDING rows computation in the decode program,
so a small fraction of row integers land one ULP across a quantization
boundary vs the encoder's — and the rANS state chain amplifies that to
~30% wrong symbols. The composable codecs are immune by design (encoder
and decoder share the rows executables — fast_codec.py class docstring)
which is why this kernel is production there; the latency codecs pin
scan-decode because their ENCODER's rows fused against a scan-shaped
program, and their on-chip certification guards the contract at runtime.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashgmm_tpu.ans.interleaved import divmod_rans

STEPS_PER_BLOCK = 8
BLK = 128


# ablation switches for on-TPU profiling (tools/profile_pallas_variants.py):
# each skips one stage of the per-step pipeline so the scalarizing op can
# be isolated by differential timing. Production value: all False.
ABLATE = dict(no_search=False, no_lookup=False, no_rank=False,
              no_window=False)


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
    # Rank (exclusive prefix sum of `need` over lanes) constants. Two
    # schemes, chosen statically by W:
    # - W <= 512: one strict-lower-triangular [W, W] MXU matmul (0/1
    #   operands are bf16-exact, f32 accumulation exact) — fastest, but
    #   the W^2 footprint caps it;
    # - W > 512: hierarchical two-stage prefix. Mosaic cannot reshape 1-D
    #   vectors, so the [W] -> [nb, 128] factorization happens through
    #   one-hot matmuls: Qmat[i, b] = [i//128 == b], Rmat[i, r] =
    #   [i%128 == r]. All MXU operands stay in {0, 1} or <= 128
    #   (bf16-exact); sums that exceed 256 live in the f32 accumulator
    #   or on the VPU.
    hier = W > 512
    if hier:
        lane_i_nb = jax.lax.broadcasted_iota(jnp.int32, (W, nb), 0)
        blk_b = jax.lax.broadcasted_iota(jnp.int32, (W, nb), 1)
        q_mat = ((lane_i_nb // BLK) == blk_b).astype(jnp.float32)  # [W, nb]
        lane_i_128 = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 0)
        r_col = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 1)
        r_mat = ((lane_i_128 % BLK) == r_col).astype(jnp.float32)  # [W, 128]
        rr = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        rc = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
        tri_r = (rr < rc).astype(jnp.float32)  # [128,128] strict upper
        br = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        bc = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        tri_nb = (bc < br).astype(jnp.float32)  # [nb,nb] strict lower
    else:
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

        # exclusive prefix sum of `need` over lanes, hierarchically:
        # rank[i] = (# needy lanes in earlier 128-blocks)
        #         + (# needy earlier lanes within i's block)
        if ABLATE["no_rank"]:
            rank = jnp.zeros((W,), jnp.int32)
        elif not hier:
            rank = jnp.dot(
                tri, need_i.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
        else:
            need_f = need_i.astype(jnp.float32)  # [W] of {0,1}
            nr = need_f[:, None] * r_mat  # [W, 128], {0,1}
            a_mat = jnp.dot(q_mat.T, nr,
                            preferred_element_type=jnp.float32)  # [nb, 128]
            p_mat = jnp.dot(a_mat, tri_r,
                            preferred_element_type=jnp.float32)  # <= 127
            # Mosaic only lowers 2-D x 2-D dots: block totals and their
            # prefix stay 2-D ([nb, 128] row-sum on the VPU, [nb, nb] x
            # [nb, 128] through the MXU with {0, 1} x (<=128) operands)
            block_tot = jnp.sum(a_mat, axis=1, keepdims=True)  # [nb, 1]
            bp = jnp.dot(tri_nb, jnp.broadcast_to(block_tot, (nb, BLK)),
                         preferred_element_type=jnp.float32)[:, :1]  # [nb,1]
            # bp can exceed 256 (not bf16-exact)... but operands here are
            # tri_nb in {0,1} and block_tot <= 128, so the MXU product is
            # exact; the >256 SUM happens in the f32 accumulator.
            term1 = jnp.sum(q_mat * bp.T, axis=1)  # [W], VPU broadcast
            within = jnp.sum(
                jnp.dot(q_mat, p_mat, preferred_element_type=jnp.float32)
                * r_mat, axis=1)  # [W]
            rank = (term1 + within).astype(jnp.int32)

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


def _encode_kernel(starts_ref, freqs_ref, active_ref, states_ref,
                   words_ref, emits_ref, x_scratch):
    """One grid iteration = STEPS_PER_BLOCK encode steps, walked in REVERSE
    time order (the grid's index_maps reverse the block order; inside a
    block k runs high->low). Pure VPU math — no rank/window machinery; the
    stream compaction stays in XLA (interleaved.pack_words)."""
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        x_scratch[:] = jnp.full_like(x_scratch, jnp.uint32(1 << 16))

    W = starts_ref.shape[1]

    for k in range(STEPS_PER_BLOCK - 1, -1, -1):
        x = x_scratch[:]
        start = starts_ref[k]  # [W] uint32
        freq = freqs_ref[k]  # [W] uint32
        act = active_ref[k]  # [W] bool

        x_max = freq << 16
        emit = act & (x >= x_max)
        word = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        x1 = jnp.where(emit, x >> 16, x)

        # exact u32 // u16 (pure jnp, shared with the scan encoder so the
        # two backends can never drift): restoring division by default,
        # the float-estimate fast path under FLASHGMM_FAST_DIVMOD=1
        q, r = divmod_rans(x1, freq)

        x2 = (q << 16) + r + start
        x_scratch[:] = jnp.where(act, x2, x)
        words_ref[k] = word
        emits_ref[k] = emit

    @pl.when(tb == pl.num_programs(0) - 1)
    def _fin():
        states_ref[:] = x_scratch[:]


def encode_scan_pallas(starts, freqs, active):
    """Drop-in replacement for interleaved.encode_scan (TPU).

    Same contract: (states [W] u32, words [T, W] u16 candidates, emits
    [T, W] bool in decoder consumption order). Requires W % 128 == 0.
    """
    T, W = starts.shape
    assert W % BLK == 0, "pallas encoder needs lanes % 128 == 0"
    tb = -(-T // STEPS_PER_BLOCK)
    t_pad = tb * STEPS_PER_BLOCK - T
    if t_pad:
        # padding steps are inactive and sit at t >= T, i.e. they are
        # processed FIRST in reverse order — harmless no-ops
        zpad = jnp.zeros((t_pad, W), starts.dtype)
        starts = jnp.concatenate([starts, zpad])
        freqs = jnp.concatenate([freqs, jnp.ones((t_pad, W), freqs.dtype)])
        active = jnp.concatenate([active, jnp.zeros((t_pad, W), bool)])

    rev = lambda t: (tb - 1 - t, 0)  # noqa: E731 — reverse time-block order
    states, words, emits = pl.pallas_call(
        _encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((W,), jnp.uint32),
            jax.ShapeDtypeStruct((tb * STEPS_PER_BLOCK, W), jnp.int32),
            jax.ShapeDtypeStruct((tb * STEPS_PER_BLOCK, W), jnp.bool_),
        ),
        grid=(tb,),
        in_specs=[
            pl.BlockSpec((STEPS_PER_BLOCK, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((STEPS_PER_BLOCK, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((STEPS_PER_BLOCK, W), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((STEPS_PER_BLOCK, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((STEPS_PER_BLOCK, W), rev, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((W,), jnp.uint32)],
    )(starts.astype(jnp.uint32), freqs.astype(jnp.uint32), active)
    return states, words[:T].astype(jnp.uint16), emits[:T]


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
