"""Hand-tiled Pallas TPU convolution for the codec transforms.

XLA:TPU's conv at 192 channels sits at ~29-34% MFU on the v5e
(results/synthetic/MFU.md): 192 = 1.5 x 128 rides the MXU with a ragged
half tile and the generic conv emitter adds its own overheads. This kernel
restructures a stride-1 KxK NHWC conv as one aligned HBM->VMEM DMA per
row-band plus K*K accumulating (H_t*W, C) @ (C, C_out) matmuls:

- channels are zero-padded to a 128-lane multiple at prep time (Mosaic
  requires DMA slices tile-aligned on the minor dim; the zero weight rows
  contribute nothing);
- each grid step DMAs the full-width (H_t + K - 1) row window once, then
  builds the K column-shifted copies VMEM-locally — every (dy, dx) tap is
  then a contiguous row-slice matmul operand (no im2col, no strided
  reshapes);
- taps accumulate into one f32 VMEM scratch; bias / LeakyReLU / residual
  add fuse into the epilogue (bf16 out for chaining into the next layer).

Because a Mosaic kernel compiles to the same binary for the same shapes no
matter what surrounds it, convs routed through here are also *bitwise
reproducible across programs* — unlike XLA convs, whose tiling (and
therefore f32 reduction order) depends on the enclosing fusion. The
entropy-model CDF pipeline leans on that property (VERDICT r4 item 2).

Replaces the perf role of the reference's SIMD rANS centerpiece
(cpp_exts/rans/rans_interface.cpp:250-292) on the transform side; the
reference has no conv kernels of its own (it rides cuDNN).

Inference-path only: there is no custom VJP — training keeps XLA convs
(`use_pallas_conv` is a context manager the runtime codecs enter when
tracing their inference programs).
"""

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_USE = contextvars.ContextVar("flashgmm_use_pallas_conv", default=False)


def pallas_conv_enabled() -> bool:
    return _USE.get()


@contextlib.contextmanager
def use_pallas_conv(enable: bool = True):
    """Route eligible Conv2d calls through the Pallas kernel inside this
    context (trace-time switch; enter it when building inference programs,
    never under jax.grad)."""
    tok = _USE.set(enable)
    try:
        yield
    finally:
        _USE.reset(tok)


def _round_up(v, m):
    return -(-v // m) * m


def _vmem_bytes(h_tile, w, c_in, c_out, k, has_res, esize=2):
    cp = _round_up(c_in, 128)
    co = _round_up(c_out, 128)
    hw = h_tile + k - 1
    w_in = _round_up(w + k - 1, 8)
    b = hw * w_in * cp * esize                    # raw window
    b += k * hw * w * cp * esize                  # shifted windows
    b += h_tile * w * co * 4                      # f32 accumulator
    b += k * k * cp * co * esize                  # weights
    b += 2 * h_tile * w * co * esize              # out block (double-buffered)
    if has_res:
        b += 2 * h_tile * w * co * esize
    return b


def _pick_h_tile(h, w, c_in, c_out, k, has_res, esize=2,
                 budget=10 * 1024 * 1024):
    for ht in (32, 16, 8, 4, 2, 1):
        if h % ht == 0 and _vmem_bytes(ht, w, c_in, c_out, k, has_res,
                                       esize) <= budget:
            return ht
    return None


def conv2d_supported(x_shape, w_shape, stride) -> bool:
    """Eligibility: stride-1 'same' KxK (K odd), channels big enough that
    the MXU path wins, W a sublane multiple, H tileable."""
    n, h, w, c_in = x_shape
    kh, kw, wc_in, c_out = w_shape
    return (
        stride == (1, 1)
        and kh == kw
        and kh % 2 == 1
        and kh <= 7
        and wc_in == c_in
        and c_in >= 64
        and c_out >= 64
        and w % 8 == 0
        and _pick_h_tile(h, w, c_in, c_out, kh, False, 4) is not None
    )


def _conv_kernel(k, h_tile, w, c_pad, c_out, neg_slope, has_res, out_dtype,
                 x_ref, w_ref, b_ref, *rest):
    """One grid step: one aligned DMA lands the row window, K VMEM-local
    column shifts, K*K taps accumulate, epilogue applies bias
    (+ activation / residual)."""
    if has_res:
        res_ref, out_ref, raw, win, acc, sem = rest
    else:
        out_ref, raw, win, acc, sem = rest
    n = pl.program_id(0)
    i = pl.program_id(1)
    hw = h_tile + k - 1

    dma = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(i * h_tile, hw), :, :], raw, sem)
    dma.start()
    dma.wait()

    # K column-shifted copies: window j holds raw[:, j : j + w, :], so tap
    # (dy, dx) is the contiguous row-slice win[dx, dy : dy + h_tile] — a
    # ready matmul operand with no strided reshapes.
    for j in range(k):
        win[j] = raw[:, pl.ds(j, w), :]

    acc[:] = jnp.zeros((h_tile * w, c_out), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            lhs = win[dx, pl.ds(dy, h_tile)].reshape(h_tile * w, c_pad)
            acc[:] += jnp.dot(
                lhs,
                w_ref[dy * k + dx],
                preferred_element_type=jnp.float32,
            )

    y = acc[:] + b_ref[0]
    if neg_slope is not None:
        y = jnp.where(y >= 0, y, neg_slope * y)
    if has_res:
        y = y + res_ref[:].astype(jnp.float32).reshape(h_tile * w, c_out)
    out_ref[:] = y.astype(out_dtype).reshape(1, h_tile, w, c_out)


def conv2d_nhwc_pallas(x, w, b=None, *, activation=None, residual=None,
                       out_dtype=None, h_tile=None, interpret=False,
                       compute_dtype=jnp.bfloat16):
    """Stride-1 'same' KxK conv over NHWC via the hand-tiled MXU kernel.

    x: [N, H, W, C_in] (any float dtype; computed in ``compute_dtype``,
       f32 accumulate)
    w: [K, K, C_in, C_out] HWIO
    b: [C_out] or None
    activation: None | "leaky_relu" (slope 0.01) — fused into the epilogue
    residual: [N, H, W, C_out] or None — fused add after activation
    out_dtype: result dtype (default = compute_dtype)
    compute_dtype: bf16 (fast transforms) or f32 (the fenced entropy-
       parameter chain, where the kernel's cross-program bitwise
       reproducibility is the point)
    """
    n, h, width, c_in = x.shape
    k, k2, wc_in, c_out = w.shape
    assert k == k2 and wc_in == c_in, (x.shape, w.shape)
    p = k // 2
    out_dtype = out_dtype or compute_dtype
    has_res = residual is not None
    esize = jnp.dtype(compute_dtype).itemsize
    c_pad = _round_up(c_in, 128)
    w_in_pad = _round_up(width + 2 * p, 8)

    if h_tile is None:
        h_tile = _pick_h_tile(h, width, c_in, c_out, k, has_res, esize)
    assert h_tile is not None and h % h_tile == 0, (h, h_tile)

    x_pad = jnp.pad(x.astype(compute_dtype),
                    ((0, 0), (p, p), (p, w_in_pad - width - p),
                     (0, c_pad - c_in)))
    w_flat = jnp.pad(w.astype(compute_dtype),
                     ((0, 0), (0, 0), (0, c_pad - c_in), (0, 0))
                     ).reshape(k * k, c_pad, c_out)
    bias = (jnp.zeros((c_out,), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, c_out)
    neg_slope = {"leaky_relu": 0.01, None: None}[activation]

    grid = (n, h // h_tile)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),       # x_pad stays in HBM
        pl.BlockSpec(memory_space=pltpu.VMEM),   # weights resident
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
    ]
    operands = [x_pad, w_flat, bias]
    if has_res:
        in_specs.append(pl.BlockSpec(
            (1, h_tile, width, c_out),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ))
        operands.append(residual)

    kernel = functools.partial(
        _conv_kernel, k, h_tile, width, c_pad, c_out, neg_slope, has_res,
        out_dtype)
    hw = h_tile + k - 1
    flops = 2 * n * h * width * k * k * c_in * c_out
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, h_tile, width, c_out),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, width, c_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((hw, w_in_pad, c_pad), compute_dtype),
            pltpu.VMEM((k, hw, width, c_pad), compute_dtype),
            pltpu.VMEM((h_tile * width, c_out), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_pad.size * esize + w_flat.size * esize
            + n * h * width * c_out * esize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out
