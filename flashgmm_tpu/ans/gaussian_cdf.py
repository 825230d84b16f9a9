"""TPU-side probability math for the entropy coder.

The FlashGMM trick (rans_interface.cpp:95-292) evaluates approximate Gaussian
(mixture) CDFs on the fly instead of materializing per-symbol CDF tables. On
TPU we go one step further: a single fused XLA computation evaluates the
quantized (uint16) boundary CDFs for *all* symbols and *all* candidate bins
at once — thousands of lanes on the VPU versus the reference's 8 AVX2 lanes.
The host coder then only runs the serial integer rANS chain over the
precomputed rows (see csrc/rans.cpp).

``APPROX_MODE`` env var selects the approximation like the reference:
0 = Pólya (default), 1 = Abramowitz & Stegun, 2 = logistic.
"""

import functools
import os

import jax
import jax.numpy as jnp

MAX_CDF_VALUE = 65535.0
_INV_SQRT_2PI = 0.3989422804014327
_PI = 3.14159265358979323846


def get_approx_mode() -> int:
    try:
        mode = int(os.environ.get("APPROX_MODE", "0"))
    except ValueError:
        mode = 0
    return mode if mode in (0, 1, 2) else 0


def polya_cdf(x):
    """Phi(x) ~= 0.5*(1 + sign(x)*sqrt(1 - exp(-2x^2/pi)))."""
    x = x.astype(jnp.float32)
    e = jnp.exp((-2.0 / _PI) * (x * x))
    s = jnp.sqrt(jnp.maximum(1.0 - e, 0.0))
    return 0.5 * (1.0 + jnp.copysign(s, x))


def abramowitz_stegun_cdf(x):
    """A&S 26.2.17 five-term polynomial approximation."""
    x = x.astype(jnp.float32)
    p = 0.2316419
    b1, b2, b3, b4, b5 = 0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429
    abs_x = jnp.abs(x)
    z = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    t = 1.0 / (1.0 + p * abs_x)
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    res = 1.0 - z * poly
    return jnp.where(x >= 0, res, 1.0 - res)


def logistic_cdf(x):
    """Phi(x) ~= sigmoid(1.702 x)."""
    x = x.astype(jnp.float32)
    return jax.nn.sigmoid(1.702 * x)


_CDF_FNS = {0: polya_cdf, 1: abramowitz_stegun_cdf, 2: logistic_cdf}


def gaussian_cdf(x, mode: int = None):
    if mode is None:
        mode = get_approx_mode()
    return _CDF_FNS[mode](x)


@functools.partial(jax.jit, static_argnames=("num_bins", "mode"))
def gmm_boundary_rows(scales, means, weights, lo, num_bins: int, mode: int = 0):
    """Quantized boundary CDFs for every symbol under a K-mixture model.

    Args:
        scales/means/weights: float32 [N, K] per-symbol mixture parameters.
        lo: int32 scalar, integer value of the first bin.
        num_bins: static number of bins; rows have num_bins+1 boundaries.
        mode: CDF approximation mode.

    Returns:
        uint16 [N, num_bins + 1]: ``rows[i, j] = u16(cdf_i(lo + j - 0.5) * 65535)``
    """
    cdf_fn = _CDF_FNS[mode]
    # boundaries x_j = lo + j - 0.5, j = 0..num_bins
    j = jnp.arange(num_bins + 1, dtype=jnp.float32)
    x = (lo.astype(jnp.float32) - 0.5) + j  # [L]
    # [N, 1, K] params against [1, L, 1] boundaries -> [N, L, K]
    z = (x[None, :, None] - means[:, None, :]) / scales[:, None, :]
    cdf = jnp.sum(weights[:, None, :] * cdf_fn(z), axis=-1)  # [N, L]
    q = (cdf * MAX_CDF_VALUE).astype(jnp.uint16)
    return q


def _mixture_cdf(x, scales, means, weights, mode: int):
    """Sum_k w_k Phi((x - mu_k)/sigma_k) with a FIXED sequential K-add chain.

    The interleaved fast path quantizes this float in two separately-compiled
    programs (encoder bounds vs decoder rows); an explicit unrolled
    accumulation keeps the op graphs identical so XLA produces bit-equal
    results on both sides.
    """
    cdf_fn = _CDF_FNS[mode]
    k_total = scales.shape[-1]
    acc = None
    for k in range(k_total):
        term = weights[..., k:k + 1] * cdf_fn(
            (x - means[..., k:k + 1]) / scales[..., k:k + 1]
        )
        acc = term if acc is None else acc + term
    return acc


@functools.partial(jax.jit, static_argnames=("num_bins", "mode"))
def gmm_guarded_rows(scales, means, weights, lo, num_bins: int, mode: int = 0):
    """Strictly-monotone int32 boundary rows for the interleaved coder.

    ``rows[i, j] = floor(cdf_i(lo + j - 0.5) * (2^16 - (num_bins+1))) + j``
    with the last boundary forced to 2^16: every bin has pmf >= 1, so no
    bypass escape is ever needed (rate cost ~(num_bins+1)/2^16).

    The encoder and decoder quantize this float CDF in separately-compiled
    XLA programs; ``optimization_barrier`` fences isolate the computation
    from surrounding fusion so both programs compile the identical subgraph
    and produce bit-equal integers (a fused exp that rounds differently on
    one side would silently desynchronize the rANS state).

    Args: scales/means/weights float32 [N, K]; returns int32 [N, num_bins+1].
    """
    L = num_bins + 1
    scales, means, weights, lo = jax.lax.optimization_barrier(
        (scales, means, weights, lo)
    )
    j = jnp.arange(L, dtype=jnp.float32)
    x = (lo.astype(jnp.float32) - 0.5) + j  # [L]
    # x broadcast over symbols: [N, L, 1] against [N, 1, K] params
    cdf = _mixture_cdf(
        jnp.broadcast_to(x[None, :, None], (scales.shape[0], L, 1)),
        scales[:, None, :],
        means[:, None, :],
        weights[:, None, :],
        mode,
    )[..., 0]
    raw = jnp.floor(jnp.clip(cdf, 0.0, 1.0) * (65536 - L)).astype(jnp.int32)
    rows = raw + jnp.arange(L, dtype=jnp.int32)[None, :]
    rows = rows.at[:, -1].set(65536)
    return jax.lax.optimization_barrier(rows)


@functools.partial(jax.jit, static_argnames=("num_bins", "mode"))
def gmm_guarded_bounds(values, scales, means, weights, lo, num_bins: int,
                       mode: int = 0):
    """(start, freq) uint32 [N] for the encoder — the two boundary CDFs of
    each symbol's bin, quantized exactly as :func:`gmm_guarded_rows`."""
    L = num_bins + 1
    vf = values.astype(jnp.float32)
    j = (values - lo).astype(jnp.int32)

    def q(x_scalar):
        cdf = _mixture_cdf(x_scalar[:, None], scales, means, weights, mode)[..., 0]
        return jnp.floor(jnp.clip(cdf, 0.0, 1.0) * (65536 - L)).astype(jnp.int32)

    raw1 = q(vf - 0.5)
    raw2 = q(vf + 0.5)
    start = raw1 + j
    nxt = jnp.where(j + 1 == L - 1, 65536, raw2 + j + 1)
    freq = nxt - start
    return start.astype(jnp.uint32), freq.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("num_bins", "mode"))
def gaussian_boundary_rows(scales, lo, num_bins: int, mode: int = 0):
    """Single-Gaussian (zero-mean) boundary rows: the GSM search-based path
    (rans_interface.cpp:401-456)."""
    cdf_fn = _CDF_FNS[mode]
    j = jnp.arange(num_bins + 1, dtype=jnp.float32)
    x = (lo.astype(jnp.float32) - 0.5) + j
    z = x[None, :] / scales[:, None]
    cdf = cdf_fn(z)
    return (cdf * MAX_CDF_VALUE).astype(jnp.uint16)
