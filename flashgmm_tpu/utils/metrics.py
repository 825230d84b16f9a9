"""Image quality metrics (PSNR, SSIM, MS-SSIM) in JAX, NHWC."""

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 20 * jnp.log10(max_val) - 10 * jnp.log10(mse)


def _fspecial_gauss(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = np.outer(g, g)
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _ssim_components(a, b, max_val=1.0, k1=0.01, k2=0.03):
    """Returns (luminance-contrast-structure map, contrast-structure map)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    win = _fspecial_gauss()[:, :, None, None]
    c = a.shape[-1]
    kernel = jnp.tile(win, (1, 1, 1, c))

    def filt(x):
        # Precision.HIGHEST is load-bearing: the TPU default routes this
        # 11x11 window conv through the MXU in bf16, and the variance terms
        # below (filt(a*a) - mu^2) catastrophically cancel — that silently
        # shipped a 0.985 -> 0.825 "MS-SSIM regression" in round 2 while
        # PSNR (elementwise, f32) stayed correct.  CPU was always f32.
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab

    cs = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    ssim = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return ssim.mean(), cs.mean()


def ssim(a, b, max_val: float = 1.0):
    s, _ = _ssim_components(a, b, max_val)
    return s


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(a, b, max_val: float = 1.0):
    """Multi-scale SSIM (Wang et al. 2003), up to 5 scales (fewer for small
    images — each scale needs at least the 11x11 window; weights are
    renormalized)."""
    min_dim = min(a.shape[1], a.shape[2])
    levels = len(_MSSSIM_WEIGHTS)
    while levels > 1 and (min_dim >> (levels - 1)) < 11:
        levels -= 1
    vals = []
    for i in range(levels):
        s, cs = _ssim_components(a, b, max_val)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            # standard 2x2 average-pool downsampling
            n, h, w, c = a.shape
            h2, w2 = (h // 2) * 2, (w // 2) * 2
            a = a[:, :h2, :w2].reshape(n, h // 2, 2, w // 2, 2, c).mean((2, 4))
            b = b[:, :h2, :w2].reshape(n, h // 2, 2, w // 2, 2, c).mean((2, 4))
    vals = jnp.stack(vals)
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum() if levels < len(_MSSSIM_WEIGHTS) else weights
    return jnp.prod(jnp.clip(vals, 1e-6) ** weights)
