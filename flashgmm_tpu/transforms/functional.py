"""Color-space transforms (BT.601), NHWC.

Equivalent of compressai/transforms/functional.py:26-130.
"""

import jax
import jax.numpy as jnp

YCBCR_WEIGHTS = {"ITU-R_BT.601": (0.299, 0.587, 0.114)}


def rgb2ycbcr(rgb):
    """[..., 3] RGB in [0,1] -> YCbCr in [0,1] (BT.601 full-range)."""
    r, g, b = jnp.split(rgb, 3, axis=-1)
    kr, kg, kb = YCBCR_WEIGHTS["ITU-R_BT.601"]
    y = kr * r + kg * g + kb * b
    cb = 0.5 * (b - y) / (1 - kb) + 0.5
    cr = 0.5 * (r - y) / (1 - kr) + 0.5
    return jnp.concatenate([y, cb, cr], axis=-1)


def ycbcr2rgb(ycbcr):
    """[..., 3] YCbCr in [0,1] -> RGB in [0,1] (BT.601 full-range)."""
    y, cb, cr = jnp.split(ycbcr, 3, axis=-1)
    kr, kg, kb = YCBCR_WEIGHTS["ITU-R_BT.601"]
    r = y + (2 - 2 * kr) * (cr - 0.5)
    b = y + (2 - 2 * kb) * (cb - 0.5)
    g = (y - kr * r - kb * b) / kg
    return jnp.concatenate([r, g, b], axis=-1)


def yuv_444_to_420(yuv, mode: str = "avg_pool"):
    """[N, H, W, 3] -> (y [N,H,W,1], u [N,H/2,W/2,1], v [N,H/2,W/2,1])."""
    if mode not in ("avg_pool",):
        raise ValueError(f'Invalid downsampling mode "{mode}".')
    if isinstance(yuv, tuple):
        y, u, v = yuv
    else:
        y, u, v = jnp.split(yuv, 3, axis=-1)

    def down(x):
        n, h, w, c = x.shape
        return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

    return (y, down(u), down(v))


def yuv_420_to_444(yuv, mode: str = "bilinear", return_tuple: bool = False):
    """(y, u, v) planes -> [N, H, W, 3] (or tuple)."""
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f'Invalid upsampling mode "{mode}".')
    y, u, v = yuv

    def up(x):
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, h * 2, w * 2, c), method=mode)

    u, v = up(u), up(v)
    if return_tuple:
        return y, u, v
    return jnp.concatenate([y, u, v], axis=-1)
