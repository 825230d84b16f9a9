"""Core tensor ops.

JAX equivalents of /root/reference/compressai/ops/ops.py (quantize_ste,
compute_padding). Tensors are NHWC throughout this framework (TPU-native
layout); padding helpers operate on the H/W axes accordingly.
"""

import jax
import jax.numpy as jnp


def quantize_ste(x):
    """Round with straight-through (identity) gradient.

    Reference: compressai/ops/ops.py:66-80.
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def compute_padding(in_h: int, in_w: int, *, out_h=None, out_w=None, min_div=1):
    """Returns (pad, unpad) tuples ``(left, right, top, bottom)`` matching the
    reference semantics (compressai/ops/ops.py:35-63).
    """
    if out_h is None:
        out_h = (in_h + min_div - 1) // min_div * min_div
    if out_w is None:
        out_w = (in_w + min_div - 1) // min_div * min_div

    if out_h % min_div != 0 or out_w % min_div != 0:
        raise ValueError(
            f"Padded output height and width are not divisible by min_div={min_div}."
        )

    left = (out_w - in_w) // 2
    right = out_w - in_w - left
    top = (out_h - in_h) // 2
    bottom = out_h - in_h - top

    pad = (left, right, top, bottom)
    unpad = (-left, -right, -top, -bottom)

    return pad, unpad


def pad_image(x, pad):
    """Replication-pad an NHWC image by ``(left, right, top, bottom)``."""
    left, right, top, bottom = pad
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="edge")


def unpad_image(x, unpad):
    """Undo :func:`pad_image` given the (negative) unpad tuple."""
    left, right, top, bottom = unpad
    h, w = x.shape[1], x.shape[2]
    return x[:, -top : h + bottom, -left : w + right, :]
