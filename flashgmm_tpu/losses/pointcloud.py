"""Point-cloud losses (compressai/losses/pointcloud/chamfer.py).

Chamfer distance over [B, N, 3] clouds via full pairwise distances
(batched matmul on MXU).
"""

import jax.numpy as jnp

from flashgmm_tpu.registry import register_criterion


def chamfer_distance(a, b):
    """Symmetric squared-L2 chamfer between [B, Na, 3] and [B, Nb, 3]."""
    # |a - b|^2 = |a|^2 + |b|^2 - 2 a.b
    aa = jnp.sum(a * a, axis=-1)  # [B, Na]
    bb = jnp.sum(b * b, axis=-1)  # [B, Nb]
    ab = jnp.einsum("bnc,bmc->bnm", a, b)
    d = aa[:, :, None] + bb[:, None, :] - 2 * ab  # [B, Na, Nb]
    d = jnp.maximum(d, 0.0)
    return jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1))


@register_criterion("ChamferPccRateDistortionLoss")
class ChamferPccRateDistortionLoss:
    """lambda * chamfer + bpp (per-point rate)."""

    def __init__(self, lmbda: float = 1.0):
        self.lmbda = lmbda

    def __call__(self, output, target):
        import math

        num_points = target.shape[0] * target.shape[1]
        bpp = sum(
            float(jnp.sum(jnp.log(lk))) / (-math.log(2) * num_points)
            if not hasattr(lk, "ndim") else
            jnp.sum(jnp.log(lk)) / (-math.log(2) * num_points)
            for lk in output["likelihoods"].values()
        )
        dist = chamfer_distance(output["x_hat"], target)
        return {
            "loss": self.lmbda * dist + bpp,
            "bpp_loss": bpp,
            "chamfer_loss": dist,
        }
