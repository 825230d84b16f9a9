"""Rate-distortion loss.

Equivalent of compressai/losses/rate_distortion.py:40-74:
``loss = lambda * 255^2 * MSE + bpp`` with
``bpp = sum(-log2(likelihoods)) / num_pixels``.
"""

import math

import jax.numpy as jnp

from flashgmm_tpu.registry import register_criterion


def rate_distortion_loss(output, target, lmbda: float = 1e-2, metric: str = "mse"):
    """output: {"x_hat": [N,H,W,C], "likelihoods": {...}}; target: [N,H,W,C]."""
    n, h, w, _ = target.shape
    num_pixels = n * h * w

    bpp_loss = sum(
        jnp.sum(jnp.log(lk)) / (-math.log(2) * num_pixels)
        for lk in output["likelihoods"].values()
    )

    if metric == "mse":
        dist = jnp.mean((output["x_hat"] - target) ** 2)
        rd = lmbda * 255**2 * dist + bpp_loss
    elif metric == "ms-ssim":
        from flashgmm_tpu.utils.metrics import ms_ssim

        dist = 1 - ms_ssim(output["x_hat"], target)
        rd = lmbda * dist + bpp_loss
    else:
        raise NotImplementedError(f"{metric} loss not implemented")

    return {
        "loss": rd,
        "bpp_loss": bpp_loss,
        f"{metric}_loss": dist,
    }


@register_criterion("RateDistortionLoss")
class RateDistortionLoss:
    def __init__(self, lmbda: float = 1e-2, metric: str = "mse"):
        if metric not in ("mse", "ms-ssim"):
            raise NotImplementedError(f"{metric} loss not implemented")
        self.lmbda = lmbda
        self.metric = metric

    def __call__(self, output, target):
        return rate_distortion_loss(output, target, self.lmbda, self.metric)
