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


def video_rate_distortion_loss(output, frames, lmbda: float = 1e-2):
    """Multi-frame RD loss for video models (ssf2020).

    Equivalent of the reference's video RateDistortionLoss
    (examples/train_video.py:73-190): distortion = mean over frames of
    scaled MSE; rate = total bits of every per-frame likelihood tensor
    per frame-pixel. ``output`` is the ScaleSpaceFlow forward dict
    ({"x_hat": [frame, ...], "likelihoods": [tree, ...]}), ``frames`` the
    matching list/tuple of [N, H, W, 3] targets.
    """
    import jax

    n, h, w, _ = frames[0].shape
    num_pixels = n * h * w

    bpp_loss = sum(
        jnp.sum(jnp.log(lk)) / (-math.log(2) * num_pixels)
        for frame_lk in output["likelihoods"]
        for lk in jax.tree.leaves(frame_lk)
    )
    mse_loss = sum(
        jnp.mean((x_hat - x) ** 2)
        for x_hat, x in zip(output["x_hat"], frames)
    ) / len(frames)
    return {
        "loss": lmbda * 255**2 * mse_loss + bpp_loss,
        "bpp_loss": bpp_loss,
        "mse_loss": mse_loss,
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
