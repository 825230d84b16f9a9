"""Point-cloud losses (compressai/losses/pointcloud/{chamfer,hrtzxf2022}.py).

Chamfer distance over [B, N, 3] clouds via full pairwise distances
(batched matmul on MXU), plus the density-preserving RD loss of He2022
(reference losses/pointcloud/hrtzxf2022.py:45-197).
"""

import math

import jax.numpy as jnp

from flashgmm_tpu.registry import register_criterion


def _pairwise_sqdist(a, b):
    aa = jnp.sum(a * a, axis=-1)  # [B, Na]
    bb = jnp.sum(b * b, axis=-1)  # [B, Nb]
    ab = jnp.einsum("bnc,bmc->bnm", a, b)
    return jnp.maximum(aa[:, :, None] + bb[:, None, :] - 2 * ab, 0.0)


def chamfer_distance(a, b):
    """Symmetric squared-L2 chamfer between [B, Na, 3] and [B, Nb, 3]."""
    d = _pairwise_sqdist(a, b)
    return jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1))


def chamfer_with_index(a, b):
    """(chamfer, idx2) where idx2 [B, Nb] is each b-point's nearest a-point
    (the reference's ``nearest_gt_idx``)."""
    d = _pairwise_sqdist(a, b)
    ch = jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1))
    return ch, jnp.argmin(d, axis=1)


@register_criterion("RateDistortionLoss_hrtzxf2022")
class RateDistortionLossHrtzxf2022:
    """Density-preserving PCC RD loss (He2022; reference
    losses/pointcloud/hrtzxf2022.py:45-142): multi-scale chamfer +
    density (mean-distance & upsample-count) + point-count + latent-xyz
    + rate terms."""

    LMBDA_DEFAULT = {
        "bpp": 1.0,
        "chamfer": 1e4,
        "chamfer_layers": (1.0, 0.1, 0.1),
        "latent_xyzs": 1e2,
        "mean_distance": 5e1,
        "pts_num": 5e-3,
        "upsample_num": 1.0,
    }

    def __init__(self, lmbda=None, latent_xyzs_codec_mode="learned"):
        self.lmbda = dict(self.LMBDA_DEFAULT)
        if lmbda:
            self.lmbda.update(lmbda)
        self.latent_xyzs_codec_mode = latent_xyzs_codec_mode

    def __call__(self, output, target):
        if isinstance(target, dict):
            target = target["pos"]
        b, n_pts, _ = target.shape
        out = {}

        gt_xyzs_ = output["gt_xyz_"]
        xyzs_hat_ = output["xyz_hat_"]
        num_layers = len(gt_xyzs_)
        chamfer_, idx_ = [], []
        for i in range(num_layers):
            ch, idx2 = chamfer_with_index(
                gt_xyzs_[i], xyzs_hat_[num_layers - i - 1]
            )
            chamfer_.append(ch)
            idx_.append(idx2)
        out["chamfer_loss"] = sum(
            w * c for w, c in zip(self.lmbda["chamfer_layers"], chamfer_)
        )
        out["rec_loss"] = chamfer_[0]

        # density losses: compare predicted per-point (unum, mdis) with the
        # ground truth of the matching encoder level, gathered at each
        # reconstructed point's nearest GT point
        mdis_terms, unum_terms = [], []
        for i in range(num_layers):
            if i == num_layers - 1:
                mdis_i = output["gt_mean_distance_"][i]
                dnum_i = output["gt_downsample_num_"][i]
            else:
                idx2 = idx_[i + 1]
                mdis_i = jnp.take_along_axis(
                    output["gt_mean_distance_"][i], idx2, axis=1
                )
                dnum_i = jnp.take_along_axis(
                    output["gt_downsample_num_"][i], idx2, axis=1
                )
            j = num_layers - i - 1
            mdis_terms.append(
                jnp.mean(jnp.abs(output["mean_distance_hat_"][j] - mdis_i))
            )
            unum_terms.append(
                jnp.mean(jnp.abs(output["upsample_num_hat_"][j] - dnum_i))
            )
        out["mean_distance_loss"] = sum(mdis_terms)
        out["upsample_num_loss"] = sum(unum_terms)

        out["pts_num_loss"] = sum(
            jnp.abs(
                jnp.sum(output["upsample_num_hat_"][num_layers - i - 1])
                - gt_xyzs_[i].shape[1] * b
            )
            for i in range(num_layers)
        )

        if self.latent_xyzs_codec_mode == "learned":
            out["latent_xyzs_loss"] = jnp.mean(
                (output["gt_latent_xyz"] - output["latent_xyz_hat"]) ** 2
            )
        else:
            out["latent_xyzs_loss"] = jnp.asarray(0.0)

        out["bpp_loss"] = sum(
            jnp.sum(jnp.log(lk)) / (-math.log(2) * b * n_pts)
            for lk in output["likelihoods"].values()
        )

        out["loss"] = sum(
            self.lmbda[k] * out[f"{k}_loss"]
            for k in self.lmbda
            if f"{k}_loss" in out
        )
        return out


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
