"""PointNet++-style hierarchical point-cloud compression
(cf. compressai/models/pointcloud/sfu.py "sfu-pcc-rec-pointnet2").

Set-abstraction levels: farthest-point sampling + radius grouping + shared
MLP + local max-pool, implemented with dense pairwise distances (batched
matmuls on MXU) instead of the reference's pointops CUDA kernels.
"""

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.layers.pointcloud import SharedMLP, farthest_point_sample
from flashgmm_tpu.registry import register_model

from ..base import CompressionModel


def ball_group(points, centers, radius: float, k: int):
    """For each center, gather <=k neighbors within radius (dense distances).

    points: [B, N, 3], centers: [B, S, 3] -> [B, S, k, 3] relative coords.
    """
    d2 = (
        jnp.sum(centers**2, -1)[:, :, None]
        + jnp.sum(points**2, -1)[:, None, :]
        - 2 * jnp.einsum("bsc,bnc->bsn", centers, points)
    )  # [B, S, N]
    d2 = jnp.where(d2 <= radius**2, d2, jnp.inf)
    # top-k nearest inside the ball (inf for outside -> clamped to center)
    idx = jnp.argsort(d2, axis=-1)[..., :k]  # [B, S, k]
    valid = jnp.take_along_axis(d2, idx, axis=-1) < jnp.inf
    gathered = jnp.take_along_axis(
        points[:, None], idx[..., None].repeat(3, -1), axis=2
    )  # [B, S, k, 3]
    rel = gathered - centers[:, :, None, :]
    return jnp.where(valid[..., None], rel, 0.0)


class SetAbstraction(nnx.Module):
    def __init__(self, num_centers, radius, k, dims, *, rngs):
        self.num_centers = num_centers
        self.radius = radius
        self.k = k
        self.mlp = SharedMLP(dims, rngs=rngs)

    def __call__(self, points, feats=None):
        idx = farthest_point_sample(points, self.num_centers)  # [B, S]
        centers = jnp.take_along_axis(
            points, idx[..., None].repeat(3, -1), axis=1
        )
        rel = ball_group(points, centers, self.radius, self.k)  # [B,S,k,3]
        if feats is not None:
            # gather neighbor features alongside coordinates
            d2 = (
                jnp.sum(centers**2, -1)[:, :, None]
                + jnp.sum(points**2, -1)[:, None, :]
                - 2 * jnp.einsum("bsc,bnc->bsn", centers, points)
            )
            nidx = jnp.argsort(d2, axis=-1)[..., : self.k]
            f = jnp.take_along_axis(
                feats[:, None], nidx[..., None].repeat(feats.shape[-1], -1), axis=2
            )
            rel = jnp.concatenate([rel, f], axis=-1)
        b, s, k, c = rel.shape
        out = self.mlp(rel.reshape(b, s * k, c)).reshape(b, s, k, -1)
        return centers, jnp.max(out, axis=2)  # [B, S, F]


@register_model("sfu-pcc-rec-pointnet2")
class PointNet2ReconstructionPccModel(CompressionModel):
    def __init__(self, num_points: int = 1024, latent_dim: int = 512,
                 *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.num_points = int(num_points)
        self.latent_dim = int(latent_dim)

        self.sa1 = SetAbstraction(256, 0.2, 16, [3, 64, 64], rngs=rngs)
        self.sa2 = SetAbstraction(64, 0.4, 16, [3 + 64, 128, 128], rngs=rngs)
        self.global_mlp = SharedMLP([3 + 128, 256, latent_dim], rngs=rngs)
        self.g_s = SharedMLP(
            [latent_dim, 512, 1024, num_points * 3], final_act=False, rngs=rngs
        )
        self.entropy_bottleneck = EntropyBottleneck(latent_dim, rngs=rngs)

    def _encode_latent(self, points):
        c1, f1 = self.sa1(points)
        c2, f2 = self.sa2(c1, f1)
        g = jnp.concatenate([c2, f2], axis=-1)
        return jnp.max(self.global_mlp(g), axis=1)  # [B, latent]

    def _bottleneck(self, y, training, key):
        y4 = y[:, None, None, :]
        y_hat, lk = self.entropy_bottleneck(y4, training=training, key=key)
        return y_hat[:, 0, 0, :], lk

    def __call__(self, points, training: bool = True, key=None):
        y = self._encode_latent(points)
        y_hat, y_likelihoods = self._bottleneck(y, training, key)
        x_hat = self.g_s(y_hat[:, None, :])[:, 0].reshape(
            points.shape[0], self.num_points, 3
        )
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def compress(self, points):
        y = self._encode_latent(points)
        strings = self.entropy_bottleneck.compress(y[:, None, None, :])
        return {"strings": [strings], "shape": (1, 1)}

    def decompress(self, strings, shape):
        y_hat = self.entropy_bottleneck.decompress(strings[0], shape)[:, 0, 0, :]
        x_hat = self.g_s(y_hat[:, None, :])[:, 0].reshape(-1, self.num_points, 3)
        return {"x_hat": x_hat}
