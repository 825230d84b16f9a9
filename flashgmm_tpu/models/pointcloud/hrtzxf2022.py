"""hrtzxf2022-style point-cloud reconstruction compression
(cf. compressai/models/pointcloud/hrtzxf2022.py, "Density-preserving Deep
Point Cloud Compression" / PCC-GAN reconstruction family).

Self-contained re-design: multi-scale PointNet encoder -> EB-coded latent
-> folding-based decoder (a learned deformation of a 2D grid conditioned
on the latent), trained with the Chamfer RD loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.layers.pointcloud import PointNetSetMLP, SharedMLP
from flashgmm_tpu.registry import register_model

from ..base import CompressionModel


class FoldingDecoder(nnx.Module):
    """FoldingNet-style decoder: deform a fixed 2D grid into 3D, twice."""

    def __init__(self, latent_dim, num_points, *, rngs):
        self.num_points = num_points
        side = int(np.ceil(np.sqrt(num_points)))
        u, v = np.meshgrid(
            np.linspace(0, 1, side), np.linspace(0, 1, side)
        )
        grid = np.stack([u.ravel(), v.ravel()], axis=-1)[:num_points]
        self.grid = nnx.Variable(jnp.asarray(grid.astype(np.float32)))
        self.fold1 = SharedMLP([latent_dim + 2, 256, 128, 3], final_act=False,
                               rngs=rngs)
        self.fold2 = SharedMLP([latent_dim + 3, 256, 128, 3], final_act=False,
                               rngs=rngs)

    def __call__(self, latent):
        b = latent.shape[0]
        grid = jnp.broadcast_to(self.grid.value[None], (b, self.num_points, 2))
        lat = jnp.broadcast_to(
            latent[:, None, :], (b, self.num_points, latent.shape[-1])
        )
        p1 = self.fold1(jnp.concatenate([lat, grid], axis=-1))
        p2 = self.fold2(jnp.concatenate([lat, p1], axis=-1))
        return p2


@register_model("hrtzxf2022-pcc-rec")
class Hrtzxf2022PccModel(CompressionModel):
    def __init__(self, num_points: int = 1024, latent_dim: int = 512,
                 *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.num_points = int(num_points)
        self.latent_dim = int(latent_dim)
        self.g_a = PointNetSetMLP(
            [3, 64, 128, 256, latent_dim], rngs=rngs
        )
        self.g_s = FoldingDecoder(latent_dim, num_points, rngs=rngs)
        self.entropy_bottleneck = EntropyBottleneck(latent_dim, rngs=rngs)

    def _bottleneck(self, y, training, key):
        y4 = y[:, None, None, :]
        y_hat, lk = self.entropy_bottleneck(y4, training=training, key=key)
        return y_hat[:, 0, 0, :], lk

    def __call__(self, points, training: bool = True, key=None):
        y = self.g_a(points)
        y_hat, y_likelihoods = self._bottleneck(y, training, key)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def compress(self, points):
        y = self.g_a(points)
        strings = self.entropy_bottleneck.compress(y[:, None, None, :])
        return {"strings": [strings], "shape": (1, 1)}

    def decompress(self, strings, shape):
        y_hat = self.entropy_bottleneck.decompress(strings[0], shape)[:, 0, 0, :]
        return {"x_hat": self.g_s(y_hat)}
