"""PointNet-based point-cloud compression
(cf. compressai/models/pointcloud/sfu.py "sfu-pcc-rec-pointnet").

Encoder: shared per-point MLP + global max-pool -> latent vector;
EntropyBottleneck codes the latent; decoder MLP emits N x 3 points.
Trained with the Chamfer RD loss (flashgmm_tpu/losses/pointcloud.py).

The reference's torch-geometric/pointops dependencies are unavailable in
this environment; this is a self-contained re-design of the same model
family (the reference itself ships no pretrained PCC weights,
zoo/__init__.py:56-61).
"""

import jax
import jax.numpy as jnp
from flax import nnx

from flashgmm_tpu.entropy_models import EntropyBottleneck
from flashgmm_tpu.layers.pointcloud import PointNetSetMLP, SharedMLP
from flashgmm_tpu.registry import register_model

from ..base import CompressionModel


@register_model("sfu-pcc-rec-pointnet")
class PointNetReconstructionPccModel(CompressionModel):
    def __init__(self, num_points: int = 1024, latent_dim: int = 512,
                 *, rngs: nnx.Rngs = None, **kwargs):
        rngs = rngs or nnx.Rngs(0)
        self.num_points = int(num_points)
        self.latent_dim = int(latent_dim)

        self.g_a = PointNetSetMLP([3, 64, 64, 128, 256, latent_dim], rngs=rngs)
        self.g_s = SharedMLP(
            [latent_dim, 512, 1024, num_points * 3], final_act=False, rngs=rngs
        )
        self.entropy_bottleneck = EntropyBottleneck(latent_dim, rngs=rngs)

    def _bottleneck(self, y, training, key):
        # EB operates on NHWC; treat the latent as [B, 1, 1, C]
        y4 = y[:, None, None, :]
        y_hat, lk = self.entropy_bottleneck(y4, training=training, key=key)
        return y_hat[:, 0, 0, :], lk

    def __call__(self, points, training: bool = True, key=None):
        """points: [B, N, 3] in [0, 1]."""
        y = self.g_a(points)
        y_hat, y_likelihoods = self._bottleneck(y, training, key)
        x_hat = self.g_s(y_hat[:, None, :])[:, 0].reshape(
            points.shape[0], self.num_points, 3
        )
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def compress(self, points):
        y = self.g_a(points)
        strings = self.entropy_bottleneck.compress(y[:, None, None, :])
        return {"strings": [strings], "shape": (1, 1)}

    def decompress(self, strings, shape):
        y_hat = self.entropy_bottleneck.decompress(strings[0], shape)[:, 0, 0, :]
        x_hat = self.g_s(y_hat[:, None, :])[:, 0].reshape(
            -1, self.num_points, 3
        )
        return {"x_hat": x_hat}
