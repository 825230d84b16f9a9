"""PointNet++ set-abstraction layers (Qi et al. 2017), TPU-native re-design
of compressai/layers/pointcloud/pointnet2.py:66-333.

The reference's pointops CUDA kernels (furthestsampling, ballquery) become
XLA-native dense ops: FPS is a lax.scan (see pointnet.py), ball query is a
masked pairwise-distance sort. Channels-last [b, n, c] layout.
"""

import jax
import jax.numpy as jnp
from flax import nnx

from .hrtzxf2022 import index_points
from .pointnet import farthest_point_sample

__all__ = [
    "query_ball_point",
    "sample_and_group",
    "sample_and_group_all",
    "PointNetSetAbstraction",
]


def square_distance(src, dst):
    """Pairwise squared L2: [b, n, 3] x [b, m, 3] -> [b, n, m]."""
    return (
        jnp.sum(src**2, -1)[..., None]
        - 2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
        + jnp.sum(dst**2, -1)[:, None, :]
    )


def query_ball_point(radius, nsample, xyz, new_xyz):
    """Indices of up to ``nsample`` points of ``xyz`` within ``radius`` of
    each query in ``new_xyz`` (reference pointnet2.py:183-227): points
    outside the ball are replaced by the first in-ball point, so groups
    always have exactly nsample (possibly repeated) members."""
    b, s, _ = new_xyz.shape
    d2 = square_distance(new_xyz, xyz)  # [b, s, n]
    n = xyz.shape[1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, None], d2.shape)
    idx = jnp.where(d2 > radius**2, n, idx)
    idx = jnp.sort(idx, axis=-1)[..., :nsample]  # in-ball first (orig order)
    first = jnp.broadcast_to(idx[..., :1], idx.shape)
    return jnp.where(idx == n, first, idx).clip(0, n - 1)


def sample_and_group(npoint, radius, nsample, xyz, points=None,
                     returnfps=False):
    """FPS centroids + ball-query grouping; grouped coords are centered on
    their centroid (reference pointnet2.py:229-261).

    xyz [b, n, 3], points [b, n, d] -> new_xyz [b, npoint, 3],
    new_points [b, npoint, nsample, 3(+d)]
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # [b, npoint, nsample, 3]
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], -1)
    else:
        new_points = grouped_xyz_norm
    if returnfps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz, points=None, returnfps=False):
    """Single group covering the whole cloud (reference :262-285)."""
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]  # [b, 1, n, 3]
    if points is not None:
        new_points = jnp.concatenate([grouped_xyz, points[:, None]], -1)
    else:
        new_points = grouped_xyz
    if returnfps:
        return new_xyz, new_points, grouped_xyz, None
    return new_xyz, new_points


class PointNetSetAbstraction(nnx.Module):
    """SA level: sample + group + shared MLP + local max-pool (reference
    pointnet2.py:286-333). BatchNorm is replaced by GroupNorm (batch-
    statistics-free: jit/vmap-friendly and stable for batch=1 coding)."""

    def __init__(self, npoint, radius, nsample, in_channel, mlp,
                 group_all=False, *, rngs: nnx.Rngs):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.group_all = group_all
        layers = []
        last = in_channel
        for out in mlp:
            layers.append((nnx.Linear(last, out, rngs=rngs),
                           nnx.GroupNorm(out, num_groups=1, rngs=rngs)))
            last = out
        self.linears = nnx.List([l for l, _ in layers])
        self.norms = nnx.List([n for _, n in layers])

    def __call__(self, xyz, points=None):
        """xyz [b, n, 3], points [b, n, d] ->
        (new_xyz [b, s, 3], new_points [b, s, c_out])"""
        if self.group_all:
            new_xyz, new_points = sample_and_group_all(xyz, points)
        else:
            new_xyz, new_points = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points
            )
        h = new_points  # [b, s, k, c]
        for lin, norm in zip(self.linears, self.norms):
            h = jax.nn.relu(norm(lin(h)))
        return new_xyz, jnp.max(h, axis=2)
