"""Point-cloud building blocks (cf. compressai/layers/pointcloud/*).

Pure-JAX PointNet primitives: shared per-point MLPs are plain matmuls over
[B, N, C] (MXU-friendly), global aggregation is a max over points. The
reference depends on torch-geometric/pointops (unavailable here); these
blocks are self-contained re-designs covering the same model family.
"""

import jax
import jax.numpy as jnp
from flax import nnx


class SharedMLP(nnx.Module):
    """Per-point MLP: [B, N, Cin] -> [B, N, Cout] with ReLU between layers."""

    def __init__(self, dims, final_act: bool = True, *, rngs: nnx.Rngs):
        self.linears = nnx.List(
            [nnx.Linear(i, o, rngs=rngs) for i, o in zip(dims[:-1], dims[1:])]
        )
        self.final_act = final_act

    def __call__(self, x):
        n = len(self.linears)
        for i, lin in enumerate(self.linears):
            x = lin(x)
            if i < n - 1 or self.final_act:
                x = jax.nn.relu(x)
        return x


class PointNetSetMLP(nnx.Module):
    """Shared MLP + global max-pool: [B, N, C] -> [B, F]."""

    def __init__(self, dims, *, rngs: nnx.Rngs):
        self.mlp = SharedMLP(dims, rngs=rngs)

    def __call__(self, x):
        return jnp.max(self.mlp(x), axis=1)


def farthest_point_sample(points, num_samples: int):
    """Deterministic farthest-point sampling, [B, N, 3] -> indices [B, S]."""

    def sample_one(pts):
        n = pts.shape[0]

        def body(carry, _):
            dists, last_idx = carry
            last = pts[last_idx]
            d = jnp.sum((pts - last) ** 2, axis=-1)
            dists = jnp.minimum(dists, d)
            nxt = jnp.argmax(dists)
            return (dists, nxt), nxt

        init = (jnp.full((n,), jnp.inf), jnp.int32(0))
        _, idx = jax.lax.scan(body, init, None, length=num_samples - 1)
        return jnp.concatenate([jnp.zeros((1,), jnp.int32), idx])

    return jax.vmap(sample_one)(points)
