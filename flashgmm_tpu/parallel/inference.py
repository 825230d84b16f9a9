"""Sharded high-resolution inference.

Spatial sharding is the image-compression analog of sequence parallelism
(SURVEY.md §2.3): for 2K+ inputs the conv transforms are sharded over the
H axis of a mesh; XLA inserts halo exchanges over ICI for the 3x3/5x5 conv
overlaps automatically from the shardings.
"""

import jax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_forward(model, mesh: Mesh, axis: str = "data"):
    """Jitted likelihood forward with the batch sharded over ``axis``."""
    graphdef, state = nnx.split(model)

    @jax.jit
    def forward(state, x):
        m = nnx.merge(graphdef, state)
        return m(x, training=False)

    def run(x):
        x = jax.device_put(x, NamedSharding(mesh, P(axis, None, None, None)))
        return forward(state, x)

    return run


def make_spatial_sharded_transform(model, mesh: Mesh, axis: str = "spatial"):
    """g_a sharded over image height (halo exchange via XLA collectives)."""
    graphdef, state = nnx.split(model)

    @jax.jit
    def g_a(state, x):
        m = nnx.merge(graphdef, state)
        return m.g_a(x)

    def run(x):
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
        return g_a(state, x)

    return run
