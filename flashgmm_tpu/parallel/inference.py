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


def make_spatial_sharded_forward(model, mesh: Mesh, axis: str = "spatial"):
    """FULL likelihood forward with the image sharded over height.

    Unlike :func:`make_spatial_sharded_transform` (g_a only) this runs the
    whole model — analysis, hyper branch, context prediction, entropy
    models, synthesis — with the H axis of every activation sharded over
    ``axis``; XLA inserts the halo exchanges for the conv overlaps and any
    collectives the entropy models need. This is the 2K+ single-image
    inference path (SURVEY.md §2.3: spatial sharding as the image analog
    of sequence parallelism).
    """
    graphdef, state = nnx.split(model)

    @jax.jit
    def forward(state, x):
        m = nnx.merge(graphdef, state)
        return m(x, training=False)

    def run(x):
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
        return forward(state, x)

    return run
