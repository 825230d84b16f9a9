"""Device mesh + sharding helpers.

The reference has no real distributed support (vestigial nn.DataParallel,
SURVEY.md §2.3); here multi-chip scaling is native: a ``Mesh`` with a
``data`` axis for batch parallelism and a ``spatial`` axis for sharding
high-resolution images across chips (halo exchanges ride ICI via XLA
collectives inserted from the shardings).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, data: int = None, spatial: int = 1):
    """Create a ("data", "spatial") mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise RuntimeError(
            f"make_mesh: requested {n_devices} devices but backend "
            f"'{jax.default_backend()}' exposes only {len(devices)}. "
            "For CPU emulation set JAX_PLATFORMS=cpu and "
            "XLA_FLAGS=--xla_force_host_platform_device_count=<n> before "
            "jax initializes (see tests/conftest.py)."
        )
    if data is None:
        data = n_devices // spatial
    assert data * spatial == n_devices, (data, spatial, n_devices)
    dev_array = np.asarray(devices[:n_devices]).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def shard_batch(mesh: Mesh, batch):
    """Shard an NHWC batch over the data axis (and H over spatial)."""
    sharding = NamedSharding(mesh, P("data", "spatial", None, None))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
