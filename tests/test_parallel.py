"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from flashgmm_tpu.models import FactorizedPrior
from flashgmm_tpu.parallel import make_mesh, make_train_state
from flashgmm_tpu.parallel.inference import (
    make_sharded_forward,
    make_spatial_sharded_transform,
)
from flashgmm_tpu.parallel.train import data_parallel_train_step


@pytest.fixture(scope="module")
def model():
    return FactorizedPrior(16, 24, rngs=nnx.Rngs(0))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestDataParallel:
    def test_train_step_on_mesh(self, model):
        mesh = make_mesh(8)
        opt_net, opt_aux = make_train_state(model)
        x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32))
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
        out = data_parallel_train_step(model, opt_net, opt_aux, x, jax.random.key(0))
        assert np.isfinite(float(out["loss"]))

    def test_sharded_forward_matches_single(self, model):
        mesh = make_mesh(8)
        run = make_sharded_forward(model, mesh)
        x = jnp.asarray(np.random.RandomState(1).rand(8, 32, 32, 3).astype(np.float32))
        out_sharded = run(x)
        out_single = model(x, training=False)
        np.testing.assert_allclose(
            np.asarray(out_sharded["x_hat"]), np.asarray(out_single["x_hat"]),
            atol=1e-5,
        )


class TestSpatialSharding:
    def test_spatial_g_a_matches_single(self, model):
        """Height-sharded conv transform must equal the unsharded result
        (XLA inserts the halo exchanges)."""
        mesh = make_mesh(8, data=1, spatial=8)
        run = make_spatial_sharded_transform(model, mesh)
        x = jnp.asarray(
            np.random.RandomState(2).rand(1, 256, 64, 3).astype(np.float32)
        )
        y_sharded = run(x)
        y_single = model.g_a(x)
        np.testing.assert_allclose(
            np.asarray(y_sharded), np.asarray(y_single), atol=1e-5
        )
