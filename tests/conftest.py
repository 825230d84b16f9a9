"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware.

The environment's sitecustomize eagerly registers the axon TPU backend, so
setting JAX_PLATFORMS alone is not enough — override via jax.config before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
