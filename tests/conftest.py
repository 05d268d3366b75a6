"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY §4 testing plan).

Note: this environment's sitecustomize pre-imports jax and registers the
remote axon TPU plugin with JAX_PLATFORMS=axon; without the override below
every tiny test op becomes a network round trip to the TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass
