"""Test configuration: force an 8-device CPU backend so collective /
sharding tests run without TPU hardware (standard JAX fake-backend trick).

The interpreter in this environment comes pre-warmed with jax already
imported, so env vars alone are too late — use jax.config.update, which works
as long as no backend has been initialized yet (conftest runs first).
"""
import os

import jax
import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_collection_modifyitems(items):
    """Everything not marked slow is quick, so both `-m quick` (inner loop)
    and `-m slow` (CI cadence) select a complete partition of the suite."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
