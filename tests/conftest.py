"""Test configuration: force an 8-device virtual CPU mesh.

SURVEY.md §4: the reference has no test suite; our strategy is unit tests
for ops/models vs. naive numerics, multi-device sharding tests on a virtual
host-platform mesh, and serving tests with a sleep-based fake engine (the
reference's own accel-simulator pattern, accelInferenceEngine.py:58-64).

Note: this environment pre-imports jax at interpreter start (axon
sitecustomize), so JAX_PLATFORMS in os.environ is read before conftest
runs; we must go through jax.config instead. XLA_FLAGS is still read at
first backend init, which happens later.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
