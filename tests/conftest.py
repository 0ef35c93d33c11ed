"""Test configuration: 8-device virtual CPU mesh + float64 for parity.

This environment boots JAX with the axon TPU platform pre-registered (a
sitecustomize imports jax before any user code, so plain ``JAX_PLATFORMS``
env handling is already done). The registration leaves
``jax_platforms="axon,cpu"``, so we flip the selection to the local CPU
backend via config — that gives true float64 (the TPU emulates f64 at
~48-bit precision) and fast local compiles, and lets
``--xla_force_host_platform_device_count=8`` provide the standard 8-device
virtual mesh for pjit/psum sharding tests without a TPU pod.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(101)
