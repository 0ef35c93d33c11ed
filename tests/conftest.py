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


@pytest.fixture(autouse=True)
def _hermetic_routing(monkeypatch, tmp_path):
    """Deterministic engine routing for every test: calibration OFF
    (static tables only) and the autotune cache pointed at a per-test
    tmpdir, so no test can depend on — or pollute — the user's real
    ``~/.cache/proxmin_tpu/routing.json``. Without this, any routing
    test whose shape sits in the calibration gray zone (e.g. C=64)
    sees probe solves on a cold cache and a single solve on a warm
    one — pass/fail depending on prior machine state.
    ``test_calibrate.py`` re-enables probing via its own autouse
    fixture (module fixtures run after this one)."""
    from proxmin_tpu import calibrate

    monkeypatch.setenv("PROXMIN_TPU_AUTOTUNE_CACHE",
                       str(tmp_path / "routing.json"))
    prev = calibrate.set_auto_calibration("off")
    calibrate._CACHE.clear()
    calibrate._DISK = {}
    calibrate._DISK_LOADED = False
    yield
    calibrate.set_auto_calibration(prev)
    calibrate._CACHE.clear()
    calibrate._DISK = {}
    calibrate._DISK_LOADED = False
