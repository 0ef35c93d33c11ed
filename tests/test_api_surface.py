"""API-surface parity: every public symbol of the reference package must
exist in proxmin_tpu under the same module path, plus the reference's flat
top-level re-exports (``__init__.py:1-4``)."""

import sys

import pytest

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("proxmin")

import proxmin_tpu as pt  # noqa: E402


REF_API = {
    "algorithms": ["adaprox", "admm", "bsdmm", "pgm", "sdmm"],
    "operators": [
        "AlternatingProjections", "prox_components", "prox_hard",
        "prox_hard_plus", "prox_id", "prox_max", "prox_max_entropy",
        "prox_min", "prox_plus", "prox_soft", "prox_soft_plus",
        "prox_unity", "prox_unity_plus", "prox_zero",
    ],
    "utils": [
        "ApproximateCache", "BarzilaiBorweinStepper", "MatrixAdapter",
        "NesterovAccelerator", "NullCallback", "Traceback",
        "check_constraint_convergence", "check_convergence", "do_the_mm",
        "get_spectral_norm", "get_step_f", "get_step_g",
        "get_variable_errors", "hasNotNone", "initZU", "l2", "l2sq",
        "update_variables",
    ],
    "nmf": [
        "grad_likelihood", "log_likelihood", "nmf", "step_A", "step_S",
        "step_adaprox", "step_pgm",
    ],
}


def test_reference_api_is_current():
    """Guard: the table above must still match the actual reference."""
    for modname, names in REF_API.items():
        mod = getattr(ref, modname)
        public = {
            n for n in dir(mod)
            if not n.startswith("_")
            and getattr(getattr(mod, n), "__module__", "").startswith(
                "proxmin")
        }
        assert public == set(names), (modname, public ^ set(names))


def test_every_reference_symbol_exists():
    missing = []
    for modname, names in REF_API.items():
        mod = getattr(pt, modname)
        for n in names:
            if not hasattr(mod, n):
                missing.append(f"{modname}.{n}")
    assert not missing, missing


def test_flat_top_level_reexports():
    """Reference re-exports solvers and operators at package top level."""
    for n in REF_API["algorithms"] + REF_API["operators"]:
        assert hasattr(pt, n), n
