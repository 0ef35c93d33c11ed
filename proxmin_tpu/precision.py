"""Matmul-precision policy shared by every solver driver and engine.

TPU MXUs multiply in bfloat16 passes; XLA's DEFAULT f32 matmul is ONE
pass (~3 decimal digits of mantissa), which puts a noise floor on the
iterate movement ABOVE the reference stopping tolerances: measured on
v5e, the reference unmixing-style problem (C=16, K=4, N=512,
``prox_unity_plus`` on A) converges in 1794 iterations at
``e_rel=1e-4`` on CPU/f32 — identical to the NumPy reference
(``/root/reference/proxmin/algorithms.py:130-133`` fixed-point rule) —
but NEVER converges on TPU under default precision (20000 iterations,
143x the wall-clock). With ``precision='highest'`` the TPU run
converges in exactly the same 1794 iterations. The public entry points
(`pgm`/`adaprox`/`admm`/`sdmm`/`bsdmm`, `nmf`, the fused engines, the
functional makers, the AOT exporters, the sharded whole-solve)
therefore trace their compiled programs under this policy. The NMF
problem is HBM-bound at every benchmarked shape, so the extra MXU
passes are free (see docs/BENCHMARKS.md "Matmul precision").

This lives in its own module (not ``utils``) so ``linop`` — which
``utils`` imports — can use the policy without a circular import.
"""

import functools

import jax

_MATMUL_PRECISION = "highest"


def set_matmul_precision(precision):
    """Set the matmul precision the solver drivers trace with.

    ``precision`` is any value accepted by
    ``jax.default_matmul_precision`` ('default' | 'high' | 'highest'),
    or ``None`` to leave JAX's ambient setting untouched (opt back into
    the platform default, e.g. to trade convergence accuracy for MXU
    throughput on compute-bound custom problems). Returns the previous
    policy. Changing the policy re-specializes the compiled drivers
    automatically (the precision config participates in the jit cache
    key)."""
    global _MATMUL_PRECISION
    prev = _MATMUL_PRECISION
    _MATMUL_PRECISION = precision
    return prev


class _NullCtx:
    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False


def matmul_precision_scope():
    """Context manager applying the solver matmul-precision policy
    (no-op when the policy is ``None``). Entered by every public
    driver/engine around trace + execution; nesting is harmless."""
    if _MATMUL_PRECISION is None:
        return _NullCtx()
    return jax.default_matmul_precision(_MATMUL_PRECISION)


def with_matmul_precision(fn):
    """Decorator: run ``fn`` under :func:`matmul_precision_scope`.
    Applied to the public solver entry points so both tracing and
    dispatch see the policy."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with matmul_precision_scope():
            return fn(*args, **kwargs)

    return wrapper
