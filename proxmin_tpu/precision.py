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

# Per-dot annotations for the NMF data path (explicit ``precision=``
# always overrides the ambient policy). The error analysis behind the
# split, confirmed by measurement (r5 mixed-precision sweep,
# /tmp-protocol recorded in benchmarks/results_r5.json):
#
# - The K-axis product ``A @ S`` inside the residual is
#   ABSOLUTE-error-critical: one bf16 pass rounds A and S themselves,
#   so the residual carries a noise floor ~eps_bf16 * |A S| that does
#   NOT decay as the gradient does — it is exactly what stalls the
#   fixed-point test. HIGH (bf16x3) restores f32-grade products;
#   measured convergence is identical to HIGHEST (706 vs 706
#   iterations) at 0.114 vs 0.136 ms/iter on the v5e flagship.
# - Pixel-axis contractions (``D S^T``, ``A^T D``, ``S S^T`` Grams,
#   weighted power-iteration matvecs) are RELATIVE-error ops: their
#   bf16-pass error is proportional to the operand magnitudes, which
#   shrink with the gradient/are protected by the steppers' 0.9 safety
#   margins. DEFAULT keeps them on the fast single-pass MXU path
#   (measured: grads at DEFAULT converge in the same iteration count
#   as HIGHEST, 706 vs 700).
# - Tiny Grams (K x K, C x K) cost nothing at HIGHEST.
#
# Mosaic (Pallas) rejects Precision.HIGH, so kernels use HIGHEST for
# the residual dot — per-tile the operands are VMEM-resident and the
# extra passes are MXU-only (no HBM cost).
RESIDUAL_PRECISION = jax.lax.Precision.HIGH
KERNEL_RESIDUAL_PRECISION = jax.lax.Precision.HIGHEST
STREAM_PRECISION = jax.lax.Precision.DEFAULT
TINY_PRECISION = jax.lax.Precision.HIGHEST


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
