"""AOT export of solver executables for production serving.

A deployed service should not pay tracing + compilation at request time.
:func:`export_nmf_solver` serializes the fused PGM-NMF solve (StableHLO via
``jax.export``) for fixed problem shapes; :func:`load_solver` restores it in
a fresh process (no proxmin_tpu import needed at serving time beyond jax)
and returns a callable ``(A0, S0, Y, max_iter) -> (A, S, it, conv_A,
conv_S, loss)``.

The exported artifact is shape- and platform-specialized (TPU artifacts run
on TPU). For multi-shape serving, export one artifact per shape bucket.
"""

import jax
import jax.numpy as jnp
from jax import export as jax_export

from . import operators
from .nmf import _make_fused_pgm_runner

__all__ = ["export_nmf_solver", "load_solver", "save_exported", "load_exported"]


def export_nmf_solver(C, K, N, prox_A=operators.prox_plus,
                      prox_S=operators.prox_plus,
                      e_rel=1e-3, tile_n=8192, dtype=jnp.float32,
                      store_dtype=None):
    """Serialize the fused PGM-NMF solver for a fixed (C, K, N) shape.

    Returns the serialized bytes. The embedded executable has the
    signature ``(A: (C,K), S: (K,N), Y: (C,N), max_iter: i32)``.
    ``prox_S=None`` means identity (same convention as ``nmf``).
    """
    if prox_A is None:
        prox_A = operators.prox_id
    if prox_S is None:
        prox_S = operators.prox_id
    elif prox_S is operators.prox_plus:
        prox_S = None  # kernel builtin
    run = _make_fused_pgm_runner(
        prox_A, prox_S, float(e_rel), int(tile_n), int(C), int(K), int(N),
        jnp.dtype(dtype),
        store_dtype=jnp.dtype(store_dtype) if store_dtype else None,
    )
    args = (
        jax.ShapeDtypeStruct((C, K), dtype),
        jax.ShapeDtypeStruct((K, N), dtype),
        jax.ShapeDtypeStruct((C, N), dtype),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    return jax_export.export(run)(*args).serialize()


def load_solver(blob):
    """Deserialize an exported solver into a callable."""
    exported = jax_export.deserialize(blob)

    def solve(A, S, Y, max_iter):
        return exported.call(A, S, Y, jnp.int32(max_iter))

    return solve


def save_exported(path, blob):
    with open(path, "wb") as fh:
        fh.write(blob)
    return path


def load_exported(path):
    with open(path, "rb") as fh:
        return load_solver(fh.read())
