"""Linear-operator abstraction — TPU-native replacement for MatrixAdapter.

The reference wraps ``None`` / dense / scipy.sparse matrices in a
``MatrixAdapter`` with a lazily cached spectral norm computed via
``scipy.sparse.linalg.eigs`` (``/root/reference/proxmin/utils.py:14-101``).

Here a :class:`LinearOperator` is a **pytree** (registered dataclass), so it
can flow straight into jit-compiled solver drivers; the spectral quantity is
computed on device by power iteration (MXU matmuls, fixed iteration count —
no host round trip, no sparse eigensolver). Identity operators carry no data
and are specialized at trace time (zero-cost ``matvec``).

Naming note: the reference's ``spectral_norm`` property actually returns
``lambda_max(L^T L) = ||L||_s^2`` (see ``utils.py:20-35`` — it eigensolves
``L.T @ L``). We keep that quantity (and the name ``spectral_norm_sq`` for
clarity) so the ADMM step-size coupling ``step_g = step_f * ||L||_s^2 * N * M``
matches the reference exactly.
"""

import jax

from .precision import with_matmul_precision
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LinearOperator",
    "IdentityOperator",
    "MatrixOperator",
    "FunctionOperator",
    "SparseOperator",
    "as_linear_operator",
    "power_iteration_norm_sq",
    "lanczos_norm_sq",
    "MatrixAdapter",
]


def power_iteration_norm_sq(matvec, rmatvec, shape, num_iters=64, dtype=jnp.float32):
    """``lambda_max(L^T L)`` for an implicit operator by power iteration.

    ``matvec: x -> L x`` with ``x`` of shape ``shape``. Deterministic start
    vector (normalized ones + index perturbation to avoid orthogonal-start
    pathologies). Fixed ``num_iters`` keeps the computation jittable and
    fully on device. Returns the Rayleigh quotient ``v^T L^T L v``.
    """
    n = int(np.prod(shape))
    v0 = jnp.ones((n,), dtype=dtype)
    # deterministic, non-uniform perturbation so v0 is not orthogonal to the
    # leading eigenvector even for structured operators
    v0 = v0 + 0.01 * jnp.arange(1, n + 1, dtype=dtype) / n
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = rmatvec(matvec(v.reshape(shape)))
        w = w.reshape(-1)
        return w / jnp.maximum(jnp.linalg.norm(w), jnp.finfo(dtype).tiny)

    v = jax.lax.fori_loop(0, num_iters, body, v0)
    Lv = matvec(v.reshape(shape)).reshape(-1)
    return jnp.vdot(Lv, Lv).real.astype(dtype)


def lanczos_norm_sq(matvec, rmatvec, shape, num_iters=64,
                    dtype=jnp.float32):
    """``lambda_max(L^T L)`` for an implicit operator by fixed-size
    Lanczos.

    Power iteration converges like ``(lambda_2/lambda_1)^k`` — hopeless
    for operators with clustered top eigenvalues (e.g. finite
    differences, where the gap is O(1/n^2)). Lanczos reaches the extreme
    eigenvalue in O(sqrt(condition)) iterations instead: k matvec pairs
    build a k×k tridiagonal whose top Ritz value lower-bounds
    ``lambda_max`` tightly. Fully jittable: ``lax.fori_loop`` body, no
    reorthogonalization (ghost eigenvalues only duplicate converged
    ones, which cannot change the max), ``eigvalsh`` on the tiny k×k.
    Breakdown (invariant subspace found, beta=0) zeroes the remaining
    vectors, leaving the computed block — and its max — intact.
    """
    n = int(np.prod(shape))
    k = min(int(num_iters), n)

    def Av(v):
        return rmatvec(matvec(v.reshape(shape))).reshape(-1).astype(dtype)

    v0 = jnp.ones((n,), dtype=dtype)
    v0 = v0 + 0.01 * jnp.arange(1, n + 1, dtype=dtype) / n
    v0 = v0 / jnp.linalg.norm(v0)
    tiny = jnp.finfo(dtype).tiny

    def body(i, carry):
        v_prev, v, beta_prev, alphas, betas = carry
        w = Av(v) - beta_prev * v_prev
        alpha = jnp.vdot(v, w).real.astype(dtype)
        w = w - alpha * v
        beta = jnp.linalg.norm(w)
        v_next = jnp.where(beta > tiny, w / jnp.maximum(beta, tiny), 0.0)
        return (v, v_next, beta,
                alphas.at[i].set(alpha), betas.at[i].set(beta))

    init = (jnp.zeros_like(v0), v0, jnp.zeros((), dtype),
            jnp.zeros((k,), dtype), jnp.zeros((k,), dtype))
    _, _, _, alphas, betas = jax.lax.fori_loop(0, k, body, init)
    T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1)
         + jnp.diag(betas[:-1], -1))
    return jnp.maximum(jnp.linalg.eigvalsh(T)[-1], 0.0).astype(dtype)


def gram_norm_sq(M):
    """``lambda_max(M^T M)`` for a small dense matrix, via eigvalsh.

    Host/trace-time helper for materialized matrices (the Gram matrix is
    ``min(M.shape)``-sized, tiny for the factorization use cases).
    """
    M = jnp.asarray(M)
    if M.shape[0] >= M.shape[1]:
        G = M.T @ M
    else:
        G = M @ M.T
    return jnp.linalg.eigvalsh(G)[-1]


@jax.tree_util.register_pytree_node_class
class LinearOperator:
    """Base linear operator pytree.

    Concrete subclasses implement ``matvec`` / ``rmatvec``. The cached
    ``spectral_norm_sq`` (``= lambda_max(L^T L)``, matching the reference's
    ``MatrixAdapter.spectral_norm``) is a traced leaf so it shards/jits.
    """

    def matvec(self, X):
        raise NotImplementedError

    def rmatvec(self, X):
        raise NotImplementedError

    # reference-compatible aliases
    def dot(self, X):
        return self.matvec(X)

    @property
    def T(self):
        raise NotImplementedError

    @property
    def spectral_norm(self):
        # reference name for lambda_max(L^T L); see module docstring
        return self.spectral_norm_sq

    def tree_flatten(self):
        raise NotImplementedError

    @classmethod
    def tree_unflatten(cls, aux, children):
        raise NotImplementedError


@jax.tree_util.register_pytree_node_class
class IdentityOperator(LinearOperator):
    """The identity map. ``matvec`` is a no-op; spectral norm is 1."""

    is_identity = True

    def matvec(self, X):
        return X

    def rmatvec(self, X):
        return X

    @property
    def T(self):
        return self

    @property
    def spectral_norm_sq(self):
        return 1.0

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    def __repr__(self):
        return "IdentityOperator()"


@jax.tree_util.register_pytree_node_class
class MatrixOperator(LinearOperator):
    """Dense-matrix linear operator with cached ``lambda_max(L^T L)``.

    ``axis=None``: ordinary matmul ``L @ X``. ``axis=1``: the reference's
    flattened-dot mode for per-component application
    (``utils.py:81-86``): ``(L @ X.reshape(-1)).reshape(X.shape[0], -1)``.
    """

    is_identity = False

    def __init__(self, L, axis=None, _norm_sq=None):
        self.L = jnp.asarray(L)
        self.axis = axis
        if _norm_sq is None:
            _norm_sq = gram_norm_sq(self.L)
        self._norm_sq = _norm_sq

    def matvec(self, X):
        if self.axis is None:
            return self.L @ X
        if self.axis == 1:
            return (self.L @ X.reshape(-1)).reshape(X.shape[0], -1)
        raise NotImplementedError("axis=0 is a plain matmul; use axis=None")

    def rmatvec(self, X):
        if self.axis is None:
            return self.L.T @ X
        if self.axis == 1:
            return (self.L.T @ X.reshape(-1)).reshape(X.shape[0], -1)
        raise NotImplementedError("axis=0 is a plain matmul; use axis=None")

    @property
    def T(self):
        # transpose preserves axis mode, like the reference (utils.py:63-67);
        # lambda_max(L L^T) == lambda_max(L^T L), so the cache carries over
        return MatrixOperator(self.L.T, axis=self.axis, _norm_sq=self._norm_sq)

    @property
    def spectral_norm_sq(self):
        return self._norm_sq

    @property
    def shape(self):
        return self.L.shape

    @property
    def ndim(self):
        return self.L.ndim

    @property
    def size(self):
        return self.L.size

    def __len__(self):
        return self.L.shape[0]

    def tree_flatten(self):
        return (self.L, self._norm_sq), self.axis

    @classmethod
    def tree_unflatten(cls, aux, children):
        L, norm_sq = children
        obj = object.__new__(cls)
        obj.L = L
        obj.axis = aux
        obj._norm_sq = norm_sq
        return obj

    def __repr__(self):
        return f"MatrixOperator(shape={self.L.shape}, axis={self.axis})"


@jax.tree_util.register_pytree_node_class
class FunctionOperator(LinearOperator):
    """Matrix-free linear operator from user ``matvec``/``rmatvec``
    callables.

    The TPU-native replacement for the reference's scipy.sparse support
    (``/root/reference/proxmin/utils.py:28-35,53-60``): instead of a
    sparse matrix, the user supplies the *action* of a structured
    operator (finite differences, convolutions, wavelets, ...) as
    jittable functions. The spectral quantity ``lambda_max(L^T L)`` is
    computed once at construction by on-device Lanczos iteration
    (:func:`lanczos_norm_sq`) and cached as a pytree leaf —
    nothing of size bigger than the operand is ever materialized, so a
    TV operator on a 1e6-dim x costs O(n) memory where a dense L would
    need O(n^2).

    Accepted by admm/sdmm/bsdmm anywhere an ``L`` is (``Ls=[op, ...]``).

    Args:
        matvec: ``x -> L x``, jit-traceable, for ``x`` of ``in_shape``.
        rmatvec: ``y -> L^T y``; must be the true adjoint of ``matvec``
            (power iteration and the ADMM dual updates rely on it).
        in_shape: shape of the operand ``x``.
        dtype: dtype used for the power-iteration probe.
        norm_sq: optional known ``lambda_max(L^T L)`` — skips the power
            iteration (e.g. 4*ndim for forward differences per axis).
        num_iters: power-iteration count (fixed for jittability).
    """

    is_identity = False

    def __init__(self, matvec, rmatvec, in_shape, dtype=jnp.float32,
                 norm_sq=None, num_iters=64):
        self._mv = matvec
        self._rmv = rmatvec
        self.in_shape = tuple(int(s) for s in in_shape)
        self.dtype = np.dtype(dtype)
        self.num_iters = int(num_iters)
        if norm_sq is None:
            # Lanczos, not power iteration: structured operators (TV,
            # convolutions) have clustered top eigenvalues where power
            # iteration stalls at ~1% error even after 64 passes
            norm_sq = lanczos_norm_sq(
                matvec, rmatvec, self.in_shape,
                num_iters=self.num_iters, dtype=self.dtype,
            )
        self._norm_sq = norm_sq

    def matvec(self, X):
        return self._mv(X)

    def rmatvec(self, X):
        return self._rmv(X)

    @property
    def out_shape(self):
        probe = jax.eval_shape(
            self._mv, jax.ShapeDtypeStruct(self.in_shape, self.dtype)
        )
        return probe.shape

    @property
    def T(self):
        # lambda_max(L L^T) == lambda_max(L^T L): the cached norm carries
        # over, so no power iteration on the transpose
        return FunctionOperator(
            self._rmv, self._mv, self.out_shape, dtype=self.dtype,
            norm_sq=self._norm_sq, num_iters=self.num_iters,
        )

    @property
    def spectral_norm_sq(self):
        return self._norm_sq

    def tree_flatten(self):
        return (self._norm_sq,), (
            self._mv, self._rmv, self.in_shape, str(self.dtype),
            self.num_iters,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        mv, rmv, in_shape, dtype, num_iters = aux
        obj = object.__new__(cls)
        obj._mv = mv
        obj._rmv = rmv
        obj.in_shape = in_shape
        obj.dtype = np.dtype(dtype)
        obj.num_iters = num_iters
        (obj._norm_sq,) = children
        return obj

    def __repr__(self):
        return (f"FunctionOperator(in_shape={self.in_shape}, "
                f"dtype={self.dtype})")


@jax.tree_util.register_pytree_node_class
class SparseOperator(LinearOperator):
    """Sparse linear operator backed by ``jax.experimental.sparse.BCOO``.

    The device-native replacement for the reference's scipy.sparse
    ``MatrixAdapter`` support (``/root/reference/proxmin/utils.py:28-35,
    53-60``): scipy matrices convert to BCOO (COO indices + data on
    device, O(nnz) memory), matvecs lower to XLA scatter/gather dots,
    and the cached ``lambda_max(L^T L)`` comes from the same on-device
    Lanczos used by :class:`FunctionOperator` (the reference uses host
    ARPACK ``eigs``). For purely structured actions (TV, convolutions)
    prefer :class:`FunctionOperator` — its matvec is usually faster
    than a generic sparse contraction.
    """

    is_identity = False

    def __init__(self, L, axis=None, _norm_sq=None, num_iters=64):
        from jax.experimental import sparse as jsparse

        if hasattr(L, "tocoo"):            # scipy.sparse
            L = jsparse.BCOO.from_scipy_sparse(L.tocoo())
        self.L = L
        self.axis = axis
        if _norm_sq is None:
            _norm_sq = lanczos_norm_sq(
                lambda v: self.L @ v, lambda v: self.L.T @ v,
                (L.shape[1],), num_iters=num_iters, dtype=L.dtype,
            )
        self._norm_sq = _norm_sq

    def matvec(self, X):
        if self.axis is None:
            return self.L @ X
        if self.axis == 1:
            return (self.L @ X.reshape(-1)).reshape(X.shape[0], -1)
        raise NotImplementedError("axis=0 is a plain matmul; use axis=None")

    def rmatvec(self, X):
        if self.axis is None:
            return self.L.T @ X
        if self.axis == 1:
            return (self.L.T @ X.reshape(-1)).reshape(X.shape[0], -1)
        raise NotImplementedError("axis=0 is a plain matmul; use axis=None")

    @property
    def T(self):
        return SparseOperator(self.L.T, axis=self.axis,
                              _norm_sq=self._norm_sq)

    @property
    def spectral_norm_sq(self):
        return self._norm_sq

    @property
    def shape(self):
        return self.L.shape

    def tree_flatten(self):
        return (self.L, self._norm_sq), self.axis

    @classmethod
    def tree_unflatten(cls, aux, children):
        L, norm_sq = children
        obj = object.__new__(cls)
        obj.L = L
        obj.axis = aux
        obj._norm_sq = norm_sq
        return obj

    def __repr__(self):
        return (f"SparseOperator(shape={self.L.shape}, "
                f"nse={self.L.nse}, axis={self.axis})")


def as_linear_operator(L, axis=None):
    """Coerce ``None`` / array / scipy.sparse / LinearOperator into a
    LinearOperator.

    Mirrors the reference ``MatrixAdapter`` constructor semantics
    (``utils.py:42-51``), including de-cascading (wrapping an operator
    returns it unchanged). scipy.sparse inputs stay sparse on device
    (:class:`SparseOperator`; the round-1 build densified them).
    """
    if L is None:
        return IdentityOperator()
    if isinstance(L, LinearOperator):
        return L
    if hasattr(L, "toarray"):
        return SparseOperator(L, axis=axis)
    return MatrixOperator(L, axis=axis)


def MatrixAdapter(L, axis=None):
    """Reference-compatible alias for :func:`as_linear_operator`
    (``/root/reference/proxmin/utils.py:38``)."""
    return as_linear_operator(L, axis=axis)


@with_matmul_precision
def get_spectral_norm(L):
    """Reference-compatible: ``lambda_max(L^T L)`` for ``None``/matrix/operator
    (``/root/reference/proxmin/utils.py:14-35``)."""
    if L is None:
        return 1
    if isinstance(L, LinearOperator):
        return L.spectral_norm_sq
    if hasattr(L, "spectral_norm"):
        return L.spectral_norm
    if hasattr(L, "toarray"):
        return SparseOperator(L).spectral_norm_sq
    return gram_norm_sq(jnp.asarray(L))
