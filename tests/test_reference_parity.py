"""Iterate-level numerical parity against the actual reference package.

The original NumPy proxmin is mounted read-only at /root/reference; these
tests run identical problems through both implementations for a FIXED
number of iterations (e_rel=0 disables early stopping) and require the
iterates to agree to float64 round-off. This is the strongest parity
signal available (SURVEY.md §4e).
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

ref = pytest.importorskip("proxmin")

import proxmin_tpu as pt  # noqa: E402


CENTER = np.array([1.0, 0.5])


def _ref_grad(x):
    return x - CENTER


def _jnp_grad(x):
    return x - jnp.asarray(CENTER)


def _ref_prox_disk(x, step, r=0.5):
    nrm = np.linalg.norm(x)
    if nrm > r:
        x = x * (r / nrm)
    return x


def _jnp_prox_disk(x, step, r=0.5):
    nrm = jnp.sqrt(jnp.sum(x ** 2))
    return jnp.where(nrm > r, x * (r / nrm), x)


TOL = dict(rtol=1e-12, atol=1e-13)


def _const_step(v):
    # the reference requires `step` to be callable (floats TypeError)
    return lambda *X, it=None: v


def test_pgm_parity_plain():
    x_ref = np.array([-1.0, -1.0])
    ref.pgm(x_ref, _ref_grad, _const_step(0.7), e_rel=0, max_iter=30)
    res = pt.pgm(jnp.asarray([-1.0, -1.0]), _jnp_grad, 0.7,
                 e_rel=0, max_iter=30)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, **TOL)


def test_pgm_parity_accelerated_prox():
    x_ref = np.array([-1.0, -1.0])
    ref.pgm(x_ref, _ref_grad, _const_step(0.4), prox=_ref_prox_disk,
            accelerated=True, e_rel=0, max_iter=40)
    res = pt.pgm(jnp.asarray([-1.0, -1.0]), _jnp_grad, 0.4,
                 prox=_jnp_prox_disk, accelerated=True,
                 e_rel=0, max_iter=40)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, **TOL)


def test_pgm_parity_backtracking():
    def f_np(x):
        return 0.5 * np.sum((x - CENTER) ** 2)

    def f_jnp(x):
        return 0.5 * jnp.sum((x - jnp.asarray(CENTER)) ** 2)

    x_ref = np.array([-1.0, -1.0])
    ref.pgm(x_ref, _ref_grad, _const_step(10.0), backtracking=True, f=f_np,
            e_rel=0, max_iter=25)
    res = pt.pgm(jnp.asarray([-1.0, -1.0]), _jnp_grad, 10.0,
                 backtracking=True, f=f_jnp, e_rel=0, max_iter=25)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, **TOL)


@pytest.mark.parametrize(
    "scheme", ["adam", "nadam", "amsgrad", "padam", "adamx", "radam"]
)
def test_adaprox_parity(scheme):
    # Vhat passed explicitly: with the default Vhat=None the reference
    # never writes the running max back (its Vhat list stays None forever,
    # algorithms.py:357,375-376), silently disabling AMSGrad/PAdam/AdamX
    # accumulation. proxmin_tpu implements the published algorithms
    # (accumulating from zeros), which equals the reference's behavior when
    # Vhat=0 arrays are supplied.
    vhat = (np.zeros(2),)
    x_ref = np.array([-1.0, -1.0])
    ref.adaprox(x_ref, _ref_grad, lambda *X, it=None: 0.1, scheme=scheme,
                e_rel=0, max_iter=30, check_convergence=False,
                Vhat=(vhat[0].copy(),))
    res = pt.adaprox(jnp.asarray([-1.0, -1.0]), _jnp_grad, 0.1,
                     scheme=scheme, e_rel=0, max_iter=30,
                     check_convergence=False)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, **TOL)


def test_adaprox_parity_with_prox():
    x_ref = np.array([-1.0, -1.0])
    ref.adaprox(x_ref, _ref_grad, lambda *X, it=None: 0.1,
                prox=_ref_prox_disk, scheme="amsgrad",
                e_rel=1e-8, max_iter=30, check_convergence=False,
                Vhat=(np.zeros(2),))
    res = pt.adaprox(jnp.asarray([-1.0, -1.0]), _jnp_grad, 0.1,
                     prox=_jnp_prox_disk, scheme="amsgrad",
                     e_rel=1e-8, max_iter=30, check_convergence=False)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-10,
                               atol=1e-11)


def test_nmf_pgm_parity(rng):
    b, n, k = 40, 30, 3
    A_true = rng.random((b, k))
    S_true = rng.random((k, n))
    Y = A_true @ S_true + 0.02 * rng.standard_normal((b, n))
    A0 = rng.random((b, k))
    S0 = rng.random((k, n))

    A_ref, S_ref = A0.copy(), S0.copy()
    ref.nmf.nmf(Y, A_ref, S_ref, e_rel=0, max_iter=25)

    A_j, S_j = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A_j, S_j, e_rel=0, max_iter=25)

    np.testing.assert_allclose(A_j, A_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(S_j, S_ref, rtol=1e-9, atol=1e-11)


def test_nmf_weighted_step_parity(rng):
    """Weighted Lipschitz constants: implicit batched power iteration must
    equal the block-diagonal spectral norms the reference formulates as
    giant sparse eigenproblems (nmf.py:69-88). The reference function
    itself crashes on array W (`if W == 1` -> ambiguous truth value,
    nmf.py:64 — a reference bug fixed in proxmin_tpu), so the oracle is a
    dense eigendecomposition of the per-block matrices."""
    b, n, k = 8, 12, 3
    A = rng.random((b, k))
    S = rng.random((k, n))
    W = 0.5 + rng.random((b, n))

    with pytest.raises(ValueError):
        ref.nmf.step_pgm(A, S, W=W)  # documents the reference bug

    # dense NumPy oracle: max over per-channel / per-pixel K×K blocks
    LA = max(np.linalg.eigvalsh(S @ np.diag(W[c]) @ S.T).max()
             for c in range(b))
    LS = max(np.linalg.eigvalsh(A.T @ np.diag(W[:, j]) @ A).max()
             for j in range(n))
    sA, sS = pt.nmf.step_pgm(jnp.asarray(A), jnp.asarray(S), W=jnp.asarray(W))
    np.testing.assert_allclose(float(sA), 1.0 / LA, rtol=1e-6)
    np.testing.assert_allclose(float(sS), 1.0 / LS, rtol=1e-6)
