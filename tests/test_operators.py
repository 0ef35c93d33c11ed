"""Unit tests for the proximal operator library.

Strategy (SURVEY.md §4): each operator against its closed form / a NumPy
oracle, idempotency of projections, Moreau decomposition for the L1 prox,
and jit-compatibility of everything.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import proxmin_tpu.operators as op
from proxmin_tpu.special import lambertw, lambertw_exp


@pytest.fixture
def X(rng):
    return jnp.asarray(rng.normal(size=(7, 11)))


def test_prox_id(X):
    assert np.array_equal(op.prox_id(X, 0.5), X)


def test_prox_zero(X):
    assert np.array_equal(op.prox_zero(X, 0.5), np.zeros_like(X))


def test_prox_plus(X):
    P = np.asarray(op.prox_plus(X, 0.5))
    assert (P >= 0).all()
    assert np.array_equal(P, np.maximum(np.asarray(X), 0))
    # idempotent projection
    assert np.array_equal(np.asarray(op.prox_plus(jnp.asarray(P), 0.5)), P)


@pytest.mark.parametrize("axis", [0, 1])
def test_prox_unity(X, axis):
    X = jnp.abs(X) + 0.1
    P = np.asarray(op.prox_unity(X, 0.5, axis=axis))
    np.testing.assert_allclose(P.sum(axis=axis), 1.0, rtol=1e-12)


@pytest.mark.parametrize("axis", [0, 1])
def test_prox_unity_plus(X, axis):
    # ensure at least one positive entry per slice (an all-negative slice
    # projects to 0/0 = NaN, same as the reference)
    X = X.at[0, :].set(jnp.abs(X[0, :]) + 0.1)
    X = X.at[:, 0].set(jnp.abs(X[:, 0]) + 0.1)
    P = np.asarray(op.prox_unity_plus(X, 0.5, axis=axis))
    assert (P >= 0).all()
    np.testing.assert_allclose(P.sum(axis=axis), 1.0, rtol=1e-12)
    # idempotent
    P2 = np.asarray(op.prox_unity_plus(jnp.asarray(P), 0.5, axis=axis))
    np.testing.assert_allclose(P2, P, atol=1e-12)


@pytest.mark.parametrize("type_", ["relative", "absolute"])
def test_prox_min_max(X, type_):
    thresh, step = 0.3, 0.5
    t = thresh * step if type_ == "relative" else thresh
    lo = np.asarray(op.prox_min(X, step, thresh=thresh, type=type_))
    hi = np.asarray(op.prox_max(X, step, thresh=thresh, type=type_))
    # note: this backend computes f64 at ~48-bit precision, so thresholds
    # computed on device differ from Python floats in the last bits
    np.testing.assert_allclose(lo, np.maximum(np.asarray(X), t), atol=1e-12)
    np.testing.assert_allclose(hi, np.minimum(np.asarray(X), t), atol=1e-12)


def test_prox_bad_type(X):
    with pytest.raises(ValueError):
        op.prox_min(X, 0.5, thresh=0.3, type="bogus")


@pytest.mark.parametrize("type_", ["relative", "absolute"])
def test_prox_hard_soft(X, type_):
    thresh, step = 0.4, 0.5
    t = thresh * step if type_ == "relative" else thresh
    Xn = np.asarray(X)

    hard = np.asarray(op.prox_hard(X, step, thresh=thresh, type=type_))
    expected_hard = np.where(np.abs(Xn) < t, 0.0, Xn)
    assert np.array_equal(hard, expected_hard)

    soft = np.asarray(op.prox_soft(X, step, thresh=thresh, type=type_))
    expected_soft = np.sign(Xn) * np.maximum(np.abs(Xn) - t, 0)
    np.testing.assert_allclose(soft, expected_soft, atol=1e-12)

    hp = np.asarray(op.prox_hard_plus(X, step, thresh=thresh, type=type_))
    assert np.array_equal(hp, np.maximum(expected_hard, 0))
    sp = np.asarray(op.prox_soft_plus(X, step, thresh=thresh, type=type_))
    np.testing.assert_allclose(sp, np.maximum(expected_soft, 0), atol=1e-12)


def test_prox_soft_moreau(X):
    """Moreau decomposition: x = prox_{t g}(x) + t prox_{g*/t}(x/t).
    For g = ||.||_1 the conjugate prox is projection onto [-thresh, thresh]."""
    thresh = 0.7
    Xn = np.asarray(X)
    soft = np.asarray(op.prox_soft(X, 1.0, thresh=thresh, type="absolute"))
    clip = np.clip(Xn, -thresh, thresh)
    np.testing.assert_allclose(soft + clip, Xn, atol=1e-12)


def test_prox_soft_is_l1_minimizer(X):
    """prox output must minimize 0.5||z-x||^2 + t||z||_1 vs perturbations."""
    t = 0.3
    z = np.asarray(op.prox_soft(X, 1.0, thresh=t, type="absolute"))
    x = np.asarray(X)

    def obj(z):
        return 0.5 * np.sum((z - x) ** 2) + t * np.abs(z).sum()

    base = obj(z)
    gen = np.random.default_rng(0)
    for _ in range(10):
        assert obj(z + 1e-4 * gen.normal(size=z.shape)) >= base - 1e-12


def test_prox_components(X):
    step = 0.5
    P = np.asarray(
        op.prox_components(X, step, prox=[op.prox_plus] * X.shape[0], axis=0)
    )
    assert np.array_equal(P, np.maximum(np.asarray(X), 0))
    # mixed proxs per column
    proxs = [op.prox_plus] * X.shape[1]
    proxs[0] = op.prox_zero
    P = np.asarray(op.prox_components(X, step, prox=proxs, axis=1))
    assert np.array_equal(P[:, 0], np.zeros(X.shape[0]))
    assert np.array_equal(P[:, 1:], np.maximum(np.asarray(X)[:, 1:], 0))


def test_prox_max_entropy():
    # prox of g(x) = gamma * x log x  must satisfy the stationarity condition
    # z - x + gamma_*(1 + log z) = 0  for x > 0 entries
    x = jnp.asarray([0.5, 1.0, 3.0, 10.0, -1.0, 0.0])
    gamma, step = 0.7, 0.5
    gamma_ = gamma * step
    z = np.asarray(op.prox_max_entropy(x, step, gamma=gamma))
    xn = np.asarray(x)
    pos = xn > 0
    resid = z[pos] - xn[pos] + gamma_ * (1 + np.log(z[pos]))
    np.testing.assert_allclose(resid, 0, atol=1e-8)
    # untouched where x <= 0
    assert np.array_equal(z[~pos], xn[~pos])


def test_lambertw_identity():
    z = jnp.asarray([0.0, 1e-8, 0.1, 1.0, np.e, 10.0, 1e3, 1e8])
    w = np.asarray(lambertw(z))
    np.testing.assert_allclose(w * np.exp(w), np.asarray(z), rtol=1e-10)


def test_lambertw_exp_large():
    # w + log(w) = t must hold even where exp(t) overflows
    t = jnp.asarray([-50.0, -1.0, 0.0, 1.0, 10.0, 100.0, 1e4])
    w = np.asarray(lambertw_exp(t))
    np.testing.assert_allclose(w + np.log(w), np.asarray(t), rtol=1e-10,
                               atol=1e-12)


def test_lambertw_vs_scipy():
    scipy_special = pytest.importorskip("scipy.special")
    z = np.linspace(0.01, 50.0, 200)
    w = np.asarray(lambertw(jnp.asarray(z)))
    np.testing.assert_allclose(w, scipy_special.lambertw(z).real, rtol=1e-10)


def test_alternating_projections(X):
    # first in the list is applied last (reference convention)
    ap = op.AlternatingProjections([op.prox_plus, op.prox_zero])
    P = np.asarray(ap(X, 0.5))
    # prox_zero runs first, prox_plus last -> all zeros
    assert np.array_equal(P, np.zeros_like(P))

    ap2 = op.AlternatingProjections(
        [op.prox_zero, op.prox_plus], repeat=2
    )
    assert np.array_equal(np.asarray(ap2(X, 0.5)), np.zeros_like(P))

    import functools
    ap3 = op.AlternatingProjections(
        [functools.partial(op.prox_soft, thresh=0.1), op.prox_plus]
    )
    assert ap3.find(op.prox_soft) == 0
    assert ap3.find(op.prox_plus) == 1
    assert ap3.find(op.prox_zero) == -1


def test_operators_jittable(X):
    for fn in [
        op.prox_id, op.prox_zero, op.prox_plus,
        lambda x, s: op.prox_unity(x, s, axis=0),
        lambda x, s: op.prox_min(x, s, thresh=0.1),
        lambda x, s: op.prox_max(x, s, thresh=0.1),
        lambda x, s: op.prox_hard(x, s, thresh=0.1),
        lambda x, s: op.prox_soft(x, s, thresh=0.1),
        lambda x, s: op.prox_soft_plus(x, s, thresh=0.1),
        lambda x, s: op.prox_max_entropy(x, s, gamma=0.5),
    ]:
        eager = np.asarray(fn(jnp.abs(X) + 0.1, 0.5))
        jitted = np.asarray(jax.jit(fn)(jnp.abs(X) + 0.1, 0.5))
        np.testing.assert_allclose(jitted, eager, rtol=1e-12)


def test_pocs_converges_to_intersection():
    """AlternatingProjections iterates into the intersection of convex
    sets (halfplane x>=0.2 and ball ||x||<=1)."""
    def proj_half(x, step):
        return x.at[0].set(jnp.maximum(x[0], 0.2))

    def proj_ball(x, step):
        n = jnp.sqrt(jnp.sum(x ** 2))
        return jnp.where(n > 1.0, x / n, x)

    ap = op.AlternatingProjections([proj_ball, proj_half], repeat=20)
    out = np.asarray(ap(jnp.asarray([-3.0, 4.0]), 0.5))
    assert out[0] >= 0.2 - 1e-6
    assert np.linalg.norm(out) <= 1.0 + 1e-6


def test_matrix_operator_metadata(rng):
    from proxmin_tpu.linop import MatrixOperator

    L = MatrixOperator(jnp.asarray(rng.normal(size=(4, 3))))
    assert L.shape == (4, 3)
    assert L.ndim == 2
    assert L.size == 12
    assert len(L) == 4
