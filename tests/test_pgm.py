"""PGM/FISTA solver tests on problems with analytic optima (SURVEY.md §4:
parabola-style configs with known constrained minima)."""

import numpy as np
import jax.numpy as jnp
import pytest

from proxmin_tpu import pgm, operators, utils


CENTER = np.array([1.0, 0.5])
RADIUS = 0.5


def f(x):
    return 0.5 * jnp.sum((x - CENTER) ** 2)


def grad_f(x):
    return x - CENTER


def prox_disk(x, step, r=RADIUS):
    """Projection onto the centered disk of radius r."""
    nrm = jnp.sqrt(jnp.sum(x ** 2))
    return jnp.where(nrm > r, x * (r / nrm), x)


DISK_OPT = RADIUS * CENTER / np.linalg.norm(CENTER)


def test_pgm_unconstrained():
    x0 = jnp.asarray([-1.0, -1.0])
    res = pgm(x0, grad_f, 1.0, e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x), CENTER, atol=1e-8)
    assert all(res.converged)
    assert res.iterations < 500


def test_pgm_returns_reference_tuple():
    x0 = jnp.asarray([-1.0, -1.0])
    converged, G, S = pgm(x0, grad_f, 1.0, e_rel=1e-8, max_iter=200)
    assert isinstance(converged, tuple)
    assert np.asarray(G).shape == (2,)


def test_pgm_disk_constraint():
    x0 = jnp.asarray([-1.0, -1.0])
    res = pgm(x0, grad_f, 0.5, prox=prox_disk, e_rel=1e-12, max_iter=2000)
    np.testing.assert_allclose(np.asarray(res.x), DISK_OPT, atol=1e-6)


def test_fista_accelerated():
    """FISTA reaches tolerance in fewer iterations on an ill-conditioned
    quadratic."""
    H = jnp.asarray(np.diag([1.0, 0.01]))
    c = jnp.asarray([1.0, 1.0])

    def g(x):
        return H @ (x - c)

    x0 = jnp.asarray([-1.0, -1.0])
    plain = pgm(x0, g, 1.0, e_rel=1e-9, max_iter=5000)
    fast = pgm(x0, g, 1.0, accelerated=True, e_rel=1e-9, max_iter=5000)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(c), atol=1e-6)
    assert fast.iterations < plain.iterations


def test_backtracking_recovers_from_large_step():
    """With a 50x too large step, backtracking still converges."""
    x0 = jnp.asarray([-1.0, -1.0])
    res = pgm(
        x0, grad_f, 50.0, backtracking=True, f=lambda x: f(x),
        e_rel=1e-10, max_iter=500,
    )
    np.testing.assert_allclose(np.asarray(res.x), CENTER, atol=1e-7)


def test_backtracking_requires_f():
    with pytest.raises(AssertionError):
        pgm(jnp.zeros(2), grad_f, 1.0, backtracking=True)


def test_pgm_multiblock():
    """Two independent blocks solved jointly (block coordinate PGM)."""
    c1, c2 = jnp.asarray([2.0, 0.0]), jnp.asarray([[1.0, -1.0], [0.5, 3.0]])

    def g(x1, x2):
        return x1 - c1, x2 - c2

    x0 = [jnp.zeros(2), jnp.zeros((2, 2))]
    res = pgm(x0, g, 1.0, prox=[None, operators.prox_plus],
              e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(c1), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res.x[1]), np.maximum(np.asarray(c2), 0), atol=1e-8
    )


def test_pgm_per_block_steps():
    def g(x1, x2):
        return x1 - 1.0, 2.0 * (x2 - 2.0)

    x0 = [jnp.zeros(3), jnp.zeros(3)]
    res = pgm(x0, g, (1.0, 0.5), e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x[0]), 1.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x[1]), 2.0, atol=1e-8)


def test_pgm_step_function_with_it():
    def step(*X, it=None):
        # constant value, but fails loudly if `it` is not threaded through
        return 1.0 / (1.0 + 0.0 * it)

    x0 = jnp.asarray([-1.0, -1.0])
    res = pgm(x0, grad_f, step, e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x), CENTER, atol=1e-8)


def test_pgm_bb_stepper():
    """Barzilai–Borwein steps through the stepper protocol, inside jit."""
    H = jnp.asarray(np.diag([1.0, 0.05]))
    c = jnp.asarray([1.0, 1.0])

    def g(x):
        return H @ (x - c)

    stepper = utils.BarzilaiBorweinStepper(type=1, init_r=0.1)
    res = pgm(jnp.asarray([-1.0, -1.0]), g, stepper,
              e_rel=1e-10, max_iter=2000)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(c), atol=1e-6)


def test_pgm_numpy_inplace_update():
    """NumPy inputs are updated in place (reference contract)."""
    x0 = np.array([-1.0, -1.0])
    res = pgm(x0, grad_f, 1.0, e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(x0, CENTER, atol=1e-8)


def test_pgm_callback_and_stopiteration():
    seen = []

    def cb(*X, it=None):
        seen.append(it)
        if it >= 5:
            raise StopIteration

    res = pgm(jnp.asarray([-1.0, -1.0]), grad_f, 0.2,
              callback=cb, e_rel=1e-12, max_iter=100)
    assert seen == [0, 1, 2, 3, 4, 5]


def test_pgm_traceback_callback():
    tb = utils.Traceback()
    pgm(jnp.asarray([-1.0, -1.0]), grad_f, 1.0, callback=tb,
        e_rel=1e-6, max_iter=50)
    assert len(tb.trace) >= 2
    # loss must be non-increasing for gradient descent on a quadratic
    losses = [0.5 * np.sum((t[0] - CENTER) ** 2) for t in tb.trace]
    assert all(l2 <= l1 + 1e-12 for l1, l2 in zip(losses, losses[1:]))


def test_pgm_fused_matches_host_loop():
    """The fully-fused while_loop and the compiled-step host loop must give
    identical iterates (same math, different drivers)."""
    x0 = jnp.asarray([-1.0, -1.0])
    r1 = pgm(x0, grad_f, 0.5, prox=prox_disk, accelerated=True,
             e_rel=1e-11, max_iter=300)
    r2 = pgm(x0, grad_f, 0.5, prox=prox_disk, accelerated=True,
             e_rel=1e-11, max_iter=300, callback=utils.NullCallback())
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-10)
    assert r1.iterations == r2.iterations


def test_pgm_matches_numpy_oracle():
    """Iterate-for-iterate parity with an eager NumPy ISTA implementation."""
    step = 0.7
    n_iter = 25

    # NumPy oracle (fresh implementation of the textbook ISTA recursion)
    x = np.array([-1.0, -1.0])
    for _ in range(n_iter):
        x = x - step * (x - CENTER)
        nrm = np.linalg.norm(x)
        if nrm > RADIUS:
            x = x * RADIUS / nrm

    res = pgm(jnp.asarray([-1.0, -1.0]), grad_f, step, prox=prox_disk,
              e_rel=0.0, max_iter=n_iter)
    # this backend computes f64 at ~48-bit precision -> rtol accordingly
    np.testing.assert_allclose(np.asarray(res.x), x, rtol=1e-9)


def test_pgm_with_jax_grad():
    """jax.grad replaces the reference's autograd compatibility
    (README.md:33 of the reference): pass jax.grad(f) directly."""
    import jax

    def loss(x):
        return 0.5 * jnp.sum((x - jnp.asarray(CENTER)) ** 2)

    res = pgm(jnp.asarray([-1.0, -1.0]), jax.grad(loss), 1.0,
              prox=prox_disk, e_rel=1e-10, max_iter=1000)
    np.testing.assert_allclose(np.asarray(res.x), DISK_OPT, atol=1e-7)


def test_pgm_multiblock_jax_grad():
    import jax

    c1, c2 = jnp.asarray([2.0, 0.0]), jnp.asarray([0.5, 3.0])

    def loss(x1, x2):
        return 0.5 * jnp.sum((x1 - c1) ** 2) + 0.5 * jnp.sum((x2 - c2) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))
    res = pgm([jnp.zeros(2), jnp.zeros(2)], grad, 1.0,
              e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(c1),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x[1]), np.asarray(c2),
                               atol=1e-8)


def test_pgm_numpy_step_array_mutation_not_stale():
    """Regression (advisor r1): a mutable NumPy step array must not be
    baked into a cached trace — in-place mutation between solves is
    honored by bypassing the driver cache."""
    step = np.array([1.0, 1.0])
    r1 = pgm(jnp.zeros(2), grad_f, step, e_rel=0, max_iter=1)
    x1 = np.asarray(r1.x)
    step[:] = 0.0   # mutate in place, same object id
    r2 = pgm(jnp.zeros(2), grad_f, step, e_rel=0, max_iter=1)
    x2 = np.asarray(r2.x)
    # zero step: the iterate must not move at all
    np.testing.assert_allclose(x2, 0.0)
    assert not np.allclose(x1, x2)


def test_adaprox_numpy_step_array_mutation_not_stale():
    from proxmin_tpu import adaprox

    step = np.array([0.5, 0.5])
    r1 = adaprox(jnp.zeros(2), grad_f, step, e_rel=0, max_iter=1)
    x1 = np.asarray(r1.x)
    step[:] = 0.0
    r2 = adaprox(jnp.zeros(2), grad_f, step, e_rel=0, max_iter=1)
    np.testing.assert_allclose(np.asarray(r2.x), 0.0)
    assert not np.allclose(x1, np.asarray(r2.x))


def test_pgm_segmented_strided_matches_host_loop():
    """Strided steppers run in segmented mode (refresh hoisted out of the
    hot loop); the callback host loop still uses the per-iteration
    ``lax.cond`` path — both must produce identical iterates."""
    def step_fn(*X, it=None):
        return 0.7 / (1.0 + 0.01 * it)

    st1 = utils.StridedStepper(step_fn, 1, stride=7)
    st2 = utils.StridedStepper(step_fn, 1, stride=7)
    assert st1.segmentable
    x0 = jnp.asarray([-1.0, -1.0])
    r1 = pgm(x0, grad_f, st1, prox=prox_disk, e_rel=1e-11, max_iter=100)
    r2 = pgm(x0, grad_f, st2, prox=prox_disk, e_rel=1e-11, max_iter=100,
             callback=utils.NullCallback())
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)
    assert r1.iterations == r2.iterations


def test_pgm_segmented_strided_accelerated_and_trace():
    """Segmented mode composes with FISTA acceleration (the refresh sees
    the extrapolated iterate) and device-side tracing."""
    def step_fn(*X, it=None):
        return 0.5

    r1 = pgm(jnp.asarray([-1.0, -1.0]), grad_f,
             utils.StridedStepper(step_fn, 1, stride=5), prox=prox_disk,
             accelerated=True, e_rel=1e-11, max_iter=200, trace=True)
    r2 = pgm(jnp.asarray([-1.0, -1.0]), grad_f,
             utils.StridedStepper(step_fn, 1, stride=5), prox=prox_disk,
             accelerated=True, e_rel=1e-11, max_iter=200,
             callback=utils.NullCallback())
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)
    assert r1.iterations == r2.iterations
    assert r1.history.shape[0] == r1.iterations


def test_bb_stepper_not_segmentable():
    """Grads-dependent steppers must stay on the per-iteration path."""
    bb = utils.StridedStepper(
        utils.BarzilaiBorweinStepper(), 1, stride=5
    )
    assert not bb.segmentable


def test_pgm_grad_none_autodiff():
    """grad=None differentiates f via jax.grad (autograd-compat parity)."""
    res = pgm(jnp.asarray([-1.0, -1.0]), None, 0.5, prox=prox_disk,
              f=f, e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x), DISK_OPT, atol=1e-8)

    # identical to the hand-written gradient path
    res2 = pgm(jnp.asarray([-1.0, -1.0]), grad_f, 0.5, prox=prox_disk,
               e_rel=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res2.x),
                               rtol=1e-12)
    assert res.iterations == res2.iterations


def test_pgm_grad_none_multiblock_and_cache():
    """Multi-block jax.grad derivation; repeated solves reuse the
    compiled driver (the derived gradient is identity-stable)."""
    from proxmin_tpu.solvers.pgm import _PGM_CACHE

    def f2(x1, x2):
        return 0.5 * jnp.sum((x1 - 1.0) ** 2) + 0.5 * jnp.sum((x2 + 2.0) ** 2)

    r = pgm([jnp.zeros(2), jnp.zeros(3)], None, 0.9, f=f2, e_rel=1e-12,
            max_iter=500)
    np.testing.assert_allclose(np.asarray(r.x[0]), np.ones(2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r.x[1]), -2 * np.ones(3), atol=1e-8)

    n_entries = len(_PGM_CACHE._d)
    pgm([jnp.zeros(2), jnp.zeros(3)], None, 0.9, f=f2, e_rel=1e-12,
        max_iter=500)
    assert len(_PGM_CACHE._d) == n_entries


def test_pgm_grad_none_requires_f():
    with pytest.raises(AssertionError):
        pgm(jnp.zeros(2), None, 0.5)


def test_adaprox_grad_none_autodiff():
    from proxmin_tpu import adaprox

    res = adaprox(jnp.asarray([-1.0, -1.0]), None, 0.1, f=f,
                  e_rel=1e-8, max_iter=1000)
    np.testing.assert_allclose(np.asarray(res.x), CENTER, atol=1e-3)


def test_grad_from_f_memo_lru_bounded():
    """Review r2s3: the derived-gradient memo must not grow unboundedly
    when serving loops pass a fresh lambda per request."""
    from proxmin_tpu.solvers.common import (
        _GRAD_FROM_F, _GRAD_FROM_F_MAXSIZE, grad_from_f,
    )

    _GRAD_FROM_F.clear()
    fns = [(lambda i: (lambda x: 0.5 * jnp.sum((x - i) ** 2)))(i)
           for i in range(_GRAD_FROM_F_MAXSIZE + 8)]
    for fn in fns:
        grad_from_f(fn, 1)
    assert len(_GRAD_FROM_F) <= _GRAD_FROM_F_MAXSIZE
    # most-recent entries survive and stay identity-stable
    g1 = grad_from_f(fns[-1], 1)
    g2 = grad_from_f(fns[-1], 1)
    assert g1 is g2


def test_adaptive_restart_accelerates_fista(rng):
    """O'Donoghue-Candes adaptive restart (pgm(restart=True)): on an
    ill-conditioned strongly-convex quadratic, restarted FISTA reaches
    the fixed-point tolerance in fewer iterations than plain FISTA,
    which beats ISTA; restart=False stays bit-identical to before."""
    import proxmin_tpu as pt

    d = 64
    evals = np.logspace(-3, 0, d)
    Q = np.linalg.qr(rng.normal(size=(d, d)))[0]
    H = (Q * evals) @ Q.T
    H = jnp.asarray((H + H.T) / 2)
    c = jnp.asarray(rng.normal(size=d))

    def grad(x):
        return H @ (x - c)

    x0 = jnp.asarray(rng.normal(size=d))
    kw = dict(e_rel=1e-7, max_iter=5000)

    r_ista = pt.pgm(x0, grad, 1.0, **kw)
    r_fista = pt.pgm(x0, grad, 1.0, accelerated=True, **kw)
    r_restart = pt.pgm(x0, grad, 1.0, accelerated=True, restart=True,
                       **kw)
    # measured on this problem: restart converges in ~480 iterations
    # while BOTH plain FISTA (oscillating) and ISTA exhaust the full
    # 5000-iteration budget without reaching e_rel=1e-7
    assert r_restart.status == "converged"
    assert r_restart.iterations < 1000
    assert r_fista.status == "max_iter" and r_ista.status == "max_iter"

    # same optimum (x* = c on this unconstrained quadratic; the
    # fixed-point tolerance bounds the step residual, which the 1e3
    # condition number amplifies into ~1e-4 distance to the optimum)
    np.testing.assert_allclose(np.asarray(r_restart.x), np.asarray(c),
                               atol=1e-3)


def test_adaptive_restart_resume_exact(rng):
    """Kill-and-resume with restart=True walks the uninterrupted
    trajectory bit-exactly (the momentum clock, including its adaptive
    resets, rides in the carried state)."""
    import proxmin_tpu as pt
    from proxmin_tpu import operators

    d = 16
    H = jnp.asarray(np.diag(rng.uniform(0.01, 1.0, size=d)))
    c = jnp.asarray(rng.normal(size=d))

    def grad(x):
        return H @ (x - c)

    x0 = jnp.asarray(rng.normal(size=d))
    kw = dict(accelerated=True, restart=True, prox=operators.prox_plus,
              e_rel=0.0)
    full = pt.pgm(x0, grad, 1.0, max_iter=40, **kw)
    half = pt.pgm(x0, grad, 1.0, max_iter=17, **kw)
    res = pt.pgm(half.x, grad, 1.0, max_iter=23, state=half.state, **kw)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(full.x))
