"""Pure-functional solver factories: jit/vmap composition
(proxmin_tpu.functional)."""

import numpy as np
import jax
import jax.numpy as jnp

import proxmin_tpu as pt
from proxmin_tpu.functional import make_adaprox_solver, make_pgm_solver


CENTER = np.array([1.0, 0.5])


def prox_disk(x, step, r=0.5):
    nrm = jnp.sqrt(jnp.sum(x ** 2))
    return jnp.where(nrm > r, x * (r / nrm), x)


def test_functional_pgm_matches_driver():
    def grad(x):
        return x - jnp.asarray(CENTER)

    solve = jax.jit(make_pgm_solver(grad, 0.5, prox=prox_disk,
                                    accelerated=True, e_rel=1e-10,
                                    max_iter=300))
    x, it, conv, div = solve(jnp.asarray([-1.0, -1.0]))
    r = pt.pgm(jnp.asarray([-1.0, -1.0]), grad, 0.5, prox=prox_disk,
               accelerated=True, e_rel=1e-10, max_iter=300)
    np.testing.assert_allclose(np.asarray(x), np.asarray(r.x), rtol=1e-12)
    assert int(it) == r.iterations


def test_functional_pgm_vmap_batch_of_problems():
    """One compiled call solves a batch of independent problems; under
    vmap the while_loop masks finished lanes, so every lane equals its
    individual solve even though iteration counts differ."""
    centers = jnp.asarray(np.random.default_rng(3).normal(size=(16, 2)))

    def grad(x, c):
        return x - c

    def solve_one(x0, c):
        return make_pgm_solver(lambda x: grad(x, c), 0.3, prox=prox_disk,
                               e_rel=1e-11, max_iter=400)(x0)

    x0s = jnp.tile(jnp.asarray([-1.0, -1.0]), (16, 1))
    xs, its, convs, divs = jax.jit(jax.vmap(solve_one))(x0s, centers)

    assert len(set(np.asarray(its).tolist())) > 1  # genuinely different
    for i in range(16):
        xi, iti, _, _ = jax.jit(solve_one)(x0s[i], centers[i])
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xi),
                                   rtol=1e-12)
        assert int(its[i]) == int(iti)


def test_functional_pgm_grad_none():
    def f(x):
        return 0.5 * jnp.sum((x - jnp.asarray(CENTER)) ** 2)

    solve = make_pgm_solver(None, 0.5, f=f, e_rel=1e-10, max_iter=500)
    x, it, conv, div = jax.jit(solve)(jnp.asarray([-1.0, -1.0]))
    np.testing.assert_allclose(np.asarray(x), CENTER, atol=1e-8)


def test_functional_adaprox_matches_driver():
    def grad(x):
        return x - jnp.asarray(CENTER)

    solve = jax.jit(make_adaprox_solver(grad, 0.1, scheme="amsgrad",
                                        e_rel=1e-8, max_iter=600))
    x, M, V, Vhat, it, conv, div = solve(jnp.asarray([-1.0, -1.0]))
    r = pt.adaprox(jnp.asarray([-1.0, -1.0]), grad, 0.1, scheme="amsgrad",
                   e_rel=1e-8, max_iter=600)
    np.testing.assert_allclose(np.asarray(x), np.asarray(r.x), rtol=1e-12)
    assert int(it) == r.iterations
    np.testing.assert_allclose(np.asarray(M[0]), np.asarray(r.M[0]),
                               rtol=1e-12)


def test_functional_adaprox_vmap():
    rng = np.random.default_rng(7)
    centers = jnp.asarray(rng.normal(size=(8, 3)))

    def solve_one(x0, c):
        return make_adaprox_solver(lambda x: x - c, 0.2, scheme="adam",
                                   e_rel=1e-9, max_iter=800)(x0)

    x0s = jnp.zeros((8, 3))
    xs, *_ = jax.jit(jax.vmap(solve_one))(x0s, centers)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(centers),
                               atol=1e-4)


def test_functional_adaprox_validates_b1_schedule():
    """A short b1 schedule must raise, matching the adaprox driver
    (JAX would otherwise silently clamp the out-of-bounds gather)."""
    import pytest

    with pytest.raises(AssertionError):
        make_adaprox_solver(lambda x: x, 0.1,
                            b1=np.linspace(0.9, 0.5, 100), max_iter=1000)


def test_implicit_diff_interior_and_boundary():
    """Implicit differentiation at the fixed point matches analytic and
    finite-difference gradients, inside and on the constraint boundary."""
    from proxmin_tpu.functional import make_differentiable_pgm_solver

    def grad(x, theta):
        return x - theta

    def prox_disk(z, step, r=0.5):
        nrm = jnp.sqrt(jnp.sum(z ** 2))
        return jnp.where(nrm > r, z * (r / nrm), z)

    solve = make_differentiable_pgm_solver(grad, 0.7, prox=prox_disk)
    w = jnp.asarray([1.0, 2.0])

    def loss(theta):
        return jnp.sum(solve(jnp.zeros(2), theta)[0] * w)

    # interior: x* = theta -> dloss/dtheta = w
    g = jax.grad(loss)(jnp.asarray([0.1, 0.2]))
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)

    # boundary: x* = r theta/||theta|| -> compare to finite differences
    th = jnp.asarray([1.0, 0.7])
    g = jax.grad(loss)(th)
    eps = 1e-6
    fd = [(loss(th + eps * jnp.eye(2)[i]) - loss(th - eps * jnp.eye(2)[i]))
          / (2 * eps) for i in range(2)]
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), atol=1e-5)


def test_implicit_diff_composes_with_jit_vmap():
    from proxmin_tpu.functional import make_differentiable_pgm_solver

    def grad(x, theta):
        return 2.0 * (x - theta)

    solve = make_differentiable_pgm_solver(grad, 0.4)

    def loss(theta):
        return jnp.sum(solve(jnp.zeros(3), theta)[0] ** 2)

    ths = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    gs = jax.jit(jax.vmap(jax.grad(loss)))(ths)
    # unconstrained: x* = theta -> dloss/dtheta = 2 theta
    np.testing.assert_allclose(np.asarray(gs), 2 * np.asarray(ths),
                               atol=1e-6)


def test_implicit_diff_hyperparameter_learning():
    """Bilevel flavor: gradient-descend an outer loss over the inner
    solve's data parameter — the classic use of a differentiable layer."""
    from proxmin_tpu.functional import make_differentiable_pgm_solver

    target = jnp.asarray([0.3, -0.1, 0.4])

    def grad(x, theta):
        return x - theta

    def prox_plus(z, step):
        return jnp.maximum(z, 0)

    solve = make_differentiable_pgm_solver(grad, 0.8, prox=prox_plus)

    def outer(theta):
        return 0.5 * jnp.sum((solve(jnp.zeros(3), theta)[0] - target) ** 2)

    theta = jnp.zeros(3)
    outer_grad = jax.jit(jax.grad(outer))
    for _ in range(200):
        theta = theta - 0.5 * outer_grad(theta)
    x_final, conv = solve(jnp.zeros(3), theta)
    assert bool(conv)
    # the nonneg targets are reachable; the negative one clamps to 0
    np.testing.assert_allclose(np.asarray(x_final),
                               np.maximum(np.asarray(target), 0), atol=1e-4)


def test_implicit_diff_learns_regularization_strength():
    """prox_params=True: gradients flow through the regularizer — learn
    the soft-threshold strength lam that best reconstructs a sparse
    signal (the canonical bilevel use of a differentiable solver)."""
    from proxmin_tpu import operators
    from proxmin_tpu.functional import make_differentiable_pgm_solver

    rng = np.random.default_rng(5)
    truth = jnp.asarray([0.0, 0.0, 1.0, 0.0, -0.7, 0.0, 0.4, 0.0])
    y = truth + 0.05 * jnp.asarray(rng.standard_normal(8))

    def grad(x, lam):
        return x - y

    def prox(z, step, lam):
        # softplus keeps lam positive and smooth for the outer gradient
        return operators.prox_soft(z, step, thresh=jax.nn.softplus(lam))

    solve = make_differentiable_pgm_solver(grad, 0.9, prox=prox,
                                           prox_params=True)

    def outer(lam):
        return 0.5 * jnp.sum((solve(jnp.zeros(8), lam)[0] - truth) ** 2)

    lam = jnp.asarray(-3.0)   # softplus(-3) ~ 0.049: too weak
    og = jax.jit(jax.grad(outer))
    l0 = float(outer(lam))
    for _ in range(300):
        lam = lam - 0.5 * og(lam)
    l1 = float(outer(lam))
    assert l1 < 0.7 * l0, (l0, l1)  # outer loss meaningfully reduced
    # the finite-difference check on the learned point
    eps = 1e-4
    fd = (outer(lam + eps) - outer(lam - eps)) / (2 * eps)
    np.testing.assert_allclose(float(jax.grad(outer)(lam)), float(fd),
                               atol=1e-4)


def test_implicit_diff_multiblock_pytree_exact():
    """Pytree iterates: a coupled two-block problem with known joint
    Hessian — the implicit gradient matches the analytic H^{-1} ground
    truth to machine precision.

    (A ridge-regularized NMF variant was tried and rejected: the
    bilinear structure leaves the JOINT Hessian singular at generic
    minima even with a ridge — min eig ~1e-16 measured — so the
    solution-map derivative does not exist there and neither finite
    differences nor the IFT is well-defined; see the factory docstring's
    non-degeneracy requirement.)"""
    from proxmin_tpu.functional import make_differentiable_pgm_solver

    rng = np.random.default_rng(0)
    na, ns = 3, 4
    M = rng.standard_normal((na + ns, na + ns))
    H = jnp.asarray(M @ M.T + 0.5 * np.eye(na + ns))  # SPD joint Hessian
    Pa, Rb, Qc = H[:na, :na], H[:na, na:], H[na:, na:]

    def grad(x, theta):
        a, s = x
        return (Pa @ a + Rb @ s - theta[:na],
                Rb.T @ a + Qc @ s - theta[na:])

    L = float(jnp.linalg.eigvalsh(H)[-1])
    solve = make_differentiable_pgm_solver(grad, 0.9 / L, e_rel=1e-13,
                                           max_iter=20000,
                                           vjp_rtol=1e-13)

    w_a = jnp.asarray(rng.standard_normal(na))
    w_s = jnp.asarray(rng.standard_normal(ns))

    def loss(theta):
        (a, s), _ = solve((jnp.zeros(na), jnp.zeros(ns)), theta)
        return jnp.dot(a, w_a) + jnp.dot(s, w_s)

    theta = jnp.asarray(rng.standard_normal(na + ns))
    g = jax.grad(loss)(theta)
    # x* = H^{-1} theta  ->  dloss/dtheta = H^{-1} [w_a; w_s]
    gt = jnp.linalg.solve(H, jnp.concatenate([w_a, w_s]))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gt), atol=1e-10)


def test_implicit_diff_ill_conditioned_adjoint_converges():
    """Review r2s3: a fixed 100-step Neumann sum gave a 40% gradient
    error at condition number 100; the residual-stopped adjoint must
    adapt its iteration count and return the true gradient."""
    from proxmin_tpu.functional import make_differentiable_pgm_solver

    h = jnp.asarray([1.0, 1e-2])  # condition number 100

    def grad(x, theta):
        return h * x - theta

    solve = make_differentiable_pgm_solver(grad, 0.9, max_iter=10000)

    def loss(theta):
        x, conv = solve(jnp.zeros(2), theta)
        return jnp.sum(x)

    g = jax.grad(loss)(jnp.asarray([0.3, 0.4]))
    # x* = theta / h  ->  dloss/dtheta = 1 / h = [1, 100]
    np.testing.assert_allclose(np.asarray(g), [1.0, 100.0], rtol=1e-6)


def test_make_nmf_solver_vmap_patchwise():
    """Batch NMF: vmap factorizes a grid of patch problems in one call,
    each lane matching its individual solve."""
    from proxmin_tpu.functional import make_nmf_solver

    rng = np.random.default_rng(3)
    B, C, K, N = 6, 4, 2, 32
    Ys = jnp.asarray(rng.random((B, C, K)) @ rng.random((B, K, N)))
    A0s = jnp.asarray(rng.random((B, C, K)))
    S0s = jnp.asarray(rng.random((B, K, N)))

    solve = make_nmf_solver(e_rel=1e-6, max_iter=400)
    As, Ss, its, convs = jax.jit(jax.vmap(solve))(A0s, S0s, Ys)

    for b in (0, B - 1):
        Ab, Sb, itb, convb = jax.jit(solve)(A0s[b], S0s[b], Ys[b])
        np.testing.assert_allclose(np.asarray(As[b]), np.asarray(Ab),
                                   rtol=1e-10)
        assert int(its[b]) == int(itb)

    # lanes reduce their loss substantially
    from proxmin_tpu.nmf import log_likelihood
    for b in range(B):
        l0 = float(log_likelihood(A0s[b], S0s[b], Y=Ys[b]))
        l1 = float(log_likelihood(As[b], Ss[b], Y=Ys[b]))
        assert l1 < 0.5 * l0  # nonconvex lanes can plateau; all descend


def test_functional_admm_matches_driver():
    from proxmin_tpu.functional import make_admm_solver

    def prox_f(v, step):
        return (v + step * jnp.asarray(CENTER)) / (1.0 + step)

    solve = jax.jit(make_admm_solver(prox_f, 0.5, prox_g=prox_disk,
                                     e_rel=1e-8, max_iter=500))
    x, it, conv, errors = solve(jnp.asarray([-1.0, -1.0]))
    r = pt.admm(jnp.asarray([-1.0, -1.0]), prox_f, 0.5, prox_g=prox_disk,
                e_rel=1e-8, max_iter=500)
    np.testing.assert_allclose(np.asarray(x), np.asarray(r.x), rtol=1e-12)
    assert int(it) == r.iterations
    assert bool(conv) == r.converged
    assert errors.shape == (1, 4)


def test_functional_admm_vmap_tv_denoise_batch():
    """A batch of 1-D TV-denoise problems (quadratic fidelity + soft
    threshold on first differences through the difference operator L) in
    ONE compiled call; every lane equals its individual solve."""
    from proxmin_tpu.functional import make_admm_solver

    rng = np.random.default_rng(7)
    B, n = 8, 32
    ys = jnp.asarray(np.cumsum(rng.normal(size=(B, n)), axis=1)
                     + 0.3 * rng.normal(size=(B, n)))
    D = jnp.asarray(np.eye(n)[1:] - np.eye(n)[:-1])  # (n-1, n) differences

    def prox_tv(v, step):
        from proxmin_tpu import operators
        return operators.prox_soft(v, step, thresh=0.5)

    def solve_one(x0, y):
        def prox_f(v, step, _y=y):
            return (v + step * _y) / (1.0 + step)

        return make_admm_solver(prox_f, 0.4, prox_g=prox_tv, L=D,
                                e_rel=1e-9, max_iter=600)(x0)

    xs, its, convs, _ = jax.jit(jax.vmap(solve_one))(ys, ys)

    assert len(set(np.asarray(its).tolist())) > 1  # genuinely different
    for b in (0, 3, B - 1):
        xb, itb, convb, _ = jax.jit(solve_one)(ys[b], ys[b])
        np.testing.assert_allclose(np.asarray(xs[b]), np.asarray(xb),
                                   rtol=1e-11, atol=1e-12)
        assert int(its[b]) == int(itb)


def test_functional_sdmm_matches_driver_and_vmap():
    from proxmin_tpu.functional import make_sdmm_solver

    def prox_halfplane(v, step):
        return v.at[0].set(jnp.maximum(v[0], 0.15))

    centers = jnp.asarray(np.random.default_rng(11).normal(size=(6, 2)))

    def solve_one(x0, c):
        def prox_f(v, step, _c=c):
            return (v + step * _c) / (1.0 + step)

        return make_sdmm_solver(prox_f, 0.5,
                                proxs_g=[prox_disk, prox_halfplane],
                                e_rel=1e-9, max_iter=800)(x0)

    # single-problem parity vs the sdmm driver
    c0 = jnp.asarray(CENTER)
    x, it, conv, errors = jax.jit(solve_one)(jnp.asarray([-1.0, -1.0]), c0)

    def prox_f0(v, step):
        return (v + step * c0) / (1.0 + step)

    r = pt.sdmm(jnp.asarray([-1.0, -1.0]), prox_f0, 0.5,
                proxs_g=[prox_disk, prox_halfplane], e_rel=1e-9,
                max_iter=800)
    np.testing.assert_allclose(np.asarray(x), np.asarray(r.x), rtol=1e-12)
    assert int(it) == r.iterations
    assert errors.shape == (2, 4)

    # vmapped batch equals per-lane solves
    x0s = jnp.tile(jnp.asarray([-1.0, -1.0]), (6, 1))
    xs, its, convs, _ = jax.jit(jax.vmap(solve_one))(x0s, centers)
    for b in (0, 5):
        xb, itb, _, _ = jax.jit(solve_one)(x0s[b], centers[b])
        np.testing.assert_allclose(np.asarray(xs[b]), np.asarray(xb),
                                   rtol=1e-11, atol=1e-12)
        assert int(its[b]) == int(itb)


def test_functional_bsdmm_matches_driver_and_vmap():
    from proxmin_tpu.functional import make_bsdmm_solver

    c1 = np.array([1.0, -0.5])
    c2 = np.array([0.2, 0.8, -0.1])

    def proxs_f(x, step, Xs=None, j=None):
        c = jnp.asarray([c1, c2][j])
        return (x + step * c) / (1 + step)

    def steps(Xs, j=None):
        return 0.4

    def pg(v, step):
        return jnp.maximum(v, 0)

    solve = make_bsdmm_solver(proxs_f, steps, proxs_g=[[pg], [pg, pg]],
                              e_rel=1e-9, max_iter=200)
    xs, it, conv = jax.jit(solve)(jnp.zeros(2), jnp.zeros(3))
    r = pt.bsdmm([jnp.zeros(2), jnp.zeros(3)], proxs_f, steps,
                 proxs_g=[[pg], [pg, pg]], e_rel=1e-9, max_iter=200)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(r.x[0]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xs[1]), np.asarray(r.x[1]),
                               rtol=1e-12)
    assert int(it) == r.iterations

    # vmap: batch over scaled block targets, each lane = individual solve
    scales = jnp.asarray([0.5, 1.0, 1.7, 2.4])

    def solve_one(s):
        def pf(x, step, Xs=None, j=None, _s=s):
            c = _s * jnp.asarray([c1, c2][j])
            return (x + step * c) / (1 + step)

        return make_bsdmm_solver(pf, steps, proxs_g=[[pg], [pg, pg]],
                                 e_rel=1e-9, max_iter=200)(
            jnp.zeros(2), jnp.zeros(3))

    xsb, itsb, convsb = jax.jit(jax.vmap(solve_one))(scales)
    for b in (0, 3):
        xb, itb, _ = jax.jit(solve_one)(scales[b])
        np.testing.assert_allclose(np.asarray(xsb[0][b]),
                                   np.asarray(xb[0]), rtol=1e-11)
        np.testing.assert_allclose(np.asarray(xsb[1][b]),
                                   np.asarray(xb[1]), rtol=1e-11)
        assert int(itsb[b]) == int(itb)


def test_make_nmf_solver_weighted_vmap():
    """Weighted batch NMF: vmap over per-patch (Y, W) problems in one
    compiled call, each lane equal to its individual solve and
    descending the weighted loss."""
    from proxmin_tpu.functional import make_nmf_solver
    from proxmin_tpu.nmf import log_likelihood

    rng = np.random.default_rng(9)
    B, C, K, N = 5, 4, 2, 48
    Ys = jnp.asarray(rng.random((B, C, K)) @ rng.random((B, K, N)))
    Ws = jnp.asarray(0.5 + rng.random((B, C, N)))
    A0s = jnp.asarray(rng.random((B, C, K)))
    S0s = jnp.asarray(rng.random((B, K, N)))

    solve = make_nmf_solver(e_rel=1e-6, max_iter=300, weighted=True)
    As, Ss, its, convs = jax.jit(jax.vmap(solve))(A0s, S0s, Ys, Ws)

    for b in (0, B - 1):
        Ab, Sb, itb, _ = jax.jit(solve)(A0s[b], S0s[b], Ys[b], Ws[b])
        np.testing.assert_allclose(np.asarray(As[b]), np.asarray(Ab),
                                   rtol=1e-10)
        assert int(its[b]) == int(itb)

    for b in range(B):
        l0 = float(log_likelihood(A0s[b], S0s[b], Y=Ys[b], W=Ws[b]))
        l1 = float(log_likelihood(As[b], Ss[b], Y=Ys[b], W=Ws[b]))
        assert l1 < 0.1 * l0


def test_implicit_diff_admm_gradient_vs_finite_differences():
    """Differentiable ADMM: d(solution)/d(theta) via the implicit VJP
    matches central finite differences on a strongly-convex quadratic
    with a soft-threshold constraint through a difference operator."""
    from proxmin_tpu.functional import make_differentiable_admm_solver
    from proxmin_tpu import operators

    n = 12
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(size=n))
    D = jnp.asarray(np.eye(n)[1:] - np.eye(n)[:-1])

    def prox_f(v, step, theta):
        # f(x) = 0.5||x - (y + theta)||^2 -> strongly convex
        return (v + step * (y + theta)) / (1.0 + step)

    def prox_g(v, step, theta):
        return operators.prox_soft(v, step, thresh=0.3)

    solve = make_differentiable_admm_solver(
        prox_f, 0.5, prox_g, L=D, e_rel=1e-12, max_iter=20000,
        vjp_rtol=1e-12, prox_params=True)

    def loss(theta):
        x, conv = solve(jnp.zeros(n), theta)
        return jnp.sum(x ** 3)  # nonlinear readout exercises the VJP

    theta0 = jnp.asarray(rng.normal(size=n) * 0.1)
    x0, conv = solve(jnp.zeros(n), theta0)
    assert bool(conv)

    g = jax.grad(loss)(theta0)
    # central finite differences on a few coordinates
    eps = 1e-5
    for i in (0, 5, n - 1):
        e = jnp.zeros(n).at[i].set(eps)
        fd = (float(loss(theta0 + e)) - float(loss(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-4, atol=1e-7)


def test_implicit_diff_admm_learns_regularizer():
    """Learn a soft-threshold strength through the differentiable ADMM:
    gradient descent on lambda recovers a better fit to a clean target
    than the initial guess."""
    from proxmin_tpu.functional import make_differentiable_admm_solver
    from proxmin_tpu import operators

    n = 32
    rng = np.random.default_rng(12)
    truth = jnp.asarray(np.repeat(rng.normal(size=4), n // 4))
    y = truth + 0.2 * jnp.asarray(rng.normal(size=n))
    D = jnp.asarray(np.eye(n)[1:] - np.eye(n)[:-1])

    def prox_f(v, step, lam):
        return (v + step * y) / (1.0 + step)

    def prox_g(v, step, lam):
        # softplus keeps the threshold positive and differentiable
        return operators.prox_soft(v, step, thresh=jax.nn.softplus(lam))

    solve = make_differentiable_admm_solver(
        prox_f, 0.5, prox_g, L=D, e_rel=1e-10, max_iter=20000,
        vjp_rtol=1e-10, prox_params=True)

    def objective(lam):
        x, _ = solve(y, lam)
        return jnp.mean((x - truth) ** 2)

    lam = jnp.asarray(-3.0)    # ~no regularization
    mse0 = float(objective(lam))
    for _ in range(60):
        lam = lam - 20.0 * jax.grad(objective)(lam)
    mse1 = float(objective(lam))
    # descends to the landscape's optimum (lam ~ -0.56, mse ~ 0.0078
    # from 0.021 — a 2.7x fit improvement over the unregularized start)
    assert mse1 < 0.5 * mse0


def test_implicit_diff_sdmm_gradient_vs_finite_differences():
    """Differentiable SDMM (VERDICT r3 item 6): d(solution)/d(theta) via
    the implicit VJP matches central finite differences on a
    strongly-convex quadratic under TWO simultaneous constraints (a
    soft-threshold through a difference operator + a non-negativity
    projection)."""
    from proxmin_tpu.functional import make_differentiable_sdmm_solver
    from proxmin_tpu import operators

    n = 12
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(size=n))
    D = jnp.asarray(np.eye(n)[1:] - np.eye(n)[:-1])

    def prox_f(v, step, theta):
        # f(x) = 0.5||x - (y + theta)||^2 -> strongly convex
        return (v + step * (y + theta)) / (1.0 + step)

    def prox_g1(v, step, theta):
        return operators.prox_soft(v, step, thresh=0.2)

    def prox_g2(v, step, theta):
        return operators.prox_plus(v, step)

    solve = make_differentiable_sdmm_solver(
        prox_f, 0.5, (prox_g1, prox_g2), Ls=[D, None],
        e_rel=1e-12, max_iter=20000, vjp_rtol=1e-12, prox_params=True)

    def loss(theta):
        x, conv = solve(jnp.zeros(n), theta)
        return jnp.sum(x ** 3)

    theta0 = jnp.asarray(rng.normal(size=n) * 0.1)
    x0, conv = solve(jnp.zeros(n), theta0)
    assert bool(conv)

    g = jax.grad(loss)(theta0)
    eps = 1e-5
    for i in (0, 5, n - 1):
        e = jnp.zeros(n).at[i].set(eps)
        fd = (float(loss(theta0 + e)) - float(loss(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-4, atol=1e-7)


def test_implicit_diff_bsdmm_gradient_vs_finite_differences():
    """Differentiable bSDMM (VERDICT r3 item 6): two coupled
    strongly-convex blocks (quadratic with a cross-block coupling, so
    the joint fixed point is locally unique, unlike bilinear CMF), one
    block soft-thresholded — the implicit VJP through the Gauss–Seidel
    sweep matches central finite differences."""
    from proxmin_tpu.functional import make_differentiable_bsdmm_solver
    from proxmin_tpu import operators

    n = 10
    alpha = 0.5
    rng = np.random.default_rng(11)
    t1 = jnp.asarray(rng.normal(size=n))
    t2 = jnp.asarray(rng.normal(size=n))

    # f = 0.5||x1 - (t1+theta)||^2 + 0.5||x2 - t2||^2
    #     + 0.5*alpha*||x1 - x2||^2  (jointly strongly convex)
    def proxs_f(v, step, theta, Xs=None, j=None):
        other = Xs[1 - j]
        target = (t1 + theta) if j == 0 else t2
        return (v + step * (target + alpha * other)) / \
            (1.0 + step * (1.0 + alpha))

    def prox_g(v, step, theta):
        return operators.prox_soft(v, step, thresh=0.15)

    solve = make_differentiable_bsdmm_solver(
        proxs_f, 0.4, proxs_g=[[prox_g], None],
        e_rel=1e-12, max_iter=30000, vjp_rtol=1e-12, prox_params=True)

    def loss(theta):
        (x1, x2), conv = solve((jnp.zeros(n), jnp.zeros(n)), theta)
        return jnp.sum(x1 ** 3) + jnp.sum(x1 * x2)

    theta0 = jnp.asarray(rng.normal(size=n) * 0.1)
    _, conv = solve((jnp.zeros(n), jnp.zeros(n)), theta0)
    assert bool(conv)

    g = jax.grad(loss)(theta0)
    eps = 1e-5
    for i in (0, 4, n - 1):
        e = jnp.zeros(n).at[i].set(eps)
        fd = (float(loss(theta0 + e)) - float(loss(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-4, atol=1e-7)


def test_differentiable_sdmm_matches_host_sdmm_forward():
    """The differentiable SDMM forward pass lands on the same fixed
    point as the host sdmm driver (fixed steps, same constraints)."""
    from proxmin_tpu.functional import make_differentiable_sdmm_solver
    from proxmin_tpu import operators

    n = 8
    rng = np.random.default_rng(3)
    y = rng.normal(size=n)

    def prox_f(v, step):
        return (v + step * jnp.asarray(y)) / (1.0 + step)

    proxs_g = [operators.prox_plus,
               lambda v, s: operators.prox_max(v, s, thresh=1.0)]

    solve = make_differentiable_sdmm_solver(
        prox_f, 0.5, proxs_g, Ls=[None, None],
        e_rel=1e-13, max_iter=50000)
    x_d, conv = solve(jnp.zeros(n))
    assert bool(conv)

    res = pt.sdmm(jnp.zeros(n), prox_f, 0.5, proxs_g=proxs_g,
                  Ls=[None, None], e_rel=1e-12, max_iter=50000)
    np.testing.assert_allclose(np.asarray(x_d), np.asarray(res.x),
                               rtol=1e-6, atol=1e-8)


def test_implicit_diff_adaprox_gradient_vs_finite_differences():
    """Differentiable AdaProx: Adam forward trajectory, PGM-condition
    backward — d(solution)/d(theta) matches central finite differences
    on a strongly-convex quadratic with a soft-threshold prox."""
    from proxmin_tpu.functional import make_differentiable_adaprox_solver
    from proxmin_tpu import operators

    n = 10
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.normal(size=n))

    def grad(x, theta):
        return x - (y + theta)          # f = 0.5||x - (y+theta)||^2

    def prox(z, step):
        return operators.prox_soft(z, step, thresh=0.25)

    solve = make_differentiable_adaprox_solver(
        grad, 0.5, prox=prox, e_rel=1e-12, max_iter=50000,
        vjp_rtol=1e-12)

    def loss(theta):
        x, conv = solve(jnp.zeros(n), theta)
        return jnp.sum(x ** 3)

    theta0 = jnp.asarray(rng.normal(size=n) * 0.1)
    x0, conv = solve(jnp.zeros(n), theta0)
    assert bool(conv)

    g = jax.grad(loss)(theta0)
    eps = 1e-5
    for i in (0, 4, n - 1):
        e = jnp.zeros(n).at[i].set(eps)
        fd = (float(loss(theta0 + e)) - float(loss(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-4, atol=1e-7)


def test_differentiable_adaprox_matches_pgm_solution():
    """The Adam forward pass lands on the same fixed point the PGM
    forward pass does (shared solution set of the scaled/unscaled
    proximal maps), including through a prox_params constraint."""
    from proxmin_tpu.functional import (
        make_differentiable_adaprox_solver, make_differentiable_pgm_solver,
    )
    from proxmin_tpu import operators

    n = 8
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=n))

    def grad(x, theta):
        return 2.0 * (x - y) + theta    # L = 2

    def prox(z, step, theta):
        return operators.prox_plus(z, step)

    s_ada = make_differentiable_adaprox_solver(
        grad, 0.4, prox=prox, e_rel=1e-12, max_iter=50000,
        prox_params=True)
    s_pgm = make_differentiable_pgm_solver(
        grad, 0.4, prox=prox, e_rel=1e-12, max_iter=50000,
        prox_params=True)

    theta0 = jnp.asarray(rng.normal(size=n) * 0.3)
    xa, ca = s_ada(jnp.zeros(n), theta0)
    xp, cp = s_pgm(jnp.zeros(n), theta0)
    assert bool(ca) and bool(cp)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xp),
                               rtol=1e-7, atol=1e-9)

    # and both gradients agree (same solution map)
    ga = jax.grad(lambda t: jnp.sum(s_ada(jnp.zeros(n), t)[0] ** 2))(theta0)
    gp = jax.grad(lambda t: jnp.sum(s_pgm(jnp.zeros(n), t)[0] ** 2))(theta0)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gp),
                               rtol=1e-5, atol=1e-8)
