"""Randomized resume property sweep: for random solver families,
configurations, and kill points, a killed-and-resumed solve must equal
the uninterrupted one BIT-EXACTLY.

Complements the targeted resume tests (`test_resume.py`) with broad
configuration coverage — every trial draws the solver config and the
preemption iteration at random, so stride-boundary kills, first-segment
kills, momentum-phase kills etc. are all hit over the sweep. (The
round-4 review found exactly such a config-dependent hole: fixed-stride
resume diverged only when the kill landed ON a refresh boundary.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

import proxmin_tpu as pt
from proxmin_tpu import operators
from proxmin_tpu.nmf import nmf


def _same(a, b, label):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                  err_msg=label)


@pytest.mark.parametrize("trial", range(10))
def test_pgm_resume_random_configs(trial):
    rng = np.random.default_rng(3000 + trial)
    H = np.diag(rng.uniform(0.05, 1.0, size=4))
    c = rng.normal(size=4)

    def grad(x):
        return jnp.asarray(H) @ (x - jnp.asarray(c))

    accelerated = bool(rng.integers(0, 2))
    restart = accelerated and bool(rng.integers(0, 2))
    use_bb = bool(rng.integers(0, 2))
    step = (pt.utils.BarzilaiBorweinStepper(type=int(rng.integers(1, 3)),
                                            init_r=0.1)
            if use_bb else float(rng.uniform(0.3, 0.9)))
    prox = operators.prox_plus if rng.integers(0, 2) else None
    total = int(rng.integers(8, 40))
    k = int(rng.integers(1, total))
    kw = dict(accelerated=accelerated, restart=restart, prox=prox,
              e_rel=0.0)
    x0 = jnp.asarray(rng.normal(size=4))

    full = pt.pgm(x0, grad, step, max_iter=total, **kw)
    half = pt.pgm(x0, grad, step, max_iter=k, **kw)
    res = pt.pgm(half.x, grad, step, max_iter=total - k,
                 state=half.state, **kw)
    _same(res.x, full.x,
          f"pgm acc={accelerated} restart={restart} bb={use_bb} "
          f"k={k}/{total}")


@pytest.mark.parametrize("trial", range(8))
def test_adaprox_resume_random_configs(trial):
    rng = np.random.default_rng(4000 + trial)
    H = np.diag(rng.uniform(0.05, 1.0, size=4))
    c = rng.normal(size=4)

    def grad(x):
        return jnp.asarray(H) @ (x - jnp.asarray(c))

    scheme = ["adam", "nadam", "amsgrad", "padam", "adamx",
              "radam"][int(rng.integers(0, 6))]
    total = int(rng.integers(8, 40))
    k = int(rng.integers(1, total))
    kw = dict(scheme=scheme, prox=operators.prox_plus,
              check_convergence=False)
    x0 = jnp.asarray(rng.normal(size=4))
    alpha = float(rng.uniform(0.05, 0.3))

    full = pt.adaprox(x0, grad, alpha, max_iter=total, **kw)
    half = pt.adaprox(x0, grad, alpha, max_iter=k, **kw)
    res = pt.adaprox(half.x, grad, alpha, max_iter=total - k,
                     state=half.state, **kw)
    _same(res.x, full.x, f"adaprox {scheme} k={k}/{total}")


@pytest.mark.parametrize("trial", range(8))
def test_nmf_resume_random_configs(trial):
    """nmf()-level: random algorithm / weighting / stride config /
    kill point."""
    rng = np.random.default_rng(5000 + trial)
    C, K, N = 4, 3, int(rng.integers(32, 96))
    Y = rng.random((C, K)) @ rng.random((K, N)) \
        + 0.01 * rng.standard_normal((C, N))
    A0, S0 = rng.random((C, K)), rng.random((K, N))
    weighted = bool(rng.integers(0, 2))
    W = (rng.random((C, N)) + 0.5) if weighted else 1
    algorithm = ["pgm", "adaprox", "bsdmm"][int(rng.integers(0, 3))]
    stride_mode = int(rng.integers(0, 3))  # 0: none, 1: fixed, 2: adapt
    kw = dict(algorithm=algorithm, W=W, e_rel=0.0)
    if algorithm == "bsdmm" and not weighted and stride_mode == 2:
        stride_mode = 1  # unweighted bsdmm supports fixed strides only
    if stride_mode == 1:
        kw["step_stride"] = int(rng.integers(2, 8))
    elif stride_mode == 2:
        kw["step_adapt"] = True
    total = int(rng.integers(10, 40))
    k = int(rng.integers(1, total))

    def run(a, s, n_iter, state=None):
        return nmf(Y, jnp.asarray(a), jnp.asarray(s), max_iter=n_iter,
                   **({} if state is None else {"state": state}), **kw)

    full = run(A0, S0, total)
    half = run(A0, S0, k)
    res = run(half.x[0], half.x[1], total - k, state=half.state)
    label = (f"nmf {algorithm} weighted={weighted} "
             f"stride_mode={stride_mode} k={k}/{total}")
    _same(res.x[0], full.x[0], label)
    _same(res.x[1], full.x[1], label)


@pytest.mark.parametrize("trial", range(6))
def test_nmf_resume_random_configs_tolerance(trial):
    """Like test_nmf_resume_random_configs but with e_rel > 0 drawn at
    random, so convergence (and the terminal-flag carry) actually
    engages: kills can land before, on, or after the stop."""
    rng = np.random.default_rng(5500 + trial)
    C, K, N = 4, 3, int(rng.integers(32, 96))
    A_t, S_t = rng.random((C, K)), rng.random((K, N))
    Y = A_t @ S_t + rng.choice([0.0, 0.01]) * rng.standard_normal((C, N))
    if rng.integers(0, 2):
        A0 = np.abs(A_t * (1 + 0.2 * rng.standard_normal((C, K))))
        S0 = np.abs(S_t * (1 + 0.2 * rng.standard_normal((K, N))))
    else:
        A0, S0 = rng.random((C, K)), rng.random((K, N))
    weighted = bool(rng.integers(0, 2))
    W = (rng.random((C, N)) + 0.5) if weighted else 1
    algorithm = ["pgm", "adaprox", "bsdmm"][int(rng.integers(0, 3))]
    stride_mode = int(rng.integers(0, 3))
    kw = dict(algorithm=algorithm, W=W,
              e_rel=float(rng.choice([1e-3, 1e-2, 5e-2])))
    if algorithm == "bsdmm" and not weighted and stride_mode == 2:
        stride_mode = 1
    if stride_mode == 1:
        kw["step_stride"] = int(rng.integers(2, 8))
    elif stride_mode == 2:
        kw["step_adapt"] = True
    total = int(rng.integers(12, 60))
    k = int(rng.integers(1, total))

    def run(a, s, n_iter, state=None):
        return nmf(Y, jnp.asarray(a), jnp.asarray(s), max_iter=n_iter,
                   **({} if state is None else {"state": state}), **kw)

    full = run(A0, S0, total)
    half = run(A0, S0, k)
    res = run(half.x[0], half.x[1], total - k, state=half.state)
    label = (f"nmf-tol {algorithm} weighted={weighted} "
             f"stride_mode={stride_mode} e_rel={kw['e_rel']} "
             f"k={k}/{total}")
    _same(res.x[0], full.x[0], label)
    _same(res.x[1], full.x[1], label)


@pytest.mark.parametrize("trial", range(6))
def test_admm_family_resume_random_configs(trial):
    rng = np.random.default_rng(6000 + trial)
    B = rng.standard_normal((3, 8))

    def prox_f(x, step):
        return (x + step * jnp.asarray(B)) / (1.0 + step)

    family = ["admm", "sdmm"][int(rng.integers(0, 2))]
    adapt = bool(rng.integers(0, 2))
    total = int(rng.integers(10, 40))
    k = int(rng.integers(1, total))
    x0 = jnp.zeros((3, 8))
    step_f = float(rng.uniform(0.3, 1.0))

    if family == "admm":
        kw = dict(prox_g=operators.prox_plus, adapt_step=adapt,
                  e_rel=1e-14)
        solver = pt.admm
    else:
        kw = dict(proxs_g=[operators.prox_plus, operators.prox_max],
                  adapt_step=adapt, e_rel=1e-14)
        solver = pt.sdmm

    full = solver(x0, prox_f, step_f, max_iter=total, **kw)
    half = solver(x0, prox_f, step_f, max_iter=k, **kw)
    res = solver(half.x, prox_f, step_f, max_iter=total - k,
                 state=half.state, **kw)
    _same(res.x, full.x, f"{family} adapt={adapt} k={k}/{total}")


@pytest.mark.parametrize("trial", range(6))
def test_pgm_resume_after_convergence_random(trial):
    """Kill AFTER the solve converged: the resumed solve must stay
    stopped (terminal flags carry through ``.state``), not take extra
    steps the uninterrupted run never took. Pre-fix, 39/60 random
    configs of this family failed (fresh ``converged=False`` flags let
    the resumed loop keep iterating past the e_rel tolerance)."""
    rng = np.random.default_rng(91052 + 7 * trial)
    n = 3
    H = np.diag(rng.uniform(0.2, 2.0, size=n))
    c = rng.normal(size=n)

    def grad(x):
        return jnp.asarray(H) @ (x - jnp.asarray(c))

    accelerated = bool(rng.integers(0, 2))
    step = float(rng.uniform(0.3, 0.9))
    total = int(rng.integers(30, 80))
    k = int(rng.integers(5, total))
    kw = dict(accelerated=accelerated, prox=operators.prox_plus,
              e_rel=1e-4)
    x0 = jnp.asarray(rng.normal(size=n))

    full = pt.pgm(x0, grad, step, max_iter=total, **kw)
    half = pt.pgm(x0, grad, step, max_iter=k, **kw)
    res = pt.pgm(half.x, grad, step, max_iter=total - k,
                 state=half.state, **kw)
    _same(res.x, full.x,
          f"pgm post-conv acc={accelerated} k={k}/{total}")
    if bool(np.all(half.converged)):
        # the interesting arm: the kill landed after convergence —
        # the resume must be a no-op
        assert res.iterations == 0


def test_adaprox_resume_after_convergence():
    """AdaProx sibling of the post-convergence resume property."""
    rng = np.random.default_rng(17)
    H = np.diag(rng.uniform(0.3, 1.0, size=3))
    c = rng.normal(size=3)

    def grad(x):
        return jnp.asarray(H) @ (x - jnp.asarray(c))

    kw = dict(scheme="adam", prox=operators.prox_plus, e_rel=1e-3)
    x0 = jnp.asarray(rng.normal(size=3))
    full = pt.adaprox(x0, grad, 0.2, max_iter=400, **kw)
    assert bool(np.all(full.converged)), "test needs a converging config"
    k = full.iterations + 10
    half = pt.adaprox(x0, grad, 0.2, max_iter=k, **kw)
    res = pt.adaprox(half.x, grad, 0.2, max_iter=50,
                     state=half.state, **kw)
    _same(res.x, full.x, "adaprox post-conv resume")
    assert res.iterations == 0


@pytest.mark.parametrize("family", ["admm", "sdmm"])
def test_admm_family_resume_after_convergence(family):
    """ADMM/SDMM sibling: a converged-then-resumed solve stays stopped."""
    rng = np.random.default_rng(23)
    B = rng.standard_normal((3, 8))

    def prox_f(x, step):
        return (x + step * jnp.asarray(B)) / (1.0 + step)

    if family == "admm":
        kw = dict(prox_g=operators.prox_plus, e_rel=1e-4, e_abs=1e-4)
        solver = pt.admm
    else:
        kw = dict(proxs_g=[operators.prox_plus, operators.prox_max],
                  e_rel=1e-4, e_abs=1e-4)
        solver = pt.sdmm
    x0 = jnp.zeros((3, 8))
    full = solver(x0, prox_f, 0.5, max_iter=500, **kw)
    assert bool(np.all(np.asarray(full.converged))), \
        "test needs a converging config"
    k = full.iterations + 10
    half = solver(x0, prox_f, 0.5, max_iter=k, **kw)
    res = solver(half.x, prox_f, 0.5, max_iter=50,
                 state=half.state, **kw)
    _same(res.x, full.x, f"{family} post-conv resume")
    assert res.iterations == 0


def test_bsdmm_resume_after_convergence():
    """bsdmm sibling of the post-convergence property (two blocks,
    nested non-negativity constraints, consensus prox_f)."""
    c1, c2 = np.array([2.0, -1.0]), np.array([3.0, 0.5, -0.2])

    def proxs_f(x, step, j=None, Xs=None):
        c = jnp.asarray([c1, c2][j])
        return (x + step * c) / (1 + step)

    def steps_f(Xs, j=None):
        return 0.4

    def pg(v, step):
        return jnp.maximum(v, 0)

    kw = dict(proxs_g=[[pg], [pg, pg]], e_rel=1e-4)
    x0 = [jnp.zeros(2), jnp.zeros(3)]
    full = pt.bsdmm(x0, proxs_f, steps_f, max_iter=500, **kw)
    assert bool(np.all(np.asarray(full.converged))), \
        "test needs a converging config"
    k = full.iterations + 10
    half = pt.bsdmm(x0, proxs_f, steps_f, max_iter=k, **kw)
    res = pt.bsdmm([jnp.asarray(b) for b in half.x], proxs_f, steps_f,
                   max_iter=50, state=half.state, **kw)
    assert res.iterations == 0
    for a, b in zip(res.x, full.x):
        _same(a, b, "bsdmm post-conv resume")


def test_pgm_resume_after_divergence_stays_stopped():
    """A diverged-then-killed solve must stay stopped on resume (the
    carried ``diverged`` flag), not iterate on non-finite values."""
    def grad(x):
        return 4.0 * x

    x0 = jnp.asarray(np.ones(3))
    # step 10/L guarantees divergence
    half = pt.pgm(x0, grad, 10.0, max_iter=300, e_rel=0.0)
    assert half.status == "diverged"
    res = pt.pgm(half.x, grad, 10.0, max_iter=50, e_rel=0.0,
                 state=half.state)
    assert res.iterations == 0
    assert res.status == "diverged"


@pytest.mark.parametrize("trial", range(6))
def test_pgm_backtracking_trace_resume_random(trial):
    """Backtracking line search + trace-mode resume: the per-block T
    scales, f_prev, and momentum all carry; the local trace buffer
    concatenates to the uninterrupted one."""
    rng = np.random.default_rng(7000 + trial)
    H = np.diag(rng.uniform(0.05, 2.0, size=4))
    c = rng.normal(size=4)

    def grad(x):
        return jnp.asarray(H) @ (x - jnp.asarray(c))

    def f(x):
        d = x - jnp.asarray(c)
        return 0.5 * d @ (jnp.asarray(H) @ d)

    accelerated = bool(rng.integers(0, 2))
    total = int(rng.integers(8, 30))
    k = int(rng.integers(1, total))
    # deliberately too-large step so backtracking actually fires
    step = float(rng.uniform(1.0, 3.0))
    kw = dict(accelerated=accelerated, backtracking=True, f=f,
              prox=operators.prox_plus, e_rel=0.0, trace=True)
    x0 = jnp.asarray(rng.normal(size=4))

    full = pt.pgm(x0, grad, step, max_iter=total, **kw)
    half = pt.pgm(x0, grad, step, max_iter=k, **kw)
    res = pt.pgm(half.x, grad, step, max_iter=total - k,
                 state=half.state, **kw)
    _same(res.x, full.x,
          f"pgm bt acc={accelerated} step={step:.2f} k={k}/{total}")
    np.testing.assert_array_equal(
        np.concatenate([half.history, res.history]), full.history,
        err_msg="trace concatenation")
