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
    use_bb = bool(rng.integers(0, 2))
    step = (pt.utils.BarzilaiBorweinStepper(type=int(rng.integers(1, 3)),
                                            init_r=0.1)
            if use_bb else float(rng.uniform(0.3, 0.9)))
    prox = operators.prox_plus if rng.integers(0, 2) else None
    total = int(rng.integers(8, 40))
    k = int(rng.integers(1, total))
    kw = dict(accelerated=accelerated, prox=prox, e_rel=0.0)
    x0 = jnp.asarray(rng.normal(size=4))

    full = pt.pgm(x0, grad, step, max_iter=total, **kw)
    half = pt.pgm(x0, grad, step, max_iter=k, **kw)
    res = pt.pgm(half.x, grad, step, max_iter=total - k,
                 state=half.state, **kw)
    _same(res.x, full.x,
          f"pgm acc={accelerated} bb={use_bb} k={k}/{total}")


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
