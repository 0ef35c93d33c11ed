"""ADMM-family warm restart / checkpoint-resume (VERDICT r3 item 5).

The reference has no ADMM-family continuation at all — ``admm``/``sdmm``
always re-init Z, U (``/root/reference/proxmin/algorithms.py:471``), so
a preempted long solve restarts its dual variables from scratch. Here
every ADMM-family driver returns a ``.state`` warm-restart pytree and
accepts it back via ``state=``; a killed-and-resumed solve reproduces
the uninterrupted trajectory exactly (same dual variables, slack,
residual-balancing multiplier), and the pytree round-trips through
``proxmin_tpu.checkpoint``.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import proxmin_tpu as pt
from proxmin_tpu import operators


@pytest.fixture
def quad(rng):
    B = rng.standard_normal((4, 12))

    def prox_f(x, step):
        return (x + step * jnp.asarray(B)) / (1.0 + step)

    return B, prox_f


def _assert_same(a, b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-14)


def test_admm_resume_matches_uninterrupted(rng, quad):
    B, prox_f = quad
    x0 = jnp.zeros((4, 12))

    full = pt.admm(x0, prox_f, 0.7, prox_g=operators.prox_plus,
                   e_rel=1e-14, max_iter=50)

    half = pt.admm(x0, prox_f, 0.7, prox_g=operators.prox_plus,
                   e_rel=1e-14, max_iter=25)
    assert half.iterations == 25
    resumed = pt.admm(half.x, prox_f, 0.7, prox_g=operators.prox_plus,
                      e_rel=1e-14, max_iter=25, state=half.state)

    _assert_same(resumed.x, full.x)
    _assert_same(resumed.state["u"], full.state["u"])
    _assert_same(resumed.state["z"], full.state["z"])


def test_admm_adapt_step_resume_keeps_multiplier(rng, quad):
    """With residual balancing, the adapted step multiplier and the
    rescaled duals must survive the resume boundary — a fresh start
    would re-learn the scale and walk a different trajectory."""
    B, prox_f = quad
    x0 = jnp.zeros((4, 12))
    # step mis-scaled 100x: adapt_step corrects it over the first sweeps
    kw = dict(prox_g=operators.prox_plus, e_rel=1e-14, adapt_step=True)

    full = pt.admm(x0, prox_f, 70.0, max_iter=40, **kw)
    half = pt.admm(x0, prox_f, 70.0, max_iter=20, **kw)
    assert float(half.state["step_scale"]) != 1.0
    resumed = pt.admm(half.x, prox_f, 70.0, max_iter=20,
                      state=half.state, **kw)
    _assert_same(resumed.x, full.x)
    _assert_same(resumed.state["step_scale"], full.state["step_scale"])


def test_sdmm_resume_matches_uninterrupted(rng, quad):
    B, prox_f = quad
    x0 = jnp.zeros((4, 12))
    L = rng.standard_normal((3, 4))
    proxs_g = [operators.prox_plus,
               lambda x, step: operators.prox_max(x, step, thresh=1.0)]
    Ls = [None, L]

    full = pt.sdmm(x0, prox_f, 0.7, proxs_g=proxs_g, Ls=Ls,
                   e_rel=1e-14, max_iter=50)
    half = pt.sdmm(x0, prox_f, 0.7, proxs_g=proxs_g, Ls=Ls,
                   e_rel=1e-14, max_iter=25)
    resumed = pt.sdmm(half.x, prox_f, 0.7, proxs_g=proxs_g, Ls=Ls,
                      e_rel=1e-14, max_iter=25, state=half.state)
    _assert_same(resumed.x, full.x)
    for zi, zj in zip(resumed.state["z"], full.state["z"]):
        _assert_same(zi, zj)


def test_bsdmm_resume_matches_uninterrupted(rng):
    """Two-block CMF-style bsdmm with per-block constraints: Z/U and the
    carried per-block steps continue across the resume boundary."""
    from proxmin_tpu.nmf import _bsdmm_adapters

    C, K, N = 4, 3, 24
    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float64)
    A0 = rng.random((C, K))
    S0 = rng.random((K, N))
    prox_f, step_f = _bsdmm_adapters(
        Y, 1, (operators.prox_plus, operators.prox_plus), None)

    def run(a, s, n_iter, state=None):
        return pt.bsdmm([jnp.asarray(a), jnp.asarray(s)], prox_f, step_f,
                        proxs_g=[[operators.prox_plus],
                                 [operators.prox_plus]],
                        e_rel=1e-14, max_iter=n_iter, state=state)

    full = run(A0, S0, 40)
    half = run(A0, S0, 20)
    resumed = run(half.x[0], half.x[1], 20, state=half.state)
    _assert_same(resumed.x[0], full.x[0])
    _assert_same(resumed.x[1], full.x[1])
    _assert_same(resumed.state["steps_f"], full.state["steps_f"])


def test_admm_resume_through_checkpoint(tmp_path, rng, quad):
    """Kill-and-resume across a serialization boundary: the .state
    pytree round-trips through checkpoint.save/load (pickle fallback,
    dependency-free) and the resumed solve equals the uninterrupted
    one."""
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    B, prox_f = quad
    x0 = jnp.zeros((4, 12))
    full = pt.admm(x0, prox_f, 0.7, prox_g=operators.prox_plus,
                   e_rel=1e-14, max_iter=50)
    half = pt.admm(x0, prox_f, 0.7, prox_g=operators.prox_plus,
                   e_rel=1e-14, max_iter=25)

    path = save_checkpoint(str(tmp_path / "admm_ckpt"),
                           x=half.x, solver_state=half.state,
                           use_orbax=False)
    ckpt = load_checkpoint(path, use_orbax=False)

    resumed = pt.admm(jnp.asarray(ckpt["x"]), prox_f, 0.7,
                      prox_g=operators.prox_plus, e_rel=1e-14,
                      max_iter=25, state=ckpt["solver_state"])
    _assert_same(resumed.x, full.x)


def test_bsdmm_resume_through_checkpoint(tmp_path, rng):
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint
    from proxmin_tpu.nmf import _bsdmm_adapters

    C, K, N = 3, 2, 16
    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float64)
    A0, S0 = rng.random((C, K)), rng.random((K, N))
    prox_f, step_f = _bsdmm_adapters(
        Y, 1, (operators.prox_plus, operators.prox_plus), None)

    def run(a, s, n_iter, state=None):
        return pt.bsdmm([jnp.asarray(a), jnp.asarray(s)], prox_f, step_f,
                        e_rel=1e-14, max_iter=n_iter, state=state)

    full = run(A0, S0, 30)
    half = run(A0, S0, 15)
    path = save_checkpoint(str(tmp_path / "bsdmm_ckpt"),
                           x=list(half.x), solver_state=half.state,
                           use_orbax=False)
    ckpt = load_checkpoint(path, use_orbax=False)
    resumed = run(ckpt["x"][0], ckpt["x"][1], 15,
                  state=ckpt["solver_state"])
    _assert_same(resumed.x[0], full.x[0])
    _assert_same(resumed.x[1], full.x[1])


# ---------------------------------------------------------------------------
# PGM/FISTA warm restart (round 4): the Nesterov momentum clock, previous
# iterate, backtracking scales, and stepper state continue across the
# resume boundary. The reference has no analogue — re-calling
# algorithms.pgm restarts FISTA momentum from scratch (algorithms.py:80).
# ---------------------------------------------------------------------------

H_ILL = np.diag([1.0, 0.02])
C_ILL = np.array([1.0, 1.0])


def _grad_ill(x):
    return jnp.asarray(H_ILL) @ (x - jnp.asarray(C_ILL))


def _f_ill(x):
    d = x - jnp.asarray(C_ILL)
    return 0.5 * d @ (jnp.asarray(H_ILL) @ d)


def test_pgm_fista_resume_matches_uninterrupted():
    """An accelerated solve split in half equals the uninterrupted one —
    a fresh re-call (momentum clock reset, reference behavior) would
    not."""
    x0 = jnp.asarray([-1.0, -1.0])
    kw = dict(accelerated=True, e_rel=0.0)

    full = pt.pgm(x0, _grad_ill, 1.0, max_iter=40, **kw)
    half = pt.pgm(x0, _grad_ill, 1.0, max_iter=20, **kw)
    resumed = pt.pgm(half.x, _grad_ill, 1.0, max_iter=20,
                     state=half.state, **kw)
    _assert_same(resumed.x, full.x)
    _assert_same(resumed.state["t"], full.state["t"])
    _assert_same(resumed.state["x_prev"][0], full.state["x_prev"][0])

    # a naive re-call (no state) walks a different trajectory
    naive = pt.pgm(half.x, _grad_ill, 1.0, max_iter=20, **kw)
    assert not np.allclose(np.asarray(naive.x), np.asarray(full.x),
                           rtol=1e-12, atol=1e-14)


def test_pgm_backtracking_resume_keeps_scales():
    """The per-block backtracking scale T and last objective survive the
    boundary: with a 50x-too-large step, the first half pays the
    halving sweeps and the resumed half must not re-pay them."""
    x0 = jnp.asarray([-1.0, -1.0])
    kw = dict(backtracking=True, f=_f_ill, e_rel=0.0)

    full = pt.pgm(x0, _grad_ill, 50.0, max_iter=30, **kw)
    half = pt.pgm(x0, _grad_ill, 50.0, max_iter=15, **kw)
    assert float(half.state["T"][0]) < 1.0  # scales were actually halved
    resumed = pt.pgm(half.x, _grad_ill, 50.0, max_iter=15,
                     state=half.state, **kw)
    _assert_same(resumed.x, full.x)
    _assert_same(resumed.state["T"], full.state["T"])


def test_pgm_bb_stepper_resume_keeps_history():
    """Barzilai–Borwein stepper state (previous iterate/gradient pair)
    continues across the boundary."""
    x0 = jnp.asarray([-1.0, -1.0])
    stepper = pt.utils.BarzilaiBorweinStepper(type=1, init_r=0.1)

    full = pt.pgm(x0, _grad_ill, stepper, e_rel=0.0, max_iter=24)
    half = pt.pgm(x0, _grad_ill, stepper, e_rel=0.0, max_iter=12)
    resumed = pt.pgm(half.x, _grad_ill, stepper, e_rel=0.0, max_iter=12,
                     state=half.state)
    _assert_same(resumed.x, full.x)


def test_pgm_resume_through_checkpoint(tmp_path):
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    x0 = jnp.asarray([-1.0, -1.0])
    kw = dict(accelerated=True, e_rel=0.0)
    full = pt.pgm(x0, _grad_ill, 1.0, max_iter=40, **kw)
    half = pt.pgm(x0, _grad_ill, 1.0, max_iter=20, **kw)

    path = save_checkpoint(str(tmp_path / "pgm_ckpt"),
                           x=half.x, solver_state=half.state,
                           use_orbax=False)
    ckpt = load_checkpoint(path, use_orbax=False)
    resumed = pt.pgm(jnp.asarray(ckpt["x"]), _grad_ill, 1.0, max_iter=20,
                     state=ckpt["solver_state"], **kw)
    _assert_same(resumed.x, full.x)


def test_pgm_resume_rejects_mismatched_stepper_state():
    x0 = jnp.asarray([-1.0, -1.0])
    half = pt.pgm(x0, _grad_ill, pt.utils.BarzilaiBorweinStepper(type=1),
                  e_rel=0.0, max_iter=10)
    with pytest.raises(ValueError, match="stepper state structure"):
        pt.pgm(half.x, _grad_ill, 1.0, max_iter=10, state=half.state)


# ---------------------------------------------------------------------------
# AdaProx exact warm restart (round 4): unlike the reference-style
# M=/V=/Vhat= moment warm start (which re-fires the t=1 bias-correction
# transient), state= continues the global Adam clock and the stepper
# state, so split == uninterrupted exactly.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("scheme", ["adam", "radam", "amsgrad", "nadam"])
def test_adaprox_resume_matches_uninterrupted(scheme):
    x0 = jnp.asarray([-1.0, -1.0])
    kw = dict(scheme=scheme, prox=operators.prox_plus,
              check_convergence=False, e_rel=1e-14)

    full = pt.adaprox(x0, _grad_ill, 0.1, max_iter=40, **kw)
    half = pt.adaprox(x0, _grad_ill, 0.1, max_iter=20, **kw)
    resumed = pt.adaprox(half.x, _grad_ill, 0.1, max_iter=20,
                         state=half.state, **kw)
    _assert_same(resumed.x, full.x)
    _assert_same(resumed.state["M"][0], full.state["M"][0])
    _assert_same(resumed.state["V"][0], full.state["V"][0])
    assert int(resumed.state["it"]) == int(full.state["it"]) == 40


def test_adaprox_moment_warmstart_differs_from_exact_resume():
    """M=/V=/Vhat= (reference semantics) resets the bias-correction
    clock; state= does not — on a t-sensitive scheme the two must
    differ, and only state= reproduces the uninterrupted run."""
    x0 = jnp.asarray([-1.0, -1.0])
    kw = dict(scheme="adam", check_convergence=False)

    full = pt.adaprox(x0, _grad_ill, 0.1, max_iter=30, **kw)
    half = pt.adaprox(x0, _grad_ill, 0.1, max_iter=15, **kw)
    exact = pt.adaprox(half.x, _grad_ill, 0.1, max_iter=15,
                       state=half.state, **kw)
    warm = pt.adaprox(half.x, _grad_ill, 0.1, max_iter=15,
                      M=half.M, V=half.V, Vhat=half.Vhat, **kw)
    _assert_same(exact.x, full.x)
    assert not np.allclose(np.asarray(warm.x), np.asarray(full.x),
                           rtol=1e-12, atol=1e-14)


def test_adaprox_resume_through_checkpoint(tmp_path):
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    x0 = jnp.asarray([-1.0, -1.0])
    kw = dict(scheme="adam", prox=operators.prox_plus,
              check_convergence=False)
    full = pt.adaprox(x0, _grad_ill, 0.1, max_iter=30, **kw)
    half = pt.adaprox(x0, _grad_ill, 0.1, max_iter=15, **kw)
    path = save_checkpoint(str(tmp_path / "adaprox_ckpt"),
                           x=half.x, solver_state=half.state,
                           use_orbax=False)
    ckpt = load_checkpoint(path, use_orbax=False)
    resumed = pt.adaprox(jnp.asarray(ckpt["x"]), _grad_ill, 0.1,
                         max_iter=15, state=ckpt["solver_state"], **kw)
    _assert_same(resumed.x, full.x)


def test_adaprox_state_and_moments_mutually_exclusive():
    x0 = jnp.asarray([-1.0, -1.0])
    half = pt.adaprox(x0, _grad_ill, 0.1, max_iter=5,
                      check_convergence=False)
    with pytest.raises(AssertionError, match="mutually exclusive"):
        pt.adaprox(half.x, _grad_ill, 0.1, max_iter=5, M=half.M,
                   state=half.state, check_convergence=False)


def test_adaprox_resume_rejects_mismatched_stepper_state():
    x0 = jnp.asarray([-1.0, -1.0])
    half = pt.adaprox(x0, _grad_ill,
                      pt.utils.BarzilaiBorweinStepper(type=1),
                      max_iter=5, check_convergence=False)
    with pytest.raises(ValueError, match="stepper state structure"):
        pt.adaprox(half.x, _grad_ill, 0.1, max_iter=5, state=half.state,
                   check_convergence=False)
