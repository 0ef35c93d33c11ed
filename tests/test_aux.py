"""Auxiliary subsystems: device-side trace buffers, checkpoint/resume,
misc reference-parity helpers (SURVEY.md §5)."""

import os
import numpy as np
import jax.numpy as jnp
import pytest

import proxmin_tpu as pt
from proxmin_tpu import utils


CENTER = np.array([1.0, 0.5])


def grad_f(x):
    return x - CENTER


def prox_disk(x, step, r=0.5):
    nrm = jnp.sqrt(jnp.sum(x ** 2))
    return jnp.where(nrm > r, x * (r / nrm), x)


def test_pgm_trace():
    res = pt.pgm(jnp.asarray([-1.0, -1.0]), grad_f, 0.3,
                 e_rel=1e-8, max_iter=500, trace=True)
    h = res.history
    assert h.shape == (res.iterations, 1)
    # residuals of a contraction decrease and end below tolerance
    assert h[-1, 0] <= 1e-8
    assert h[0, 0] > h[-1, 0]


def test_pgm_trace_multiblock():
    def g(x1, x2):
        return x1 - 1.0, x2 - 2.0

    res = pt.pgm([jnp.zeros(2), jnp.zeros(3)], g, 0.5,
                 e_rel=1e-8, max_iter=200, trace=True)
    assert res.history.shape == (res.iterations, 2)


def test_pgm_no_trace_by_default():
    res = pt.pgm(jnp.asarray([-1.0, -1.0]), grad_f, 0.3, max_iter=50)
    assert res.history is None


def test_adaprox_trace():
    res = pt.adaprox(jnp.asarray([-1.0, -1.0]), grad_f, 0.1,
                     e_rel=1e-6, max_iter=500, trace=True)
    assert res.history.shape == (res.iterations, 1)
    assert res.history[-1, 0] <= 1e-6


def test_admm_trace():
    def prox_f(v, step):
        return (v + step * jnp.asarray(CENTER)) / (1 + step)

    res = pt.admm(jnp.asarray([-1.0, -1.0]), prox_f, 0.5,
                  prox_g=prox_disk, e_rel=1e-7, max_iter=2000, trace=True)
    h = res.history
    assert h.shape == (res.total_iterations, 1, 4)
    # primal/dual norms in columns 2,3 fall below thresholds in cols 0,1
    assert h[-1, 0, 2] <= h[-1, 0, 0]
    assert h[-1, 0, 3] <= h[-1, 0, 1]


def test_sdmm_trace():
    def prox_f(v, step):
        return (v + step * jnp.asarray(CENTER)) / (1 + step)

    res = pt.sdmm(jnp.asarray([-1.0, -1.0]), prox_f, 0.5,
                  proxs_g=[prox_disk, lambda v, s: jnp.maximum(v, 0)],
                  e_rel=1e-6, max_iter=2000, trace=True)
    assert res.history.shape[1:] == (2, 4)


def test_checkpoint_roundtrip(tmp_path):
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    x = {"a": np.arange(6.0).reshape(2, 3), "b": (np.ones(4), np.zeros(2))}
    p = save_checkpoint(str(tmp_path / "ck"), **x)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back["a"], x["a"])
    np.testing.assert_array_equal(back["b"][0], x["b"][0])


def test_checkpoint_fallback_roundtrip(tmp_path):
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    x = {"m": np.ones((3, 3))}
    p = save_checkpoint(str(tmp_path / "ck2"), use_orbax=False, **x)
    back = load_checkpoint(p, use_orbax=False)
    np.testing.assert_array_equal(back["m"], x["m"])


def test_adaprox_checkpoint_resume(tmp_path):
    """Full checkpoint/resume cycle through the warm-start interface."""
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    x0 = jnp.asarray([-1.0, -1.0])
    r1 = pt.adaprox(x0, grad_f, 0.1, e_rel=0, max_iter=15,
                    check_convergence=False)
    p = save_checkpoint(str(tmp_path / "adaprox"), use_orbax=False,
                        x=r1.x, M=r1.M, V=r1.V, Vhat=r1.Vhat)
    ck = load_checkpoint(p, use_orbax=False)
    r2 = pt.adaprox(jnp.asarray(ck["x"]), grad_f, 0.1,
                    e_rel=0, max_iter=15, check_convergence=False,
                    M=ck["M"], V=ck["V"], Vhat=ck["Vhat"])
    # resumed run keeps descending
    d1 = np.linalg.norm(np.asarray(r1.x) - CENTER)
    d2 = np.linalg.norm(np.asarray(r2.x) - CENTER)
    assert d2 < d1


def test_hasnotnone_parity():
    assert utils.hasNotNone([None, None]) == 0
    assert utils.hasNotNone([[None], [1, None]]) == 1
    assert utils.hasNotNone([[2], [None]]) == 2


def test_pgm_divergence_detection():
    """A diverging step produces NaN/Inf; the solver stops early with
    status='diverged' instead of burning max_iter on NaNs."""
    res = pt.pgm(jnp.asarray([1.0, 1.0]), lambda x: -x * 1e30, 1e30,
                 e_rel=1e-8, max_iter=1000)
    assert res.status == "diverged"
    assert res.iterations < 1000


def test_adaprox_divergence_detection():
    def bad_grad(x):
        return x * jnp.nan

    res = pt.adaprox(jnp.asarray([1.0, 1.0]), bad_grad, 0.1,
                     e_rel=1e-8, max_iter=1000)
    assert res.status == "diverged"
    assert res.iterations < 1000


def test_pgm_status_values():
    c = jnp.asarray([1.0, 0.5])
    ok = pt.pgm(jnp.zeros(2), lambda x: x - c, 0.5, e_rel=1e-8,
                max_iter=500)
    assert ok.status == "converged"
    capped = pt.pgm(jnp.zeros(2), lambda x: x - c, 1e-6, e_rel=1e-12,
                    max_iter=5)
    assert capped.status == "max_iter"


def test_bsdmm_trace():
    def proxs_f(x, step, Xs=None, j=None):
        c = jnp.asarray([1.0, 0.5])
        return (x + step * c) / (1 + step)

    def pg(v, step):
        return jnp.maximum(v, 0)

    res = pt.bsdmm([jnp.zeros(2)], proxs_f, lambda Xs, j=None: 0.5,
                   proxs_g=[[pg]], e_rel=1e-6, max_iter=500, trace=True)
    h = res.history
    assert h.shape == (res.iterations, 1, 2)
    # dual residual shrinks (primal stays 0: the constraint is never
    # violated on this problem)
    assert h[0, 0, 1] > 0
    assert h[-1, 0, 1] < h[0, 0, 1]


def test_strided_stepper_weighted_nmf(rng):
    """Strided Lipschitz refresh converges to the same solution as exact
    per-iteration steps on a weighted problem."""
    C, N, K = 6, 40, 3
    Y = rng.random((C, K)) @ rng.random((K, N))
    W = 0.5 + rng.random((C, N))
    A0, S0 = rng.random((C, K)), rng.random((K, N))

    A1, S1 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A1, S1, W=W, e_rel=0, max_iter=300)
    A2, S2 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A2, S2, W=W, e_rel=0, max_iter=300, step_stride=10)

    import jax.numpy as jnp
    l1 = float(pt.nmf.log_likelihood(jnp.asarray(A1), jnp.asarray(S1),
                                     Y=jnp.asarray(Y), W=jnp.asarray(W)))
    l2 = float(pt.nmf.log_likelihood(jnp.asarray(A2), jnp.asarray(S2),
                                     Y=jnp.asarray(Y), W=jnp.asarray(W)))
    # the strided run must reach a comparable loss (same basin, slightly
    # slower due to the 0.9 safety factor)
    assert l2 < l1 * 1.5 + 1e-6
    assert np.isfinite(l2)


def test_strided_stepper_refresh_cadence():
    """Steps refresh exactly every `stride` iterations."""
    from proxmin_tpu.utils import StridedStepper
    calls = []

    def step(*X, it=None):
        return 0.5

    st = StridedStepper(step, 1, stride=5)
    state = st.init_state((jnp.zeros(2),), (jnp.zeros(2),))
    x = (jnp.ones(2),)
    g = (jnp.ones(2),)
    vals = []
    for it in range(12):
        s, state = st(state, x, jnp.int32(it), g)
        vals.append(float(s[0]))
    # refreshed at 0, 5, 10 with safety 0.9 -> constant 0.45 throughout
    assert all(abs(v - 0.45) < 1e-12 for v in vals)


def test_profile_trace(tmp_path):
    """jax.profiler integration: a solve inside profile_trace produces a
    TensorBoard-loadable trace directory."""
    import os
    with utils.profile_trace(str(tmp_path)):
        pt.pgm(jnp.asarray([-1.0, -1.0]), grad_f, 0.5, e_rel=1e-6,
               max_iter=50)
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert any(f.endswith(".pb") or "trace" in f for f in found), found


def test_export_nmf_solver(tmp_path, rng):
    """AOT export/restore of the fused solver: serialize, reload, solve —
    result matches the live runner."""
    from proxmin_tpu.export import (
        export_nmf_solver, load_exported, save_exported,
    )

    C, K, N = 4, 3, 256
    blob = export_nmf_solver(C, K, N, e_rel=0.0, tile_n=128)
    p = save_exported(str(tmp_path / "solver.bin"), blob)
    solve = load_exported(p)

    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    A1, S1, it, cA, cS, loss = solve(A0, S0, Y, 15)
    assert int(it) == 15

    r = pt.nmf.nmf_pgm_fused(Y, A0.copy(), S0.copy(), e_rel=0,
                             max_iter=15, tile_n=128)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(r.x[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(r.x[1]),
                               rtol=1e-6)


def test_checkpoint_tree_arg(tmp_path):
    """A bare pytree round-trips via the 'tree' argument."""
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    tree = {"state": (np.arange(3.0), {"k": np.eye(2)})}
    p = save_checkpoint(str(tmp_path / "t"), tree=tree, use_orbax=False)
    back = load_checkpoint(p, use_orbax=False)["__tree__"]
    np.testing.assert_array_equal(back["state"][0], tree["state"][0])
    np.testing.assert_array_equal(back["state"][1]["k"], tree["state"][1]["k"])


def test_pgm_trace_backtracking_accelerated():
    """All solver features compose: FISTA + backtracking + trace."""
    def f(x):
        return 0.5 * jnp.sum((x - jnp.asarray(CENTER)) ** 2)

    res = pt.pgm(jnp.asarray([-1.0, -1.0]), grad_f, 20.0,
                 prox=prox_disk, accelerated=True, backtracking=True,
                 f=f, e_rel=1e-8, max_iter=500, trace=True)
    assert res.history.shape[0] == res.iterations
    opt = 0.5 * CENTER / np.linalg.norm(CENTER)
    np.testing.assert_allclose(np.asarray(res.x), opt, atol=1e-4)


def test_clear_caches_drops_solver_and_asarray_caches(rng):
    from proxmin_tpu.solvers.bsdmm import _BSDMM_CACHE
    from proxmin_tpu.solvers.common import _ASARRAY_CACHE

    Y = rng.random((4, 8)).astype(np.float32)   # NumPy -> asarray cache
    A0, S0 = rng.random((4, 2)), rng.random((2, 8))
    pt.nmf.nmf(Y, A0, S0, algorithm="bsdmm", e_rel=0, max_iter=3)
    assert len(_BSDMM_CACHE._d) >= 1
    assert len(_ASARRAY_CACHE._d) >= 1
    pt.clear_caches()
    assert len(_BSDMM_CACHE._d) == 0
    assert len(_ASARRAY_CACHE._d) == 0


def test_asarray_cached_content_keyed():
    """asarray_cached: equal content reuses the device array (stable id
    for driver-cache keys); in-place mutation yields a fresh copy (never
    stale)."""
    from proxmin_tpu.solvers.common import asarray_cached

    y = np.arange(6, dtype=np.float32).reshape(2, 3)
    d1 = asarray_cached(y)
    d2 = asarray_cached(y.copy())     # different object, same content
    assert d1 is d2
    y[0, 0] = 99.0                    # in-place mutation
    d3 = asarray_cached(y)
    assert d3 is not d1
    np.testing.assert_array_equal(np.asarray(d3), y)


def test_nmf_numpy_Y_repeat_solve_hits_driver_cache(rng):
    """Advisor r1: repeat nmf() solves with an (unchanged) NumPy Y must
    reuse the compiled pgm driver instead of re-tracing each call."""
    from proxmin_tpu.solvers.pgm import _PGM_CACHE

    Y = rng.random((4, 32)).astype(np.float32)
    A0 = rng.random((4, 2)).astype(np.float32)
    S0 = rng.random((2, 32)).astype(np.float32)
    pt.nmf.nmf(Y, A0.copy(), S0.copy(), e_rel=0, max_iter=3)
    n_entries = len(_PGM_CACHE._d)
    pt.nmf.nmf(Y, A0.copy(), S0.copy(), e_rel=0, max_iter=3)
    assert len(_PGM_CACHE._d) == n_entries


def test_step_stride_bsdmm_weighted_cmf(rng):
    """VERDICT r1 #6: strided weighted steps for the bsdmm CMF path —
    the steps_f_stride carry must converge to the same basin as exact
    per-sweep steps."""
    C, N, K = 6, 40, 3
    Y = rng.random((C, K)) @ rng.random((K, N))
    W = 0.5 + rng.random((C, N))
    A0, S0 = rng.random((C, K)), rng.random((K, N))

    A1, S1 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A1, S1, W=W, algorithm="bsdmm", e_rel=0, max_iter=150)
    A2, S2 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A2, S2, W=W, algorithm="bsdmm", e_rel=0, max_iter=150,
               step_stride=10)

    l_init = float(pt.nmf.log_likelihood(jnp.asarray(A0), jnp.asarray(S0),
                                         Y=jnp.asarray(Y),
                                         W=jnp.asarray(W)))
    l1 = float(pt.nmf.log_likelihood(jnp.asarray(A1), jnp.asarray(S1),
                                     Y=jnp.asarray(Y), W=jnp.asarray(W)))
    l2 = float(pt.nmf.log_likelihood(jnp.asarray(A2), jnp.asarray(S2),
                                     Y=jnp.asarray(Y), W=jnp.asarray(W)))
    assert np.isfinite(l2)
    # same basin: both runs collapse the initial loss by >99% (the
    # strided run trails slightly due to the 0.9 safety factor, so a
    # direct l2/l1 ratio near the zero-loss floor is not meaningful)
    assert l1 < 0.01 * l_init
    assert l2 < 0.01 * l_init


def test_step_stride_bsdmm_stride_cadence(rng):
    """With steps_f_stride >= max_iter the step refreshes only on the
    first sweep: the run must equal a run whose steps_f_cb returns the
    frozen (0.9-shrunk) first-sweep values."""
    from proxmin_tpu import bsdmm

    c = jnp.asarray([2.0, -1.0])

    def proxs_f(x, step, Xs=None, j=None):
        return (x + step * c) / (1 + step)

    calls = {"n": 0}

    def steps_cb(Xs, j=None):
        calls["n"] += 1          # trace-time count, not runtime
        return 0.5 + 0.1 * jnp.sum(Xs[0] ** 2)

    x0 = jnp.asarray([0.0, 0.0])
    r1 = bsdmm([x0], proxs_f, steps_cb, e_rel=0, max_iter=8,
               steps_f_stride=100)

    # frozen-step equivalent: the first sweep evaluates at x0
    s0 = 0.9 * float(0.5 + 0.1 * np.sum(np.asarray(x0) ** 2))
    r2 = bsdmm([x0], proxs_f, lambda Xs, j=None: s0 / 0.9 * 0.0 + s0,
               e_rel=0, max_iter=8, steps_f_stride=None)
    # r2 uses constant s0 every sweep -- but r1's refresh at it=0 also
    # yields s0 and then carries it, so the trajectories coincide
    np.testing.assert_allclose(np.asarray(r1.x[0]), np.asarray(r2.x[0]),
                               rtol=1e-6)


def test_step_stride_bsdmm_segmented_bit_exact(rng):
    """The plain-strided bsdmm path runs a SEGMENTED loop (refresh sweep
    + frozen inner sweeps); its trajectory must be bit-identical to the
    flat per-sweep body (callback mode drives exactly that body), and a
    kill/resume at EVERY sweep — including one short of a refresh
    boundary, where the ceil-based seg_end matters — must continue
    bit-exactly."""
    from proxmin_tpu import bsdmm

    c0 = jnp.asarray([2.0, -1.0, 0.5])
    c1 = jnp.asarray([[0.3, 1.2], [-0.7, 0.1]])

    def proxs_f(x, step, Xs=None, j=None):
        tgt = c0 if j == 0 else c1
        other = jnp.sum(Xs[1 - j] ** 2)
        return (x + step * (tgt + 0.01 * other)) / (1 + step)

    def steps_cb(Xs, j=None):
        # iterate-dependent: frozen vs refreshed steps genuinely differ
        return 0.3 / (1.0 + 0.1 * jnp.sum(Xs[j] ** 2))

    x0 = (jnp.zeros(3), jnp.zeros((2, 2)))
    kw = dict(e_rel=0.0, steps_f_stride=4)
    T = 11  # crosses refresh boundaries at it = 4 and 8

    full = bsdmm(x0, proxs_f, steps_cb, max_iter=T, **kw)

    # oracle: callback mode steps the flat (unfrozen) body per sweep
    cb_res = bsdmm(x0, proxs_f, steps_cb, max_iter=T,
                   callback=lambda *X, it=None: None, **kw)
    for a, b in zip(full.x, cb_res.x):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for k in range(1, T):
        half = bsdmm(x0, proxs_f, steps_cb, max_iter=k, **kw)
        res = bsdmm(half.x, proxs_f, steps_cb, max_iter=T - k,
                    state=half.state, **kw)
        for a, b in zip(full.x, res.x):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"kill at sweep {k}")


def test_step_stride_adaprox_runs(rng):
    C, N, K = 5, 30, 2
    Y = rng.random((C, K)) @ rng.random((K, N))
    A0, S0 = rng.random((C, K)), rng.random((K, N))
    res = pt.nmf.nmf(Y, A0, S0, algorithm="adaprox", e_rel=0, max_iter=40,
                     step_stride=5)
    assert np.isfinite(np.asarray(res.x[0])).all()
    assert np.isfinite(np.asarray(res.x[1])).all()


def test_export_pgm_roundtrip(tmp_path):
    """VERDICT r1 #8: generic AOT export — an exported pgm solve must
    match the in-process solve exactly."""
    from proxmin_tpu import export as pex
    from proxmin_tpu import pgm

    c = jnp.asarray([1.0, 0.5])
    r = 0.5

    def grad(x):
        return x - c

    def prox_disk(x, step):
        nrm = jnp.sqrt(jnp.sum(x ** 2))
        return jnp.where(nrm > r, x * (r / nrm), x)

    blob = pex.export_pgm_solver((2,), grad, 0.5, prox=prox_disk,
                                 e_rel=1e-10, max_iter=500,
                                 dtype=jnp.float64)
    path = tmp_path / "pgm.bin"
    pex.save_exported(path, blob)
    solve = pex.load_exported(path)

    x0 = jnp.asarray([-1.0, -1.0])
    xs, it, conv, div = solve(x0)
    res = pgm(x0, grad, 0.5, prox=prox_disk, e_rel=1e-10, max_iter=500)
    np.testing.assert_array_equal(np.asarray(xs[0]), np.asarray(res.x))
    assert int(it) == res.iterations
    assert bool(conv.all()) == all(res.converged)


def test_export_adaprox_roundtrip(tmp_path):
    from proxmin_tpu import adaprox
    from proxmin_tpu import export as pex

    c = jnp.asarray([2.0, -1.0])

    def grad(x):
        return x - c

    blob = pex.export_adaprox_solver((2,), grad, 0.3, scheme="amsgrad",
                                     e_rel=1e-8, max_iter=200,
                                     dtype=jnp.float64)
    solve = pex.load_solver(blob)
    x0 = jnp.zeros(2, jnp.float64)
    xs, M, V, Vhat, it, conv, div = solve(x0)
    res = adaprox(x0, grad, 0.3, scheme="amsgrad", e_rel=1e-8,
                  max_iter=200)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(res.x),
                               rtol=0, atol=0)
    assert int(it) == res.iterations
    np.testing.assert_array_equal(np.asarray(M[0]), np.asarray(res.M[0]))


def test_nmf_bsdmm_numpy_Y_repeat_solve_hits_driver_cache(rng):
    """Review r2 finding: repeat nmf(algorithm='bsdmm') with (unchanged)
    NumPy data must reuse the compiled driver — structural partial keys
    plus asarray_cached make the key stable without an adapter memo."""
    from proxmin_tpu.solvers.bsdmm import _BSDMM_CACHE

    Y = rng.random((4, 32)).astype(np.float32)
    A0 = rng.random((4, 2)).astype(np.float32)
    S0 = rng.random((2, 32)).astype(np.float32)
    pt.nmf.nmf(Y, A0.copy(), S0.copy(), algorithm="bsdmm", e_rel=0,
               max_iter=3)
    n_entries = len(_BSDMM_CACHE._d)
    pt.nmf.nmf(Y, A0.copy(), S0.copy(), algorithm="bsdmm", e_rel=0,
               max_iter=3)
    assert len(_BSDMM_CACHE._d) == n_entries


def test_pgm_partial_bound_numpy_mutation_not_stale():
    """Review r2 finding: a mutable NumPy array bound in a grad partial
    must not be served stale from the driver cache after in-place
    mutation (callable_key routes bound values through nested_key)."""
    from functools import partial

    def g(x, c=None):
        return x - jnp.asarray(c)

    c = np.array([1.0, 0.5])
    r1 = pt.pgm(jnp.zeros(2), partial(g, c=c), 0.5, e_rel=0, max_iter=100)
    np.testing.assert_allclose(np.asarray(r1.x), [1.0, 0.5], atol=1e-6)
    c[:] = 0.0   # mutate in place, same object id
    r2 = pt.pgm(jnp.zeros(2), partial(g, c=c), 0.5, e_rel=0, max_iter=100)
    np.testing.assert_allclose(np.asarray(r2.x), [0.0, 0.0], atol=1e-6)


def test_nmf_step_stride_numpy_step_mutation_not_stale(rng):
    """Review r2 finding: StridedStepper over a mutable NumPy step array
    must bypass the driver cache (same policy as the unstrided path)."""
    c = jnp.asarray([1.0, 0.5])
    s_np = np.array([0.5, 0.5])
    r1 = pt.pgm(jnp.zeros(2), lambda x: x - c,
                pt.utils.StridedStepper(s_np, 1, stride=5),
                e_rel=0, max_iter=4)
    x1 = np.asarray(r1.x)
    s_np[:] = 0.0
    r2 = pt.pgm(jnp.zeros(2), lambda x: x - c,
                pt.utils.StridedStepper(s_np, 1, stride=5),
                e_rel=0, max_iter=4)
    np.testing.assert_allclose(np.asarray(r2.x), 0.0)
    assert not np.allclose(x1, np.asarray(r2.x))


def test_export_admm_solver(tmp_path):
    """AOT export of the admm driver: exported solve matches in-process."""
    from proxmin_tpu.export import (
        export_admm_solver, load_exported, save_exported,
    )

    def prox_f(v, step):
        return (v + step * jnp.asarray(CENTER)) / (1 + step)

    blob = export_admm_solver((2,), prox_f, 0.5, prox_g=prox_disk,
                              e_rel=1e-8, max_iter=500, dtype=jnp.float64)
    p = save_exported(str(tmp_path / "admm.bin"), blob)
    solve = load_exported(p)

    x0 = jnp.asarray([-1.0, -1.0])
    x, it, conv, errors = solve(x0)
    res = pt.admm(x0, prox_f, 0.5, prox_g=prox_disk, e_rel=1e-8,
                  max_iter=500)
    np.testing.assert_allclose(np.asarray(x), np.asarray(res.x), rtol=1e-12)
    assert int(it) == res.iterations
    assert bool(conv) == res.converged
    assert errors.shape == (1, 4)


def test_export_sdmm_solver(tmp_path):
    """AOT export of the sdmm driver (M=2 constraints) round-trips."""
    from proxmin_tpu.export import (
        export_sdmm_solver, load_exported, save_exported,
    )

    def prox_f(v, step):
        return (v + step * jnp.asarray(CENTER)) / (1 + step)

    def prox_plus(v, step):
        return jnp.maximum(v, 0)

    proxs_g = [prox_disk, prox_plus]
    blob = export_sdmm_solver((2,), prox_f, 0.5, proxs_g,
                              e_rel=1e-8, max_iter=500, dtype=jnp.float64)
    solve = load_exported(save_exported(str(tmp_path / "sdmm.bin"), blob))

    x0 = jnp.asarray([-1.0, -1.0])
    x, it, conv, errors = solve(x0)
    res = pt.sdmm(x0, prox_f, 0.5, proxs_g=proxs_g, e_rel=1e-8,
                  max_iter=500)
    np.testing.assert_allclose(np.asarray(x), np.asarray(res.x), rtol=1e-12)
    assert int(it) == res.iterations
    assert errors.shape == (2, 4)


def test_export_bsdmm_solver(tmp_path, rng):
    """AOT export of the bsdmm driver (2 blocks + constraints)."""
    from proxmin_tpu.export import (
        export_bsdmm_solver, load_exported, save_exported,
    )

    c1 = np.array([1.0, -0.5])
    c2 = np.array([0.2, 0.8, -0.1])

    def proxs_f(x, step, Xs=None, j=None):
        c = jnp.asarray([c1, c2][j])
        return (x + step * c) / (1 + step)

    def steps_f(Xs, j=None):
        return 0.4

    def pg(v, step):
        return jnp.maximum(v, 0)

    blob = export_bsdmm_solver([(2,), (3,)], proxs_f, steps_f,
                               proxs_g=[pg, pg], e_rel=1e-9,
                               max_iter=300, dtype=jnp.float64)
    solve = load_exported(save_exported(str(tmp_path / "bsdmm.bin"), blob))

    x0 = [jnp.asarray([-1.0, -1.0]), jnp.asarray([0.5, -0.5, 0.5])]
    xs, it, conv = solve(*x0)
    res = pt.bsdmm([np.array(x) for x in x0], proxs_f, steps_f,
                   proxs_g=[pg, pg], e_rel=1e-9, max_iter=300)
    for xb, rb in zip(xs, res.x):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(rb),
                                   rtol=1e-12)
    assert int(it) == res.iterations
    assert conv.shape == (2,)


def test_weighted_pgm_stepper_matches_strided_step_pgm(rng):
    """nmf's warm-started WeightedPGMStepper must reproduce the generic
    StridedStepper(step_pgm) path (same refresh schedule, same 0.9
    safety; the warm start converges to the same bounds in f64)."""
    from functools import partial

    from proxmin_tpu.nmf import WeightedPGMStepper, nmf, step_pgm
    from proxmin_tpu.utils import StridedStepper

    C, K, N = 4, 3, 200
    Y = rng.random((C, K)) @ rng.random((K, N))
    W = 0.5 + rng.random((C, N))
    A0, S0 = rng.random((C, K)), rng.random((K, N))

    A1, S1 = A0.copy(), S0.copy()
    nmf(Y, A1, S1, W=W, e_rel=0, max_iter=50,
        step=StridedStepper(partial(step_pgm, W=jnp.asarray(W)), 2,
                            stride=10))
    A2, S2 = A0.copy(), S0.copy()
    nmf(Y, A2, S2, W=W, e_rel=0, max_iter=50, step_stride=10)
    np.testing.assert_allclose(A1, A2, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(S1, S2, rtol=1e-10, atol=1e-12)

    # and the stepper is what the step_stride path actually builds
    st = WeightedPGMStepper(jnp.asarray(W), stride=10)
    assert st.segmentable


def test_export_nmf_solver_weighted(tmp_path, rng):
    """AOT export of the WEIGHTED fused solver round-trips against the
    live weighted runner."""
    from proxmin_tpu.export import (
        export_nmf_solver, load_exported, save_exported,
    )

    C, K, N = 4, 3, 256
    blob = export_nmf_solver(C, K, N, e_rel=0.0, tile_n=128,
                             weighted=True, step_stride=5)
    solve = load_exported(save_exported(str(tmp_path / "wnmf.bin"), blob))

    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    A1, S1, it, cA, cS, loss = solve(A0, S0, Y, W, 12)
    assert int(it) == 12

    r = pt.nmf.nmf_pgm_fused(Y, A0.copy(), S0.copy(), W=W, e_rel=0,
                             max_iter=12, tile_n=128, step_stride=5)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(r.x[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(r.x[1]),
                               rtol=1e-6)


def test_weighted_pgm_stepper_callback_mode(rng):
    """WeightedPGMStepper's per-iteration cond path (host callback loop)
    matches the fused segmented path exactly."""
    C, K, N = 4, 3, 100
    Y = rng.random((C, K)) @ rng.random((K, N))
    W = 0.5 + rng.random((C, N))
    A0, S0 = rng.random((C, K)), rng.random((K, N))

    hits = []

    def cb(*X, it=None):
        hits.append(it)

    A1, S1 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A1, S1, W=W, e_rel=0, max_iter=25, step_stride=10,
               callback=cb)
    assert len(hits) == 25

    A2, S2 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A2, S2, W=W, e_rel=0, max_iter=25, step_stride=10)
    np.testing.assert_allclose(S1, S2, rtol=1e-12, atol=1e-14)


def test_grow_stride_policy():
    """utils.grow_stride implements the reference ApproximateCache rule
    (reference utils.py:176-186): grow by max(1, floor(budget/drift *
    stride)) when 0 < drift < budget, capped at max_stride — plus the
    shrink-back branch the reference lacks (drift > budget -> halve)."""
    import jax.numpy as jnp
    from proxmin_tpu.utils import grow_stride

    s = jnp.int32(10)
    old = (jnp.asarray(1.0), jnp.asarray(2.0))

    # drift 0.01 < budget 0.05 -> bump = floor(0.05/0.01 * 10) = 50
    new = (jnp.asarray(1.01), jnp.asarray(2.0))
    assert int(grow_stride(s, old, new, 0.05, 100)) == 60
    # capped at max_stride
    assert int(grow_stride(s, old, new, 0.05, 25)) == 25
    # zero drift: no growth (reference requires rel_error > 0)
    assert int(grow_stride(s, old, old, 0.05, 100)) == 10
    # drift above budget: SHRINK back (halve, floor 1) — a re-entered
    # fast-drift phase recovers a tight refresh cadence
    big = (jnp.asarray(1.5), jnp.asarray(2.0))
    assert int(grow_stride(s, old, big, 0.05, 100)) == 5
    assert int(grow_stride(jnp.int32(1), old, big, 0.05, 100)) == 1
    # first refresh (all-zero old steps -> meaningless huge drift):
    # callers pass first=True and the stride is pinned
    zero = (jnp.asarray(0.0), jnp.asarray(0.0))
    assert int(grow_stride(s, zero, new, 0.05, 100, first=True)) == 10
    # first=True also pins a would-grow refresh
    assert int(grow_stride(s, old, new, 0.05, 100, first=True)) == 10


def test_strided_stepper_shrinks_after_perturbation():
    """Quality test for the shrink-back branch (VERDICT r3 item 7): an
    adaptive StridedStepper whose step function settles (stride grows),
    then is perturbed mid-solve (re-entering a fast-drift phase), must
    shrink its refresh interval back down so step staleness stays
    bounded — instead of coasting at the grown stride on stale bounds."""
    import jax.numpy as jnp
    from proxmin_tpu.utils import StridedStepper

    t = {"v": 1.0, "drift": 1.0001}

    def step(x, it=None):
        t["v"] *= t["drift"]
        return t["v"]

    st = StridedStepper(step, 1, stride=2, safety=0.9, adapt=True,
                        max_stride=50)
    x = (jnp.zeros(3),)
    state = st.init_state(x, None)

    # settle phase: tiny step drift -> stride grows via segment refreshes
    it = 0
    while it < 60:
        _, state = st.segment_refresh(state, x, jnp.int32(it))
        it += int(st.state_stride(state))
    grown = int(st.state_stride(state))
    assert grown > 2

    # perturbation: the step value jumps 2x per refresh (fast drift)
    t["drift"] = 2.0
    strides = []
    for _ in range(8):
        _, state = st.segment_refresh(state, x, jnp.int32(it))
        strides.append(int(st.state_stride(state)))
        it += strides[-1]
    # first perturbed refresh sees the jump and halves; repeated drift
    # drives the interval to the floor
    assert strides[0] <= max(1, grown // 2)
    assert strides[-1] == 1


def test_strided_stepper_adaptive_schedule():
    """Adaptive StridedStepper: with a (nearly) constant step function
    the carried stride grows and refreshes become sparse; the returned
    steps always carry the safety factor."""
    import jax.numpy as jnp
    from proxmin_tpu.utils import StridedStepper

    calls = []

    def step(x, it=None):
        calls.append(1)
        return 1.0

    st = StridedStepper(step, 1, stride=2, safety=0.9, adapt=True,
                        max_stride=50)
    x = (jnp.zeros(3),)
    g = (jnp.zeros(3),)
    state = st.init_state(x, g)
    strides = []
    for it in range(40):
        steps, state = st(state, x, jnp.int32(it), g)
        strides.append(int(state[2]))
        np.testing.assert_allclose(float(steps[0]), 0.9)
    # refresh at it=0 (drift vs zeros: no growth), refresh at it=2
    # (zero drift vs equal cached: no growth either -> stride unchanged)
    assert strides[0] == 2

    # now a slowly-drifting step: growth must kick in
    t = {"v": 1.0}

    def step2(x, it=None):
        t["v"] *= 1.0001
        return t["v"]

    # drive through the segmented protocol like the pgm driver would
    st2 = StridedStepper(step2, 1, stride=2, safety=0.9, adapt=True,
                         max_stride=50)
    state = st2.init_state(x, g)
    it = 0
    seen = []
    while it < 100:
        steps, state = st2.segment_refresh(state, x, jnp.int32(it))
        seen.append((it, int(st2.state_stride(state))))
        it += int(st2.state_stride(state))
    # stride grew beyond the initial 2 and is capped at max_stride
    assert seen[-1][1] > 2
    assert all(s <= 50 for _, s in seen)
    # fewer refreshes than iterations/initial-stride
    assert len(seen) < 100 // 2


def test_nmf_step_adapt_weighted_quality(rng):
    """step_adapt=True on the weighted nmf: same final quality as the
    fixed-stride solve within the safety-slack tolerance, with the
    adaptive refresh (pgm segmented mode, dynamic segment lengths)."""
    C, K, N = 4, 3, 96
    Y = rng.random((C, K)).astype(np.float32) @ \
        rng.random((K, N)).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    A1, S1 = jnp.asarray(A0), jnp.asarray(S0)
    r_fix = pt.nmf.nmf(jnp.asarray(Y), A1, S1, W=jnp.asarray(W),
                       e_rel=0, max_iter=200, step_stride=10)
    A2, S2 = jnp.asarray(A0), jnp.asarray(S0)
    r_ad = pt.nmf.nmf(jnp.asarray(Y), A2, S2, W=jnp.asarray(W),
                      e_rel=0, max_iter=200, step_stride=10,
                      step_adapt=True)

    from proxmin_tpu.nmf import log_likelihood
    l_fix = float(log_likelihood(*r_fix.x, Y=jnp.asarray(Y),
                                 W=jnp.asarray(W)))
    l_ad = float(log_likelihood(*r_ad.x, Y=jnp.asarray(Y),
                                W=jnp.asarray(W)))
    l0 = float(log_likelihood(jnp.asarray(A0), jnp.asarray(S0),
                              Y=jnp.asarray(Y), W=jnp.asarray(W)))
    assert l_ad < 0.05 * l0          # both descend far below the init
    assert l_ad < 1.5 * l_fix + 1e-6  # and comparably to fixed stride


def test_nmf_step_adapt_unweighted_and_adaprox(rng):
    """step_adapt composes with the unweighted pgm path (StridedStepper
    wrap) and with adaprox; bsdmm rejects it."""
    C, K, N = 3, 2, 48
    Y = rng.random((C, K)).astype(np.float32) @ \
        rng.random((K, N)).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    from proxmin_tpu.nmf import log_likelihood
    for alg in ("pgm", "adaprox"):
        A, S = jnp.asarray(A0), jnp.asarray(S0)
        r = pt.nmf.nmf(jnp.asarray(Y), A, S, algorithm=alg, e_rel=0,
                       max_iter=150, step_adapt=True)
        l1 = float(log_likelihood(*r.x, Y=jnp.asarray(Y)))
        l0 = float(log_likelihood(jnp.asarray(A0), jnp.asarray(S0),
                                  Y=jnp.asarray(Y)))
        assert l1 < 0.5 * l0, alg

    with pytest.raises(ValueError):
        pt.nmf.nmf(jnp.asarray(Y), jnp.asarray(A0), jnp.asarray(S0),
                   algorithm="bsdmm", e_rel=0, max_iter=5,
                   step_adapt=True)


def test_bsdmm_weighted_step_adapt(rng):
    """step_adapt on the weighted bsdmm CMF path: adaptive per-block
    refresh intervals reach the same quality as the fixed stride, and
    the carried strides actually grow once the bounds settle."""
    C, K, N = 4, 3, 64
    Y = rng.random((C, K)).astype(np.float32) @ \
        rng.random((K, N)).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    from proxmin_tpu.nmf import log_likelihood

    r_fix = pt.nmf.nmf(jnp.asarray(Y), jnp.asarray(A0), jnp.asarray(S0),
                       W=jnp.asarray(W), algorithm="bsdmm", e_rel=0,
                       max_iter=60, step_stride=5)
    r_ad = pt.nmf.nmf(jnp.asarray(Y), jnp.asarray(A0), jnp.asarray(S0),
                      W=jnp.asarray(W), algorithm="bsdmm", e_rel=0,
                      max_iter=60, step_stride=5, step_adapt=True)
    l_fix = float(log_likelihood(*map(jnp.asarray, r_fix.x),
                                 Y=jnp.asarray(Y), W=jnp.asarray(W)))
    l_ad = float(log_likelihood(*map(jnp.asarray, r_ad.x),
                                Y=jnp.asarray(Y), W=jnp.asarray(W)))
    l0 = float(log_likelihood(jnp.asarray(A0), jnp.asarray(S0),
                              Y=jnp.asarray(Y), W=jnp.asarray(W)))
    assert l_ad < 0.1 * l0
    assert l_ad < 1.5 * l_fix + 1e-6

    # unweighted/custom-step bsdmm rejects step_adapt
    with pytest.raises(ValueError):
        pt.nmf.nmf(jnp.asarray(Y), jnp.asarray(A0), jnp.asarray(S0),
                   algorithm="bsdmm", e_rel=0, max_iter=5,
                   step_adapt=True)

    # stride growth observable at the stepper level: drive the adaptive
    # stepper manually with a settled iterate
    from proxmin_tpu.nmf import WeightedBSDMMStepper

    st = WeightedBSDMMStepper(jnp.asarray(W), stride=2, adapt=True)
    state = st.init_bsdmm_state((jnp.asarray(A0), jnp.asarray(S0)))
    cached = jnp.ones((), jnp.float32)
    s0_ = s1_ = cached
    for sweep in range(30):
        # slow drift of the iterate (exactly-zero drift never grows,
        # matching the reference's rel_error > 0 requirement)
        xs = (jnp.asarray(A0) * (1 + 1e-4 * sweep),
              jnp.asarray(S0) * (1 + 1e-4 * sweep))
        s0_, state = st(xs, j=0, state=state, it=jnp.int32(sweep),
                        cached=cached if sweep == 0 else s0_)
        s1_, state = st(xs, j=1, state=state, it=jnp.int32(sweep),
                        cached=cached if sweep == 0 else s1_)
    strides = np.asarray(state[1])
    assert (strides > 2).all()   # both blocks grew their interval


def test_step_adapt_identical_through_callback_loop(rng):
    """Mode-parity invariant: the adaptive weighted stepper produces
    IDENTICAL iterates through the fused while_loop and through the
    callback host loop (the per-iteration __call__ path and the
    segmented path must implement the same refresh schedule)."""
    C, K, N = 4, 3, 48
    Y = rng.random((C, K)).astype(np.float32) @ \
        rng.random((K, N)).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    r_fused = pt.nmf.nmf(jnp.asarray(Y), jnp.asarray(A0),
                         jnp.asarray(S0), W=jnp.asarray(W), e_rel=0,
                         max_iter=25, step_stride=4, step_adapt=True)
    r_cb = pt.nmf.nmf(jnp.asarray(Y), jnp.asarray(A0), jnp.asarray(S0),
                      W=jnp.asarray(W), e_rel=0, max_iter=25,
                      step_stride=4, step_adapt=True,
                      callback=lambda *X, it=None: None)
    np.testing.assert_allclose(np.asarray(r_fused.x[0]),
                               np.asarray(r_cb.x[0]), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(r_fused.x[1]),
                               np.asarray(r_cb.x[1]), rtol=0, atol=0)


def test_export_nmf_solver_weighted_adaptive(tmp_path, rng):
    """AOT export with the ADAPTIVE refresh stride baked in round-trips
    against the live adaptive runner."""
    from proxmin_tpu.export import (
        export_nmf_solver, load_exported, save_exported,
    )

    C, K, N = 4, 3, 256
    blob = export_nmf_solver(C, K, N, e_rel=0.0, tile_n=128,
                             weighted=True, step_stride=5,
                             step_adapt=True)
    solve = load_exported(save_exported(str(tmp_path / "awnmf.bin"),
                                        blob))

    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    A1, S1, it, cA, cS, loss = solve(A0, S0, Y, W, 20)
    assert int(it) == 20

    r = pt.nmf.nmf_pgm_fused(Y, A0.copy(), S0.copy(), W=W, e_rel=0,
                             max_iter=20, tile_n=128, step_stride=5,
                             step_adapt=True)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(r.x[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(r.x[1]),
                               rtol=1e-6)

    # unweighted + step_adapt export is rejected
    with pytest.raises(ValueError, match="weighted"):
        export_nmf_solver(C, K, N, step_adapt=True)


def test_summarize_convergence_warnings_collapses_and_passes_through():
    """Timing harness hygiene (VERDICT r3 item 8): repeated 'did not
    converge' WARNINGs collapse to one summary line; unrelated warnings
    pass through; the filter detaches on exit."""
    import io
    import logging

    logger = logging.getLogger("proxmin")
    stream = io.StringIO()
    handler = logging.StreamHandler(stream)
    logger.addHandler(handler)
    old_level = logger.level
    logger.setLevel(logging.WARNING)
    try:
        with utils.summarize_convergence_warnings() as s:
            for _ in range(7):
                logger.warning("Solution did not converge")
            logger.warning("unrelated warning")
        assert s.count == 7
        out = stream.getvalue()
        # the only mention is inside the one summary line
        assert out.count("Solution did not converge") == 1
        assert "Suppressed 7x" in out
        assert "unrelated warning" in out
        # detached: warnings emit normally again
        logger.warning("Solution did not converge")
        assert stream.getvalue().count("did not converge") == 2
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)


def test_summarize_convergence_warnings_through_driver():
    """The real driver path: fixed-iteration nmf() solves inside the
    context emit no per-solve warning, one summary on exit."""
    import io
    import logging

    rng = np.random.default_rng(3)
    Y = rng.random((3, 32)).astype(np.float32)
    A = rng.random((3, 2)).astype(np.float32)
    S = rng.random((2, 32)).astype(np.float32)

    logger = logging.getLogger("proxmin")
    stream = io.StringIO()
    handler = logging.StreamHandler(stream)
    logger.addHandler(handler)
    old_level = logger.level
    logger.setLevel(logging.WARNING)
    try:
        with utils.summarize_convergence_warnings() as s:
            for _ in range(3):
                pt.nmf.nmf(Y, A.copy(), S.copy(), e_rel=0, max_iter=5)
        assert s.count == 3
        assert stream.getvalue().count("Suppressed 3x") == 1
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)


def test_export_nmf_solver_artifact_only_resume(rng):
    """Single-chip artifact-only preemption (the export_nmf_pgm_sharded
    resume story on one chip): a carry-returning fresh artifact runs 10
    iterations, its outputs[2:] feed the resume artifact for 15 more,
    and the result matches the live uninterrupted fused solve exactly —
    on the weighted strided configuration whose frozen steps and power
    iterate a plain re-call would lose."""
    from proxmin_tpu.export import export_nmf_solver, load_solver

    C, K, N = 4, 3, 256
    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)
    kw = dict(e_rel=0.0, tile_n=128, weighted=True, step_stride=4)
    fresh = load_solver(export_nmf_solver(C, K, N, return_carries=True,
                                          **kw))
    cont = load_solver(export_nmf_solver(C, K, N, resume=True, **kw))

    outs = fresh(A0, S0, Y, W, 10)
    assert len(outs) == 11 and int(outs[2]) == 10
    outs2 = cont(outs[0], outs[1], Y, W, 15, *outs[2:])
    assert int(outs2[2]) == 25

    live = pt.nmf.nmf_pgm_fused(Y, A0.copy(), S0.copy(), W=W, e_rel=0,
                                max_iter=25, tile_n=128, step_stride=4)
    np.testing.assert_array_equal(np.asarray(outs2[0]),
                                  np.asarray(live.x[0]))
    np.testing.assert_array_equal(np.asarray(outs2[1]),
                                  np.asarray(live.x[1]))

    # unweighted: the SSt Gram carry rides the artifact boundary
    fresh_u = load_solver(export_nmf_solver(C, K, N, e_rel=0.0,
                                            tile_n=128,
                                            return_carries=True))
    cont_u = load_solver(export_nmf_solver(C, K, N, e_rel=0.0,
                                           tile_n=128, resume=True))
    o = fresh_u(A0, S0, Y, 7)
    assert len(o) == 7
    o2 = cont_u(o[0], o[1], Y, 8, *o[2:])
    live_u = pt.nmf.nmf_pgm_fused(Y, A0.copy(), S0.copy(), e_rel=0,
                                  max_iter=15, tile_n=128)
    np.testing.assert_array_equal(np.asarray(o2[1]),
                                  np.asarray(live_u.x[1]))


def test_export_nmf_adaprox_solver_artifact_only_resume(rng):
    """Exact artifact-only adaprox continuation (vs warm_start's
    clock-restarting semantics): outputs[2:] — clock, flags, loss,
    moments, rowsum — feed the resume artifact; bit-exact vs live."""
    from proxmin_tpu.export import export_nmf_adaprox_solver, load_solver

    C, K, N = 4, 3, 256
    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)
    kw = dict(e_rel=0.0, tile_n=128, moment_dtype=jnp.bfloat16)
    fresh = load_solver(export_nmf_adaprox_solver(
        C, K, N, return_carries=True, **kw))
    cont = load_solver(export_nmf_adaprox_solver(C, K, N, resume=True,
                                                 **kw))
    outs = fresh(A0, S0, Y, 9)
    assert len(outs) == 11 and int(outs[2]) == 9
    outs2 = cont(outs[0], outs[1], Y, 11, *outs[2:])
    assert int(outs2[2]) == 20

    live = pt.nmf.nmf_adaprox_fused(Y, A0.copy(), S0.copy(), e_rel=0,
                                    max_iter=20, tile_n=128,
                                    moment_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(outs2[1]),
                                  np.asarray(live.x[1]))
    np.testing.assert_array_equal(np.asarray(outs2[0]),
                                  np.asarray(live.x[0]))

    # a ZERO-budget middle link must not brick the chain: the carried
    # loss rides through the no-op (r4 review finding — the inf loop
    # init used to leak out and the next link's div0 heuristic then
    # stopped everything)
    noop = cont(outs[0], outs[1], Y, 0, *outs[2:])
    assert int(noop[2]) == 9 and np.isfinite(float(noop[5]))
    outs3 = cont(noop[0], noop[1], Y, 11, *noop[2:])
    assert int(outs3[2]) == 20
    np.testing.assert_array_equal(np.asarray(outs3[1]),
                                  np.asarray(live.x[1]))

    with pytest.raises(ValueError, match="mutually exclusive"):
        export_nmf_adaprox_solver(C, K, N, resume=True, warm_start=True)


def test_export_nmf_adaprox_solver(tmp_path, rng):
    """AOT export/restore of the fused proximal-Adam solver, cold and
    warm-start artifacts: exported solves match the live runner, and a
    warm artifact continues from a cold artifact's returned moments."""
    from proxmin_tpu.export import (
        export_nmf_adaprox_solver, load_exported, save_exported,
    )

    C, K, N = 4, 3, 256
    blob = export_nmf_adaprox_solver(C, K, N, e_rel=0.0, tile_n=128)
    p = save_exported(str(tmp_path / "adaprox.bin"), blob)
    solve = load_exported(p)

    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    A1, S1, it, cA, cS, loss, MA, VA, MS, VS = solve(A0, S0, Y, 15)
    assert int(it) == 15
    r = pt.nmf.nmf_adaprox_fused(Y, A0.copy(), S0.copy(), e_rel=0,
                                 max_iter=15, tile_n=128)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(r.x[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(r.x[1]),
                               rtol=1e-6)

    # warm artifact continues exactly like the live warm-started runner
    warm_blob = export_nmf_adaprox_solver(C, K, N, e_rel=0.0,
                                          tile_n=128, warm_start=True)
    warm = load_exported(save_exported(str(tmp_path / "warm.bin"),
                                       warm_blob))
    A2, S2 = warm(np.asarray(A1), np.asarray(S1), Y, 10,
                  MA, VA, MS, VS)[:2]
    r2 = pt.nmf.nmf_adaprox_fused(Y, np.array(r.x[0]), np.array(r.x[1]),
                                  e_rel=0, max_iter=10, tile_n=128,
                                  M=r.M, V=r.V)
    np.testing.assert_allclose(np.asarray(S2), np.asarray(r2.x[1]),
                               rtol=1e-6)


def test_export_nmf_adaprox_solver_weighted(tmp_path, rng):
    """Weighted fused-adaprox artifact matches the live weighted runner."""
    from proxmin_tpu.export import export_nmf_adaprox_solver, load_solver

    C, K, N = 4, 3, 256
    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    solve = load_solver(export_nmf_adaprox_solver(
        C, K, N, e_rel=0.0, tile_n=128, weighted=True))
    # weighted artifact signature (A, S, Y, W, max_iter) matches
    # export_nmf_solver's weighted ordering
    A1, S1 = solve(A0, S0, Y, W, 12)[:2]
    r = pt.nmf.nmf_adaprox_fused(Y, A0.copy(), S0.copy(), W=W, e_rel=0,
                                 max_iter=12, tile_n=128)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(r.x[1]),
                               rtol=1e-6)


def test_export_serves_without_library(tmp_path, rng):
    """SERVING.md's AOT claim, proven end-to-end: a serialized solver
    artifact is loaded in a CLEAN subprocess via raw
    jax.export.deserialize — proxmin_tpu is never imported there — and
    produces the same solve as the in-process runner."""
    import subprocess
    import sys as _sys

    from proxmin_tpu.export import export_nmf_solver, save_exported

    C, K, N = 4, 3, 256
    blob = export_nmf_solver(C, K, N, e_rel=0.0, tile_n=128)
    p = save_exported(str(tmp_path / "solver.bin"), blob)

    Y = (rng.random((C, K)) @ rng.random((K, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)
    np.savez(str(tmp_path / "problem.npz"), Y=Y, A0=A0, S0=S0)

    script = (
        "import sys\n"
        "import numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "# one tiny eigh registers the LAPACK FFI targets the artifact's\n"
        "# custom calls resolve against (lazy in jax; an unregistered\n"
        "# target segfaults) — see SERVING.md\n"
        "jnp.linalg.eigh(jnp.eye(2))\n"
        "from jax import export as jax_export\n"
        "blob = open(sys.argv[1], 'rb').read()\n"
        "call = jax_export.deserialize(blob).call\n"
        "d = np.load(sys.argv[2])\n"
        "A1, S1, it, cA, cS, loss = call(d['A0'], d['S0'], d['Y'],\n"
        "                                np.int32(15))\n"
        "assert 'proxmin_tpu' not in sys.modules\n"
        "np.savez(sys.argv[3], A1=np.asarray(A1), S1=np.asarray(S1),\n"
        "         it=np.asarray(it))\n"
        "print('served')\n"
    )
    out = str(tmp_path / "served.npz")
    env = dict(os.environ)
    # the serving process has no repo path (but keeps the environment's
    # sitecustomize entries — dropping those crashes backend
    # registration); the sys.modules assert below is the real proof
    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(pt.__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p_ for p_ in env.get("PYTHONPATH", "").split(os.pathsep)
        if p_ and os.path.abspath(p_) != repo_root)
    r = subprocess.run(
        [_sys.executable, "-c", script, p,
         str(tmp_path / "problem.npz"), out],
        env=env, cwd=str(tmp_path), timeout=240, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    assert b"served" in r.stdout

    served = np.load(out)
    assert int(served["it"]) == 15
    live = pt.nmf.nmf_pgm_fused(Y, A0.copy(), S0.copy(), e_rel=0,
                                max_iter=15, tile_n=128)
    np.testing.assert_allclose(served["A1"], np.asarray(live.x[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(served["S1"], np.asarray(live.x[1]),
                               rtol=1e-6)


def test_input_ux(rng):
    """User-error UX: clear messages for common mistakes; half/int
    iterates promote to f32 instead of crashing the while_loop carry."""
    from proxmin_tpu import operators
    from proxmin_tpu.nmf import nmf

    C, K, N = 4, 3, 32
    Y = rng.random((C, N)).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    with pytest.raises(ValueError, match="shape mismatch"):
        nmf(Y, A0.T, S0, max_iter=3)
    with pytest.raises(ValueError, match="shape mismatch"):
        nmf(Y, A0, rng.random((K + 1, N)).astype(np.float32), max_iter=3)
    with pytest.raises(ValueError, match="unknown algorithm"):
        nmf(Y, A0, S0, algorithm="newton", max_iter=3)

    # half/integer iterates promote to f32 (reduced-precision STORAGE
    # is the fused engines' store_dtype/moment_dtype)
    r = nmf(Y.astype(np.float16), A0.astype(np.float16),
            S0.astype(np.float16), max_iter=3)
    assert jnp.asarray(r.x[1]).dtype == jnp.result_type(float)
    r = nmf((Y * 10).astype(np.int32), A0, S0, max_iter=3)
    assert np.isfinite(float(jnp.sum(jnp.asarray(r.x[1]))))

    # an integer X block promotes too — and is NOT written back in
    # place (float results would truncate silently)
    x_int = np.array([3, -2])
    res = pt.pgm(x_int, lambda x: x - jnp.ones(2), 0.5, max_iter=5)
    assert jnp.asarray(res.x).dtype == jnp.result_type(float)
    assert x_int.dtype.kind == "i" and x_int[0] == 3  # untouched

    with pytest.raises(AssertionError, match="prox operators"):
        pt.pgm([jnp.zeros(2)], lambda x: x, 0.5,
               prox=[operators.prox_plus, operators.prox_plus],
               max_iter=3)

    # 'admm'/'sdmm' resolve as algorithms attributes but nmf has no
    # routing for them — must get the clear error, not a late repr
    with pytest.raises(ValueError, match="unknown algorithm"):
        nmf(Y, A0, S0, algorithm="admm", max_iter=3)

    # the fused and sharded engine routes promote too (they bypass the
    # XLA drivers' tupleize)
    from proxmin_tpu.nmf import nmf_pgm_fused
    r = nmf_pgm_fused(Y.astype(np.float16), A0.astype(np.float16),
                      S0.astype(np.float16), e_rel=0.0, max_iter=3)
    assert jnp.asarray(r.x[1]).dtype == jnp.result_type(float)
    from proxmin_tpu.parallel import make_mesh, nmf_pgm_sharded
    r = nmf_pgm_sharded(Y.astype(np.float16), A0.astype(np.float16),
                        S0.astype(np.float16), mesh=make_mesh(),
                        e_rel=0.0, max_iter=3)
    assert jnp.asarray(r.x[1]).dtype == jnp.result_type(float)

    # an f16 NumPy input is NOT written back (f32 results would
    # truncate); a same-width float input still is (reference contract)
    a16 = A0.astype(np.float16)
    before = a16.copy()
    nmf(Y.astype(np.float16), a16, S0.astype(np.float16), max_iter=3)
    np.testing.assert_array_equal(a16, before)
