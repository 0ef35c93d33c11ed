"""ADMM / SDMM / bSDMM solver tests: analytic optima, constraint handling,
restart machinery, and reference parity."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("proxmin")

from proxmin_tpu import admm, sdmm, bsdmm, operators  # noqa: E402
import proxmin_tpu as pt  # noqa: E402


CENTER = np.array([1.0, 0.5])
RADIUS = 0.5
DISK_OPT = RADIUS * CENTER / np.linalg.norm(CENTER)


def prox_f_quad(v, step):
    """prox of f(x) = 0.5 ||x - CENTER||^2."""
    return (v + step * jnp.asarray(CENTER)) / (1.0 + step)


def prox_f_quad_np(v, step):
    return (v + step * CENTER) / (1.0 + step)


def prox_disk(v, step, r=RADIUS):
    nrm = jnp.sqrt(jnp.sum(v ** 2))
    return jnp.where(nrm > r, v * (r / nrm), v)


def prox_disk_np(v, step, r=RADIUS):
    nrm = np.linalg.norm(v)
    if nrm > r:
        v = v * (r / nrm)
    return v


def test_admm_disk():
    res = admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
               prox_g=prox_disk, e_rel=1e-8, max_iter=2000)
    converged, error = res
    np.testing.assert_allclose(np.asarray(res.x), DISK_OPT, atol=1e-5)
    assert converged
    assert len(error) == 4


def test_admm_no_constraint_fixed_point():
    """prox_g=None falls back to the plain fixed-point method on prox_f."""
    res = admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
               e_rel=1e-10, max_iter=2000, e_abs=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), CENTER, atol=1e-5)


def test_admm_with_linear_operator(rng):
    """L inside g: soft-threshold on Lx. Verified against the reference."""
    L = rng.normal(size=(3, 2))

    def prox_g(v, step):
        return operators.prox_soft(v, step, thresh=0.1)

    def prox_g_np(v, step):
        t = 0.1 * step
        return np.sign(v) * np.maximum(np.abs(v) - t, 0)

    x_ref = np.array([-1.0, -1.0])
    ref.admm(x_ref, prox_f_quad_np, lambda X, it=None: 0.3,
             prox_g=prox_g_np, L=L, e_rel=0, e_abs=0, max_iter=40)

    res = admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.3,
               prox_g=prox_g, L=jnp.asarray(L), e_rel=0, e_abs=0,
               max_iter=40)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-9,
                               atol=1e-11)


def test_admm_parity_disk():
    x_ref = np.array([-1.0, -1.0])
    ref.admm(x_ref, prox_f_quad_np, lambda X, it=None: 0.5,
             prox_g=prox_disk_np, e_rel=0, max_iter=30)
    res = admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
               prox_g=prox_disk, e_rel=0, max_iter=30)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-10,
                               atol=1e-12)


def test_admm_restart_triggers_and_terminates():
    """A stalling problem must trigger the slack-halving restart and still
    terminate (the reference can spin forever; we cap total work)."""
    def prox_f_const(v, step):
        return jnp.asarray([0.3, 0.3])  # ignores input -> X stalls

    def prox_g_const(v, step):
        return jnp.asarray([9.0, 9.0])  # unreachable constraint -> R stalls

    res = admm(jnp.asarray([0.0, 0.0]), prox_f_const, 0.5,
               prox_g=prox_g_const, e_rel=1e-6, max_iter=50)
    assert res.slack < 1.0                      # restarts happened
    assert res.total_iterations > res.iterations
    assert res.total_iterations <= 8 * 50       # bounded work


def test_sdmm_two_constraints():
    """Disk + half-plane x_1 >= 0.15: optimum is the disk boundary point
    with x_1 clamped."""
    def prox_halfplane(v, step):
        return v.at[1].set(jnp.maximum(v[1], 0.15))

    res = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
               proxs_g=[prox_disk, prox_halfplane],
               e_rel=1e-8, max_iter=3000)
    x = np.asarray(res.x)
    assert np.linalg.norm(x) <= RADIUS + 1e-4
    assert x[1] >= 0.15 - 1e-4
    # optimal: project CENTER onto the intersection
    # (for this geometry the disk constraint binds, x stays near DISK_OPT
    # which already satisfies x1 > 0.15)
    np.testing.assert_allclose(x, DISK_OPT, atol=1e-3)


def test_sdmm_parity(rng):
    L1 = rng.normal(size=(2, 2))

    def pg1(v, step):
        return operators.prox_soft(v, step, thresh=0.05)

    def pg1_np(v, step):
        t = 0.05 * step
        return np.sign(v) * np.maximum(np.abs(v) - t, 0)

    def pg2(v, step):
        return jnp.maximum(v, 0)

    def pg2_np(v, step):
        return np.maximum(v, 0)

    x_ref = np.array([-1.0, -1.0])
    ref.sdmm(x_ref, prox_f_quad_np, lambda X, it=None: 0.3,
             proxs_g=[pg1_np, pg2_np], Ls=[L1, None],
             e_rel=0, max_iter=25)
    res = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.3,
               proxs_g=[pg1, pg2], Ls=[jnp.asarray(L1), None],
               e_rel=0, max_iter=25)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-9,
                               atol=1e-11)


def test_sdmm_falls_back_to_admm():
    res = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
               proxs_g=prox_disk, e_rel=1e-8, max_iter=2000)
    converged, error = res  # admm-style return
    np.testing.assert_allclose(np.asarray(res.x), DISK_OPT, atol=1e-5)


def test_sdmm_result_truthiness():
    """Reference sdmm returns a bare flag; ours must keep its truthiness."""
    res = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
               proxs_g=[prox_disk], e_rel=1e-8, max_iter=3)
    assert not res  # 3 iterations can't converge
    res2 = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
                proxs_g=[prox_disk], e_rel=1e-6, max_iter=3000)
    assert res2


def test_admm_callback_stopiteration():
    seen = []

    def cb(X, it=None):
        seen.append(it)
        if it >= 3:
            raise StopIteration

    admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5, prox_g=prox_disk,
         callback=cb, e_rel=1e-12, max_iter=100)
    assert seen == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# bSDMM


def test_bsdmm_nmf_parity(rng):
    """The CMF backend: gradient-step prox_f per block inside the dual
    loop, vs the reference bsdmm driven the same way."""
    b, n, k = 12, 10, 2
    Y = rng.random((b, k)) @ rng.random((k, n))
    A0, S0 = rng.random((b, k)), rng.random((k, n))

    # ours (through the nmf application layer)
    A_j, S_j = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A_j, S_j, algorithm="bsdmm", e_rel=0, max_iter=15)

    # reference (through its nmf layer)
    A_r, S_r = A0.copy(), S0.copy()
    ref.nmf.nmf(Y, A_r, S_r, algorithm=ref.bsdmm, e_rel=0, max_iter=15)

    np.testing.assert_allclose(A_j, A_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(S_j, S_r, rtol=1e-9, atol=1e-11)


def test_bsdmm_with_constraints_parity(rng):
    """Blocks with per-block constraint lists (nested proxs_g)."""
    c1 = np.array([1.0, -0.5])
    c2 = np.array([0.2, 0.8, -0.1])

    def proxs_f_np(x, step, Xs=None, j=None):
        c = [c1, c2][j]
        return (x + step * c) / (1 + step)

    def proxs_f(x, step, Xs=None, j=None):
        c = jnp.asarray([c1, c2][j])
        return (x + step * c) / (1 + step)

    def steps_np(Xs, j=None):
        return 0.4

    def pg_np(v, step):
        return np.maximum(v, 0)

    def pg(v, step):
        return jnp.maximum(v, 0)

    x_ref = [c1 * 0, c2 * 0]
    ref.bsdmm(x_ref, proxs_f_np, steps_np,
              proxs_g=[[pg_np], [pg_np, pg_np]],
              e_rel=0, max_iter=20)

    res = bsdmm([jnp.zeros(2), jnp.zeros(3)], proxs_f, steps_np,
                proxs_g=[[pg], [pg, pg]], e_rel=0, max_iter=20)
    np.testing.assert_allclose(np.asarray(res.x[0]), x_ref[0], rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x[1]), x_ref[1], rtol=1e-9,
                               atol=1e-12)


def test_bsdmm_update_order(rng):
    """Custom update order changes the Gauss-Seidel sweep (parity with
    reference under the same order)."""
    c1, c2 = np.array([2.0]), np.array([3.0])

    def proxs_f_np(x, step, Xs=None, j=None):
        # couple the blocks: target depends on the other block
        other = Xs[1 - j]
        c = [c1, c2][j] + 0.1 * other
        return (x + step * c) / (1 + step)

    def proxs_f(x, step, Xs=None, j=None):
        other = Xs[1 - j]
        c = jnp.asarray([c1, c2][j]) + 0.1 * other
        return (x + step * c) / (1 + step)

    steps = lambda Xs, j=None: 0.5

    for order in [(0, 1), (1, 0)]:
        x_ref = [np.zeros(1), np.zeros(1)]
        ref.bsdmm(x_ref, proxs_f_np, steps, update_order=list(order),
                  e_rel=0, max_iter=12)
        res = bsdmm([jnp.zeros(1), jnp.zeros(1)], proxs_f, steps,
                    update_order=order, e_rel=0, max_iter=12)
        np.testing.assert_allclose(np.asarray(res.x[0]), x_ref[0],
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(res.x[1]), x_ref[1],
                                   rtol=1e-10)


def test_bsdmm_callback():
    seen = []

    def cb(*X, it=None):
        seen.append(it)
        if it >= 2:
            raise StopIteration

    def proxs_f(x, step, Xs=None, j=None):
        return x * 0.5

    bsdmm([jnp.ones(2)], proxs_f, lambda Xs, j=None: 0.5,
          callback=cb, max_iter=100)
    assert seen == [0, 1, 2]


def test_sdmm_single_constraint_list_parity(rng):
    """sdmm with a one-element constraint list follows the sdmm convention
    (evaluated step_g in the convergence test, reference algorithms.py:625)
    — regression for the shared-core admm parity fix."""
    def pg_np(v, step):
        return np.maximum(v, 0)

    def pg(v, step):
        return jnp.maximum(v, 0)

    L = rng.normal(size=(2, 2))
    import logging

    msgs = []

    class _H(logging.Handler):
        def emit(self, record):
            msgs.append(record.getMessage())

    handler = _H()
    logging.getLogger("proxmin").addHandler(handler)
    logging.getLogger("proxmin").setLevel(logging.INFO)
    try:
        x_ref = np.array([-1.0, -1.0])
        flag = ref.sdmm(x_ref, prox_f_quad_np, lambda X, it=None: 0.3,
                        proxs_g=[pg_np], Ls=[L], e_rel=1e-4, max_iter=500)
    finally:
        logging.getLogger("proxmin").removeHandler(handler)
    ref_iters = int(next(m.split()[1] for m in msgs if "Completed" in m))
    assert bool(flag)

    res = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.3,
               proxs_g=[pg], Ls=[jnp.asarray(L)], e_rel=1e-4, max_iter=500)
    # identical stopping iteration and iterate as the live reference
    assert res.iterations == ref_iters
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8,
                               atol=1e-10)


def test_admm_numpy_L_mutation_not_stale(rng):
    """Regression: mutable NumPy operator arguments bypass the driver
    cache — in-place mutation between solves must be honored."""
    L = np.eye(2)
    r1 = admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
              prox_g=prox_disk, L=L, e_rel=1e-8, max_iter=2000)
    x1 = np.asarray(r1.x)
    L[:] = 2 * np.eye(2)   # mutate in place, same object id
    r2 = admm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
              prox_g=prox_disk, L=L, e_rel=1e-8, max_iter=2000)
    x2 = np.asarray(r2.x)
    # with 2I inside g, the effective disk radius halves
    assert not np.allclose(x1, x2)
    assert np.linalg.norm(x2) <= 0.25 + 1e-4


def test_bsdmm_jnp_array_tolerances():
    """Regression: jnp-array per-block tolerances must not crash the
    cache-key construction."""
    def proxs_f(x, step, Xs=None, j=None):
        return (x + step * jnp.asarray(CENTER)) / (1 + step)

    res = bsdmm([jnp.zeros(2)], proxs_f, lambda Xs, j=None: 0.5,
                e_rel=jnp.asarray([1e-6]), e_abs=jnp.asarray([0.0]),
                max_iter=20)
    assert np.isfinite(np.asarray(res.x[0])).all()


def test_nmf_bsdmm_none_prox(rng):
    """Regression: prox_A=None with algorithm='bsdmm' means identity like
    the other paths (was TypeError)."""
    Y = rng.standard_normal((6, 8))
    A0, S0 = rng.random((6, 2)), rng.random((2, 8))
    res = pt.nmf.nmf(Y, A0, S0, algorithm="bsdmm", prox_A=None,
                     prox_S=None, e_rel=0, max_iter=10)
    assert np.isfinite(np.asarray(res.x[1])).all()


def test_sdmm_scalar_fallback_honors_e_abs():
    """Pins the documented deviation from the reference: sdmm's
    single-constraint fallback forwards e_abs to admm (the reference
    drops it, algorithms.py:568-579), so the scalar spelling behaves
    exactly like a direct admm call — and e_abs actually loosens the
    stopping criterion."""
    x0 = jnp.asarray([-1.0, -1.0])
    r_sdmm = sdmm(x0, prox_f_quad, 0.5, proxs_g=prox_disk,
                  e_rel=1e-6, e_abs=1e-2, max_iter=2000)
    r_admm = admm(x0, prox_f_quad, 0.5, prox_g=prox_disk,
                  e_rel=1e-6, e_abs=1e-2, max_iter=2000)
    assert r_sdmm.iterations == r_admm.iterations
    np.testing.assert_allclose(np.asarray(r_sdmm.x), np.asarray(r_admm.x),
                               rtol=0, atol=0)
    # and the loose e_abs stops earlier than e_abs=0
    r_tight = sdmm(x0, prox_f_quad, 0.5, proxs_g=prox_disk,
                   e_rel=1e-6, e_abs=0, max_iter=2000)
    assert r_sdmm.iterations < r_tight.iterations


def test_bsdmm_weighted_stepper_matches_strided_adapter(rng):
    """nmf's WeightedBSDMMStepper (stateful per-block warm-started
    bounds) reproduces the generic steps_f_stride machinery driving the
    both-bounds adapter (same refresh schedule, same 0.9 safety)."""
    from proxmin_tpu.nmf import _bsdmm_adapters

    C, K, n_px = 4, 3, 120
    Y = rng.random((C, K)) @ rng.random((K, n_px))
    W = 0.5 + rng.random((C, n_px))
    A0, S0 = rng.random((C, K)), rng.random((K, n_px))

    A1, S1 = A0.copy(), S0.copy()
    prox_f, step_f_old = _bsdmm_adapters(
        jnp.asarray(Y), jnp.asarray(W),
        (operators.prox_plus, operators.prox_plus), None)
    bsdmm([A1, S1], prox_f, step_f_old, e_rel=0, max_iter=30,
          steps_f_stride=10)

    A2, S2 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A2, S2, W=W, algorithm="bsdmm", e_rel=0, max_iter=30,
               step_stride=10)
    np.testing.assert_allclose(A1, A2, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(S1, S2, rtol=1e-10, atol=1e-12)


def test_bsdmm_weighted_stepper_callback_mode(rng):
    """The stateful WeightedBSDMMStepper round-trips through the
    compiled-step host loop (callback mode) identically to the fused
    while-loop path."""
    C, K, n_px = 4, 3, 100
    Y = rng.random((C, K)) @ rng.random((K, n_px))
    W = 0.5 + rng.random((C, n_px))
    A0, S0 = rng.random((C, K)), rng.random((K, n_px))

    hits = []

    def cb(*X, it=None):
        hits.append(it)

    A1, S1 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A1, S1, W=W, algorithm="bsdmm", e_rel=0, max_iter=20,
               step_stride=10, callback=cb)
    assert len(hits) == 20

    A2, S2 = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A2, S2, W=W, algorithm="bsdmm", e_rel=0, max_iter=20,
               step_stride=10)
    np.testing.assert_allclose(S1, S2, rtol=1e-12, atol=1e-14)


def test_admm_adapt_step_corrects_misscaled_steps(rng):
    """Boyd §3.4.1 residual balancing (adapt_step=True): a step_f wrong
    by orders of magnitude converges in a few dozen iterations instead
    of thousands, while a well-scaled step is left untouched (the
    balance band ||R|| <= 10 ||S|| never trips). The reference defines
    this adaptation but never wires it (utils.py:282-292)."""
    n = 64
    y = jnp.asarray(np.cumsum(rng.normal(size=n)) + 0.3 *
                    rng.normal(size=n))
    D = jnp.asarray(np.eye(n)[1:] - np.eye(n)[:-1])

    def prox_f(v, step):
        return (v + step * y) / (1.0 + step)

    def prox_tv(v, step):
        return operators.prox_soft(v, step, thresh=0.5)

    # reference point: a good fixed step
    r_good = admm(y, prox_f, 0.5, prox_g=prox_tv, L=D, e_rel=1e-5,
                  max_iter=10000)
    assert r_good.converged

    for bad in (0.005, 50.0):
        r_fix = admm(y, prox_f, bad, prox_g=prox_tv, L=D, e_rel=1e-5,
                     max_iter=10000)
        r_ad = admm(y, prox_f, bad, prox_g=prox_tv, L=D, e_rel=1e-5,
                    max_iter=10000, adapt_step=True)
        assert r_ad.converged
        # at least 10x fewer iterations than the fixed mis-scaled step
        assert r_ad.iterations * 10 <= max(r_fix.iterations, 1000)
        # same solution as the well-stepped solve
        np.testing.assert_allclose(np.asarray(r_ad.x),
                                   np.asarray(r_good.x), atol=5e-4)

    # well-scaled step: adaptation never trips, solve is identical
    r_ad0 = admm(y, prox_f, 0.5, prox_g=prox_tv, L=D, e_rel=1e-5,
                 max_iter=10000, adapt_step=True)
    assert r_ad0.iterations == r_good.iterations
    np.testing.assert_allclose(np.asarray(r_ad0.x), np.asarray(r_good.x),
                               rtol=0, atol=0)


def test_sdmm_adapt_step(rng):
    """adapt_step on the multi-constraint driver: mis-scaled step
    recovers and reaches the same constrained optimum."""
    def prox_halfplane(v, step):
        return v.at[0].set(jnp.maximum(v[0], 0.15))

    r_good = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 0.5,
                  proxs_g=[prox_disk, prox_halfplane], e_rel=1e-7,
                  max_iter=20000)
    r_ad = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 200.0,
                proxs_g=[prox_disk, prox_halfplane], e_rel=1e-7,
                max_iter=20000, adapt_step=True)
    r_fix = sdmm(jnp.asarray([-1.0, -1.0]), prox_f_quad, 200.0,
                 proxs_g=[prox_disk, prox_halfplane], e_rel=1e-7,
                 max_iter=20000)
    assert r_ad.converged
    assert r_ad.iterations < r_fix.iterations
    np.testing.assert_allclose(np.asarray(r_ad.x), np.asarray(r_good.x),
                               atol=1e-4)


def test_adapt_step_rejects_explicit_step_g():
    """adapt_step requires the derived step_g coupling: a fixed user
    step_g cannot track the adapted step_f (review finding: the
    combination diverges to NaN), so it is rejected up front."""
    with pytest.raises(ValueError, match="adapt_step"):
        admm(jnp.asarray([0.0, 0.0]), prox_f_quad, 0.5,
             prox_g=prox_disk, step_g=0.5, adapt_step=True)
    with pytest.raises(ValueError, match="adapt_step"):
        sdmm(jnp.asarray([0.0, 0.0]), prox_f_quad, 0.5,
             proxs_g=[prox_disk, prox_disk], steps_g=[0.5, 0.5],
             adapt_step=True)
    from proxmin_tpu.functional import make_admm_solver
    with pytest.raises(ValueError, match="adapt_step"):
        make_admm_solver(prox_f_quad, 0.5, prox_g=prox_disk,
                         step_g=0.5, adapt_step=True)


# ---------------------------------------------------------------------------
# failure detection (SURVEY.md §5): the ADMM family stops early on a
# non-finite iterate and reports a structured status, like pgm/adaprox

def _nan_prox(x, step):
    return jnp.full_like(x, jnp.nan)


def test_admm_divergence_detection():
    x0 = np.ones(3)
    res = admm(x0.copy(), _nan_prox, 0.5, prox_g=operators.prox_plus,
               e_rel=1e-6, max_iter=200)
    assert res.status == "diverged"
    assert not res.converged
    assert res.iterations < 200


def test_sdmm_divergence_detection():
    x0 = np.ones(3)
    res = sdmm(x0.copy(), _nan_prox, 0.5,
               proxs_g=[operators.prox_plus, operators.prox_id],
               e_rel=1e-6, max_iter=200)
    assert res.status == "diverged"
    assert res.iterations < 200


def test_bsdmm_divergence_detection():
    x0 = [np.ones(3), np.ones(2)]

    def proxs_f(v, s, Xs=None, j=None):
        return jnp.full_like(v, jnp.nan) if j == 1 else v

    def steps_f(Xs, j=None):
        return 0.5

    res = bsdmm([b.copy() for b in x0], proxs_f, steps_f,
                proxs_g=[operators.prox_plus, operators.prox_plus],
                e_rel=1e-6, max_iter=200)
    assert res.status == "diverged"
    assert res.iterations < 200


def test_admm_status_reports_converged_and_max_iter():
    def grad_step_prox(x, step):  # gradient step toward 1 under x>=0
        return operators.prox_plus(x - step * (x - 1.0), step)

    res = admm(np.full(3, 5.0), grad_step_prox, 0.5,
               prox_g=operators.prox_plus, e_rel=1e-8, max_iter=3000)
    assert res.status == "converged" and res.converged
    res2 = admm(np.full(3, 5.0), grad_step_prox, 0.5,
                prox_g=operators.prox_plus, e_rel=1e-12, max_iter=3)
    assert res2.status == "max_iter" and not res2.converged
