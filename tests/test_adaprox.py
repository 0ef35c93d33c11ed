"""AdaProx solver tests: all six schemes on analytic problems, prox
sub-iterations, warm start, convergence toggles."""

import numpy as np
import jax.numpy as jnp
import pytest

from proxmin_tpu import adaprox, operators
from proxmin_tpu.solvers.adaprox import SCHEMES


CENTER = np.array([1.0, 0.5])
RADIUS = 0.5
DISK_OPT = RADIUS * CENTER / np.linalg.norm(CENTER)


def grad_f(x):
    return x - CENTER


def prox_disk(x, step, r=RADIUS):
    nrm = jnp.sqrt(jnp.sum(x ** 2))
    return jnp.where(nrm > r, x * (r / nrm), x)


@pytest.mark.parametrize("scheme", sorted(SCHEMES))
def test_adaprox_schemes_unconstrained(scheme):
    res = adaprox(jnp.asarray([-1.0, -1.0]), grad_f, 0.1, scheme=scheme,
                  e_rel=1e-9, max_iter=3000)
    np.testing.assert_allclose(np.asarray(res.x), CENTER, atol=1e-4)


@pytest.mark.parametrize("scheme", ["adam", "amsgrad", "padam"])
def test_adaprox_disk_constraint(scheme):
    res = adaprox(jnp.asarray([-1.0, -1.0]), grad_f, 0.1, prox=prox_disk,
                  scheme=scheme, e_rel=1e-9, max_iter=3000)
    np.testing.assert_allclose(np.asarray(res.x), DISK_OPT, atol=1e-3)
    # sub-iterations were actually taken
    assert res.sub_iterations[0] > 0


def test_adaprox_returns_reference_tuple():
    converged, M, V, Vhat = adaprox(
        jnp.asarray([-1.0, -1.0]), grad_f, 0.1, e_rel=1e-8, max_iter=200
    )
    assert isinstance(converged, tuple)
    assert np.asarray(M[0]).shape == (2,)


def test_adaprox_warm_start():
    """Continuing from returned moments reproduces an uninterrupted run."""
    x0 = jnp.asarray([-1.0, -1.0])
    full = adaprox(x0, grad_f, 0.1, e_rel=0, max_iter=40,
                   check_convergence=False)

    first = adaprox(x0, grad_f, 0.1, e_rel=0, max_iter=20,
                    check_convergence=False)
    # continue: reference semantics restart the b1 schedule and bias
    # correction at it=0, so exact parity needs the same total schedule —
    # here b1 is constant so only the bias correction differs slightly;
    # check we end close to the full run and closer than the half run
    second = adaprox(first.x, grad_f, 0.1, e_rel=0, max_iter=20,
                     check_convergence=False,
                     M=first.M, V=first.V, Vhat=first.Vhat)
    d_init = np.linalg.norm(np.array([-1.0, -1.0]) - CENTER)
    d_warm = np.linalg.norm(np.asarray(second.x) - CENTER)
    d_full = np.linalg.norm(np.asarray(full.x) - CENTER)
    # the restart resets the bias correction (reference semantics), so the
    # trajectories differ slightly; the warm-started run must still make
    # progress comparable to the uninterrupted one
    assert d_warm < d_init / 2
    assert abs(d_warm - d_full) < 0.1


def test_adaprox_no_convergence_check():
    res = adaprox(jnp.asarray([-1.0, -1.0]), grad_f, 0.1, e_rel=1e-9,
                  max_iter=50, check_convergence=False)
    assert res.converged == (None,)
    assert res.iterations == 50


def test_adaprox_b1_schedule():
    b1 = np.linspace(0.9, 0.5, 100)
    res = adaprox(jnp.asarray([-1.0, -1.0]), grad_f, 0.1, b1=b1,
                  e_rel=1e-9, max_iter=100, check_convergence=False)
    assert np.isfinite(np.asarray(res.x)).all()


def test_adaprox_multiblock_per_element_steps():
    c1, c2 = jnp.asarray([2.0, 0.5]), jnp.asarray([[1.0, -1.0]])

    def g(x1, x2):
        return x1 - c1, x2 - c2

    def step(x1, x2, it=None):
        return (jnp.full_like(x1, 0.1), jnp.full_like(x2, 0.05))

    res = adaprox([jnp.zeros(2), jnp.zeros((1, 2))], g, step,
                  prox=[None, operators.prox_plus],
                  e_rel=1e-9, max_iter=4000)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(c1), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(res.x[1]), np.maximum(np.asarray(c2), 0), atol=1e-3
    )


def test_adaprox_callback_stopiteration():
    seen = []

    def cb(*X, it=None):
        seen.append(it)
        if it >= 4:
            raise StopIteration

    adaprox(jnp.asarray([-1.0, -1.0]), grad_f, 0.1, callback=cb,
            max_iter=100)
    assert seen == [0, 1, 2, 3, 4]


def test_adaprox_invalid_args():
    x = jnp.zeros(2)
    with pytest.raises(AssertionError):
        adaprox(x, grad_f, 0.1, scheme="bogus")
    with pytest.raises(AssertionError):
        adaprox(x, grad_f, 0.1, b2=1.5)
    with pytest.raises(AssertionError):
        adaprox(x, grad_f, 0.1, p=0.9)


def test_adaprox_warm_start_does_not_donate_user_moments():
    """Regression: the documented warm-start workflow must not delete the
    caller's moment buffers via carry donation."""
    x0 = jnp.asarray([-1.0, -1.0])
    r1 = adaprox(x0, grad_f, 0.1, e_rel=0, max_iter=10,
                 check_convergence=False)
    adaprox(r1.x, grad_f, 0.1, e_rel=0, max_iter=10,
            check_convergence=False, M=r1.M, V=r1.V, Vhat=r1.Vhat)
    # reading the first run's moments must still work
    assert np.isfinite(np.asarray(r1.M[0])).all()
    assert np.isfinite(np.asarray(r1.V[0])).all()


def test_adaprox_list_warm_start_moments():
    """Warm-start M/V/Vhat accept plain Python lists (review r2s3)."""
    import proxmin_tpu as pt

    c = jnp.asarray([1.0, 0.5])
    res = pt.adaprox(jnp.zeros(2), lambda x: x - c, 0.1,
                     M=[[0.01, 0.02]], V=[[0.001, 0.002]],
                     Vhat=[[0.001, 0.002]], e_rel=0, max_iter=5,
                     check_convergence=False)
    assert np.isfinite(np.asarray(res.x)).all()


def test_adaprox_separable_prox_closed_form():
    """separable_prox: the closed-form scaled prox equals what the
    sub-iteration loop converges to (same optimum, exact subproblem)."""
    import proxmin_tpu as pt

    c = jnp.asarray([1.0, 0.5])

    def grad(x):
        return x - c

    r_sub = pt.adaprox(jnp.asarray([-1.0, -1.0]), grad, 0.1,
                       prox=pt.operators.prox_plus, e_rel=1e-10,
                       max_iter=2000)
    r_sep = pt.adaprox(jnp.asarray([-1.0, -1.0]), grad, 0.1,
                       prox=pt.operators.prox_plus, e_rel=1e-10,
                       max_iter=2000, separable_prox=True)
    np.testing.assert_allclose(np.asarray(r_sep.x), np.asarray(r_sub.x),
                               atol=1e-7)
    # the closed form does exactly ONE application per iteration
    assert r_sep.sub_iterations[0] == r_sep.iterations
    assert r_sub.sub_iterations[0] > r_sub.iterations

    # "auto" detects the library operator's separable marker
    r_auto = pt.adaprox(jnp.asarray([-1.0, -1.0]), grad, 0.1,
                        prox=pt.operators.prox_plus, e_rel=1e-10,
                        max_iter=2000, separable_prox="auto")
    np.testing.assert_allclose(np.asarray(r_auto.x), np.asarray(r_sep.x),
                               rtol=1e-12)


def test_adaprox_separable_auto_skips_nonseparable():
    """'auto' keeps the sub-iteration loop for non-separable proxs
    (prox_unity normalizes across elements) and for prox_hard (L0)."""
    import functools

    import proxmin_tpu as pt

    c = jnp.asarray([0.6, 0.3])

    r1 = pt.adaprox(jnp.asarray([0.4, 0.2]), lambda x: x - c, 0.1,
                    prox=functools.partial(pt.operators.prox_unity, axis=0),
                    e_rel=1e-8, max_iter=500, separable_prox="auto")
    r2 = pt.adaprox(jnp.asarray([0.4, 0.2]), lambda x: x - c, 0.1,
                    prox=functools.partial(pt.operators.prox_unity, axis=0),
                    e_rel=1e-8, max_iter=500)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)  # identical path taken


def test_adaprox_separable_soft_threshold_partial():
    """Closed form through a functools.partial-wrapped separable prox
    (per-element thresholds scale with the per-element step)."""
    import functools

    import proxmin_tpu as pt

    c = jnp.asarray([1.0, -0.8, 0.3])
    prox = functools.partial(pt.operators.prox_soft, thresh=0.05)
    r_sub = pt.adaprox(jnp.zeros(3), lambda x: x - c, 0.1, prox=prox,
                       e_rel=1e-10, max_iter=3000)
    r_sep = pt.adaprox(jnp.zeros(3), lambda x: x - c, 0.1, prox=prox,
                       e_rel=1e-10, max_iter=3000, separable_prox="auto")
    np.testing.assert_allclose(np.asarray(r_sep.x), np.asarray(r_sub.x),
                               atol=1e-6)


def test_separable_auto_respects_operator_kwargs():
    """Review r2s3: 'auto' must consult the operators' separable_when
    predicates — absolute-type thresholds and step-scaled interval
    projections do NOT admit the closed form."""
    import functools

    import proxmin_tpu as pt
    from proxmin_tpu.solvers.common import separable_blocks

    cases = [
        (pt.operators.prox_plus, True),
        (functools.partial(pt.operators.prox_soft, thresh=0.1), True),
        (functools.partial(pt.operators.prox_soft, thresh=0.1,
                           type="absolute"), False),
        (functools.partial(pt.operators.prox_min, thresh=0.5), False),
        (functools.partial(pt.operators.prox_min, thresh=0.5,
                           type="absolute"), True),
        (pt.operators.prox_min, True),      # thresh=0: relative == absolute
        (pt.operators.prox_hard, False),    # L0: excluded outright
        (functools.partial(pt.operators.prox_max_entropy, gamma=0.3), True),
        (None, False),
    ]
    prox_in = tuple(c[0] for c in cases)
    got = separable_blocks(prox_in, tuple(p is not None for p in prox_in),
                           "auto")
    assert got == tuple(c[1] for c in cases), got


def test_separable_prox_rejects_typos():
    import pytest

    import proxmin_tpu as pt

    with pytest.raises(ValueError):
        pt.adaprox(jnp.zeros(2), lambda x: x, 0.1,
                   prox=pt.operators.prox_plus, separable_prox="Auto",
                   max_iter=2)


def test_separable_closed_form_wrong_for_absolute_soft():
    """The structural reason absolute-type is excluded: the sub-loop and
    the closed form genuinely disagree there (confirmed repro from the
    review); 'auto' must therefore keep the sub-loop."""
    import functools

    import proxmin_tpu as pt

    c = jnp.asarray([5.0, 0.0, 0.5, 3.0])
    h = jnp.asarray([1.0, 4.0, 9.0, 1.0])
    prox = functools.partial(pt.operators.prox_soft, thresh=0.02,
                             type="absolute")
    r_sub = pt.adaprox(jnp.zeros(4), lambda x: h * (x - c), 0.05,
                       prox=prox, e_rel=1e-10, max_iter=800)
    r_auto = pt.adaprox(jnp.zeros(4), lambda x: h * (x - c), 0.05,
                        prox=prox, e_rel=1e-10, max_iter=800,
                        separable_prox="auto")
    np.testing.assert_allclose(np.asarray(r_auto.x), np.asarray(r_sub.x),
                               rtol=1e-10)  # identical: sub-loop taken


@pytest.mark.parametrize("trial", range(6))
def test_separable_closed_form_property_sweep(trial):
    """Random valid separable configurations: the closed form and the
    converged sub-loop must find the same solution (the closed form is
    the sub-loop's fixed point wherever separable_when holds)."""
    import functools

    import proxmin_tpu as pt

    rng = np.random.default_rng(1000 + trial)
    dim = int(rng.integers(2, 8))
    c = jnp.asarray(rng.normal(size=dim))
    h = jnp.asarray(rng.uniform(0.5, 3.0, size=dim))
    scheme = ["adam", "amsgrad", "padam"][trial % 3]
    prox = [
        pt.operators.prox_plus,
        functools.partial(pt.operators.prox_soft, thresh=0.05),
        functools.partial(pt.operators.prox_max, thresh=0.7,
                          type="absolute"),
    ][trial % 3]

    def grad(x):
        return h * (x - c)

    kw = dict(prox=prox, scheme=scheme, e_rel=1e-11, max_iter=4000)
    r_sub = pt.adaprox(jnp.zeros(dim), grad, 0.1, **kw)
    r_sep = pt.adaprox(jnp.zeros(dim), grad, 0.1, separable_prox="auto",
                       **kw)
    # 'auto' must have taken the closed form for these configurations
    assert r_sep.sub_iterations[0] == r_sep.iterations
    np.testing.assert_allclose(np.asarray(r_sep.x), np.asarray(r_sub.x),
                               atol=5e-6)


def test_adaprox_list_b1_schedule():
    """Review r2s3: a plain-list b1 schedule must work (regression from
    the normalize_b1_schedule dedup)."""
    import proxmin_tpu as pt

    c = jnp.asarray([1.0, 0.5])
    r = pt.adaprox(jnp.zeros(2), lambda x: x - c, 0.1, b1=[0.5] * 30,
                   max_iter=30, check_convergence=False)
    assert np.isfinite(np.asarray(r.x)).all()


def test_moment_dtype_bf16_storage(rng):
    """moment_dtype=bf16: moments stored reduced-precision, iterates
    full precision; the solve still reaches the constrained optimum and
    returned moments carry the storage dtype."""
    center = jnp.asarray(np.array([1.0, 0.5], np.float32))

    def grad(x):
        return x - center

    def prox(x, step):
        return jnp.maximum(x, 0.0)

    x0 = jnp.asarray(np.array([-1.0, -1.0], np.float32))
    r16 = adaprox(x0, grad, 0.1, prox=prox, scheme="adam", e_rel=1e-7,
                  max_iter=3000, moment_dtype=jnp.bfloat16)
    r32 = adaprox(x0, grad, 0.1, prox=prox, scheme="adam", e_rel=1e-7,
                  max_iter=3000)
    assert r16.x.dtype == jnp.float32
    assert r16.M[0].dtype == jnp.bfloat16
    assert r32.M[0].dtype == jnp.float32
    # both land on the analytic optimum (projection of center)
    np.testing.assert_allclose(np.asarray(r16.x), [1.0, 0.5], atol=1e-3)
    np.testing.assert_allclose(np.asarray(r32.x), [1.0, 0.5], atol=1e-3)


def test_moment_dtype_amsgrad_warmstart_roundtrip(rng):
    """Vhat-using scheme + warm start: reduced-precision moments resume
    cleanly (M/V/Vhat accepted back in storage dtype)."""
    center = jnp.asarray(np.array([0.3, 0.8], np.float32))

    def grad(x):
        return x - center

    x0 = jnp.asarray(np.array([2.0, 2.0], np.float32))
    r1 = adaprox(x0, grad, 0.1, scheme="amsgrad", check_convergence=False,
                 max_iter=50, moment_dtype=jnp.bfloat16)
    r2 = adaprox(r1.x, grad, 0.1, scheme="amsgrad",
                 check_convergence=False, max_iter=450,
                 M=r1.M, V=r1.V, Vhat=r1.Vhat,
                 moment_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(center),
                               atol=2e-2)
