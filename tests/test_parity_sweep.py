"""Randomized parity sweep: random problem shapes, schemes, step sizes and
constraint layouts through both implementations, fixed iteration counts,
f64 round-off agreement. Complements the targeted parity tests with broad
configuration coverage.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")
ref = pytest.importorskip("proxmin")

import proxmin_tpu as pt  # noqa: E402


def _soft_np(thresh):
    def p(v, step):
        t = thresh * step
        return np.sign(v) * np.maximum(np.abs(v) - t, 0)
    return p


def _soft_j(thresh):
    def p(v, step):
        return pt.operators.prox_soft(v, step, thresh=thresh)
    return p


PROX_PAIRS = [
    (None, None),
    (lambda v, s: np.maximum(v, 0), lambda v, s: jnp.maximum(v, 0)),
    (_soft_np(0.1), _soft_j(0.1)),
    (lambda v, s: np.minimum(v, 0.8), lambda v, s: jnp.minimum(v, 0.8)),
]


@pytest.mark.parametrize("trial", range(12))
def test_pgm_random_configs(trial):
    rng = np.random.default_rng(1000 + trial)
    n_blocks = int(rng.integers(1, 4))
    shapes = [tuple(rng.integers(2, 7, size=int(rng.integers(1, 3))))
              for _ in range(n_blocks)]
    targets = [rng.normal(size=s) for s in shapes]
    x0 = [rng.normal(size=s) for s in shapes]
    scales = rng.uniform(0.5, 2.0, size=n_blocks)
    step = float(rng.uniform(0.1, 0.9) / scales.max())
    accelerated = bool(rng.integers(0, 2))
    pidx = rng.integers(0, len(PROX_PAIRS), size=n_blocks)
    prox_np = [PROX_PAIRS[i][0] for i in pidx]
    prox_j = [PROX_PAIRS[i][1] for i in pidx]
    iters = int(rng.integers(5, 40))

    def grad_np(*X):
        out = tuple(scales[j] * (X[j] - targets[j])
                    for j in range(n_blocks))
        return out if n_blocks > 1 else out[0]

    def grad_j(*X):
        out = tuple(scales[j] * (X[j] - jnp.asarray(targets[j]))
                    for j in range(n_blocks))
        return out if n_blocks > 1 else out[0]

    x_ref = [x.copy() for x in x0]
    ref.pgm(x_ref if n_blocks > 1 else x_ref[0], grad_np,
            lambda *X, it=None: (step,) * n_blocks if n_blocks > 1 else step,
            prox=prox_np if n_blocks > 1 else prox_np[0],
            accelerated=accelerated, e_rel=0, max_iter=iters)

    res = pt.pgm([jnp.asarray(x) for x in x0] if n_blocks > 1
                 else jnp.asarray(x0[0]),
                 grad_j, step,
                 prox=prox_j if n_blocks > 1 else prox_j[0],
                 accelerated=accelerated, e_rel=0, max_iter=iters)

    ours = res.x if n_blocks > 1 else (res.x,)
    for j in range(n_blocks):
        np.testing.assert_allclose(
            np.asarray(ours[j]), x_ref[j], rtol=1e-10, atol=1e-12,
            err_msg=f"trial {trial} block {j} (shapes={shapes}, "
                    f"acc={accelerated}, iters={iters})",
        )


@pytest.mark.parametrize("trial", range(6))
def test_adaprox_random_configs(trial):
    rng = np.random.default_rng(2000 + trial)
    scheme = ["adam", "nadam", "amsgrad", "padam", "adamx",
              "radam"][trial % 6]
    n = int(rng.integers(2, 6))
    target = rng.normal(size=n)
    x0 = rng.normal(size=n)
    alpha = float(rng.uniform(0.02, 0.3))
    b1 = float(rng.uniform(0.5, 0.95))
    b2 = float(rng.uniform(0.9, 0.999))
    iters = int(rng.integers(10, 50))

    x_ref = x0.copy()
    ref.adaprox(x_ref, lambda x: x - target,
                lambda *X, it=None: alpha, scheme=scheme, b1=b1, b2=b2,
                e_rel=0, max_iter=iters, check_convergence=False,
                Vhat=(np.zeros(n),))
    res = pt.adaprox(jnp.asarray(x0),
                     lambda x: x - jnp.asarray(target), alpha,
                     scheme=scheme, b1=b1, b2=b2, e_rel=0,
                     max_iter=iters, check_convergence=False)
    np.testing.assert_allclose(
        np.asarray(res.x), x_ref, rtol=1e-10, atol=1e-12,
        err_msg=f"trial {trial} scheme={scheme} a={alpha} b1={b1} b2={b2}",
    )


@pytest.mark.parametrize("trial", range(4))
def test_nmf_random_configs(trial):
    rng = np.random.default_rng(3000 + trial)
    C = int(rng.integers(3, 12))
    K = int(rng.integers(2, min(C, 6)))
    N = int(rng.integers(10, 60))
    Y = rng.random((C, K)) @ rng.random((K, N)) \
        + 0.05 * rng.standard_normal((C, N))
    A0 = rng.random((C, K))
    S0 = rng.random((K, N))
    iters = int(rng.integers(5, 30))

    A_r, S_r = A0.copy(), S0.copy()
    ref.nmf.nmf(Y, A_r, S_r, e_rel=0, max_iter=iters)
    A_j, S_j = A0.copy(), S0.copy()
    pt.nmf.nmf(Y, A_j, S_j, e_rel=0, max_iter=iters)
    np.testing.assert_allclose(A_j, A_r, rtol=1e-8, atol=1e-10,
                               err_msg=f"trial {trial} C={C} K={K} N={N}")
    np.testing.assert_allclose(S_j, S_r, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("trial", range(6))
def test_fused_adaprox_random_configs(trial):
    """Randomized fused-adaprox engine sweep vs the XLA separable
    driver: random shapes, weighting, b1/b2/eps, moment dtype, prox —
    fixed iteration counts, f32-noise agreement."""
    rng = np.random.default_rng(7000 + trial)
    C = int(rng.integers(2, 9))
    K = int(rng.integers(2, 6))
    N = int(rng.integers(50, 700))
    weighted = bool(rng.integers(0, 2))
    b1 = float(rng.uniform(0.7, 0.95))
    b2 = float(rng.uniform(0.9, 0.9999))
    eps = float(10.0 ** rng.uniform(-9, -6))
    iters = int(rng.integers(5, 35))
    prox_S = [pt.operators.prox_plus, None][int(rng.integers(0, 2))]

    Y = (rng.random((C, K)) @ rng.random((K, N))
         + 0.01 * rng.standard_normal((C, N))).astype(np.float32)
    W = ((0.5 + rng.random((C, N))).astype(np.float32)
         if weighted else 1)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    rx = pt.nmf.nmf(Y, A0.copy(), S0.copy(), W=W, algorithm="adaprox",
                    prox_S=prox_S, e_rel=0, max_iter=iters,
                    separable_prox="auto", b1=b1, b2=b2, eps=eps)
    rf = pt.nmf.nmf(Y, A0.copy(), S0.copy(), W=W, algorithm="adaprox",
                    engine="pallas", prox_S=prox_S, e_rel=0,
                    max_iter=iters, b1=b1, b2=b2, eps=eps)
    for a, b in zip(rx.x, rf.x):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5)


def _rand_prox_pair(rng, idx):
    return PROX_PAIRS[idx]


@pytest.mark.parametrize("trial", range(10))
def test_admm_family_random_configs(trial):
    """Randomized ADMM/SDMM parity vs the reference: random quadratic
    prox_f target/curvature, random step, random constraint count
    (admm when M == 1, sdmm when M > 1), random proxs and linear
    operators (dense or identity), fixed iteration count, f64
    round-off agreement."""
    rng = np.random.default_rng(8000 + trial)
    n = int(rng.integers(2, 5))
    target = rng.normal(size=n)
    curv = float(rng.uniform(0.5, 2.0))
    step_f = float(rng.uniform(0.2, 0.8))
    iters = int(rng.integers(5, 35))
    M = int(rng.integers(1, 4))

    def prox_f_np(v, step):
        return (v + step * curv * target) / (1.0 + step * curv)

    def prox_f_j(v, step):
        return (v + step * curv * jnp.asarray(target)) / (1.0 + step * curv)

    pidx = rng.integers(1, len(PROX_PAIRS), size=M)  # skip the None pair
    Ls = []
    for _ in range(M):
        if rng.integers(0, 2):
            Ls.append(rng.normal(size=(int(rng.integers(2, 5)), n)))
        else:
            Ls.append(None)

    x_ref = np.array(rng.normal(size=n))
    x0 = jnp.asarray(x_ref.copy())

    if M == 1:
        ref.admm(x_ref, prox_f_np, lambda X, it=None: step_f,
                 prox_g=PROX_PAIRS[pidx[0]][0], L=Ls[0],
                 e_rel=0, e_abs=0, max_iter=iters)
        res = pt.admm(x0, prox_f_j, step_f,
                      prox_g=PROX_PAIRS[pidx[0]][1],
                      L=None if Ls[0] is None else jnp.asarray(Ls[0]),
                      e_rel=0, e_abs=0, max_iter=iters)
    else:
        ref.sdmm(x_ref, prox_f_np, lambda X, it=None: step_f,
                 proxs_g=[PROX_PAIRS[i][0] for i in pidx], Ls=Ls,
                 e_rel=0, e_abs=0, max_iter=iters)
        res = pt.sdmm(x0, prox_f_j, step_f,
                      proxs_g=[PROX_PAIRS[i][1] for i in pidx],
                      Ls=[None if L is None else jnp.asarray(L)
                          for L in Ls],
                      e_rel=0, e_abs=0, max_iter=iters)
    np.testing.assert_allclose(
        np.asarray(res.x), x_ref, rtol=1e-9, atol=1e-11,
        err_msg=f"admm-family M={M} iters={iters}")


@pytest.mark.parametrize("trial", range(8))
def test_bsdmm_random_configs(trial):
    """Randomized bSDMM parity vs the reference: random block count /
    sizes, coupled block proxs, per-block nested constraint lists
    (0-2 each, random Ls), random update order and steps_g_update
    policy, fixed iteration count, f64 round-off agreement."""
    rng = np.random.default_rng(9000 + trial)
    N = int(rng.integers(2, 4))
    sizes = [int(rng.integers(1, 4)) for _ in range(N)]
    targets = [rng.normal(size=s) for s in sizes]
    couple = float(rng.uniform(0.0, 0.2))
    step = float(rng.uniform(0.2, 0.7))
    iters = int(rng.integers(5, 25))
    order = tuple(rng.permutation(N).tolist())
    policy = ["steps_f", "fixed", "relative"][int(rng.integers(0, 3))]

    def proxs_f_np(x, step, Xs=None, j=None):
        c = targets[j] + couple * float(np.sum(Xs[(j + 1) % N]))
        return (x + step * c) / (1 + step)

    def proxs_f_j(x, step, Xs=None, j=None):
        c = (jnp.asarray(targets[j])
             + couple * jnp.sum(Xs[(j + 1) % N]))
        return (x + step * c) / (1 + step)

    def steps_cb(Xs, j=None):
        return step

    proxs_g_np, proxs_g_j, Ls_np, Ls_j = [], [], [], []
    for j in range(N):
        Mj = int(rng.integers(0, 3))
        pidx = rng.integers(1, len(PROX_PAIRS), size=Mj)
        pg_np = [PROX_PAIRS[i][0] for i in pidx]
        pg_j = [PROX_PAIRS[i][1] for i in pidx]
        lj_np, lj_j = [], []
        for _ in range(Mj):
            if rng.integers(0, 2):
                L = rng.normal(size=(int(rng.integers(1, 4)), sizes[j]))
                lj_np.append(L)
                lj_j.append(jnp.asarray(L))
            else:
                lj_np.append(None)
                lj_j.append(None)
        proxs_g_np.append(pg_np if Mj else None)
        proxs_g_j.append(pg_j if Mj else None)
        Ls_np.append(lj_np if Mj else None)
        Ls_j.append(lj_j if Mj else None)

    x_ref = [np.zeros(s) for s in sizes]
    ref.bsdmm(x_ref, proxs_f_np, steps_cb, proxs_g=proxs_g_np,
              Ls=Ls_np, update_order=list(order),
              steps_g_update=policy, e_rel=0, max_iter=iters)
    res = pt.bsdmm([jnp.zeros(s) for s in sizes], proxs_f_j, steps_cb,
                   proxs_g=proxs_g_j, Ls=Ls_j, update_order=order,
                   steps_g_update=policy, e_rel=0, max_iter=iters)
    for j in range(N):
        np.testing.assert_allclose(
            np.asarray(res.x[j]), x_ref[j], rtol=1e-9, atol=1e-11,
            err_msg=f"bsdmm block {j} order={order} policy={policy}")
