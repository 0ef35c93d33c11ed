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
