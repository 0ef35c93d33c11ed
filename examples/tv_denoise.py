"""Total-variation denoising with a matrix-free constraint operator.

Solves   min_x  0.5 ||x - y||^2 + lam ||D x||_1

with D the 1-D forward-difference operator, via linearized ADMM
(Parikh & Boyd 2014; reference ``algorithms.py:426-520``). The point of
this example is the **FunctionOperator**: D is supplied as its action
(two jittable one-liners), never materialized — at n = 2^20 samples a
dense D would be a ~4 TiB matrix, while this solve runs in O(n) memory
on one chip. ``lambda_max(D^T D) < 4`` is known analytically, so the
Lanczos estimate at construction can also be skipped with
``norm_sq=4.0``.

Run:  python examples/tv_denoise.py [n] [--plot]
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time
from functools import partial

import numpy as np
import jax.numpy as jnp

from proxmin_tpu import admm, operators
from proxmin_tpu.linop import FunctionOperator


def fwd_diff(x):
    return x[1:] - x[:-1]


def fwd_diff_T(y):
    return jnp.concatenate([-y[:1], y[:-1] - y[1:], y[-1:]])


# data bound via functools.partial (not a closure): the drivers pass
# partial-bound arrays to the compiled program as runtime arguments, so
# compile time does not scale with n (see DESIGN.md)
def _prox_quad(x, step, *, y):
    return (x + step * y) / (1.0 + step)


def _prox_l1(z, step, *, lam):
    return operators.prox_soft(z, step, thresh=lam)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1 << 20
    lam = 0.5
    rng = np.random.default_rng(3)

    # piecewise-constant ground truth + noise
    truth = np.zeros(n, np.float32)
    for lo, hi, v in ((0.1, 0.3, 1.0), (0.45, 0.6, -0.7), (0.8, 0.95, 0.4)):
        truth[int(lo * n):int(hi * n)] = v
    y = truth + 0.25 * rng.standard_normal(n).astype(np.float32)
    yj = jnp.asarray(y)

    prox_f = partial(_prox_quad, y=yj)     # prox of 0.5||x - y||^2
    prox_g = partial(_prox_l1, lam=lam)    # prox of lam ||.||_1

    D = FunctionOperator(fwd_diff, fwd_diff_T, (n,), dtype=jnp.float32,
                         norm_sq=4.0)

    t0 = time.perf_counter()
    res = admm(jnp.zeros(n, jnp.float32), prox_f, 0.5, prox_g=prox_g,
               L=D, e_rel=1e-4, max_iter=500)
    x = np.asarray(res.x)
    dt = time.perf_counter() - t0

    tv = lambda v: float(np.abs(np.diff(v)).sum())
    rmse_in = float(np.sqrt(np.mean((y - truth) ** 2)))
    rmse_out = float(np.sqrt(np.mean((x - truth) ** 2)))
    print(f"n={n}  iters={res.iterations}  wall={dt:.2f}s")
    print(f"TV:   input {tv(y):10.1f}  ->  solution {tv(x):10.1f}")
    print(f"RMSE: input {rmse_in:10.4f}  ->  solution {rmse_out:10.4f}")
    assert rmse_out < 0.5 * rmse_in, "denoising failed"

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        sl = slice(0, min(n, 4096))
        plt.plot(y[sl], lw=0.3, label="noisy")
        plt.plot(truth[sl], lw=1, label="truth")
        plt.plot(x[sl], lw=1, label="TV-denoised")
        plt.legend()
        plt.savefig("tv_denoise.png", dpi=120)
        print("wrote tv_denoise.png")


if __name__ == "__main__":
    main()
