"""Weighted hyperspectral unmixing of a synthetic astronomical scene.

A 5-band 30x30-pixel image containing K=7 Gaussian sources with distinct
SEDs, Poisson noise, and per-band sky background. Solves the weighted CMF
``min || sqrt(W) (Y - A S) ||^2 / 2`` with W = 1/sky, a non-negativity
constraint on the SED matrix A, and a composite constraint on the
morphologies S (hard threshold + per-source unit normalization), racing
PGM (with the implicit-power-iteration weighted Lipschitz steps — the
reference's weighted path crashes, nmf.py:64) against the AdaProx schemes.

Run:  python examples/astro_unmixing.py
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import proxmin_tpu as pt
from proxmin_tpu import operators


def gaussian_source(nx, pos, size):
    y, x = np.mgrid[0:nx, 0:nx]
    g = np.exp(-0.5 * (((x - pos[0]) ** 2 + (y - pos[1]) ** 2) / size ** 2))
    g = g.reshape(-1)
    return g / g.sum()


def make_scene(nx=30, C=5, K=7, seed=8, noise_seed=10):
    rng = np.random.default_rng(seed)
    poss = rng.uniform(5, nx - 5, size=(K, 2))
    sizes = rng.uniform(1.5, 3.5, size=K)
    S_true = np.stack([gaussian_source(nx, p, s)
                       for p, s in zip(poss, sizes)])
    # smooth SEDs with distinct peaks, scaled to realistic counts
    bands = np.linspace(0, 1, C)
    peaks = rng.uniform(0, 1, size=K)
    A_true = np.exp(-4.0 * (bands[:, None] - peaks[None, :]) ** 2)
    A_true *= rng.uniform(500, 2000, size=K)

    sky = rng.uniform(2, 10, size=C)
    flux = A_true @ S_true + sky[:, None]
    noise_rng = np.random.default_rng(noise_seed)
    Y = noise_rng.poisson(flux).astype(np.float64) - sky[:, None]
    W = np.ones_like(Y) / sky[:, None]
    return Y, W, A_true, S_true, poss, sizes


def prox_S_composite(X, step, thresh=1e-4):
    """Hard threshold then per-source unit normalization (reference's
    custom proxS shape)."""
    X = jnp.where(X > thresh, X, 0.0)
    return operators.prox_unity_plus(X, step, axis=1)


def main():
    Y, W, A_true, S_true, poss, sizes = make_scene()
    C, N = Y.shape
    K = S_true.shape[0]
    rng = np.random.default_rng(3)

    # approximate initialization: true positions jittered
    meas = poss + rng.normal(0, 1.0, poss.shape)
    meas = np.clip(meas, 1, 28)
    S0 = np.stack([
        gaussian_source(int(np.sqrt(N)), p, s * (1 + 0.2 * rng.random()))
        for p, s in zip(meas, sizes)
    ])
    A0 = np.maximum(Y @ np.linalg.pinv(S0), 1.0)

    runs = [
        ("PGM (weighted)", dict(algorithm="pgm")),
        # adaptive refresh stride: the weighted Lipschitz bounds refresh
        # on a self-growing interval (in-carry ApproximateCache policy)
        ("PGM (adaptive)", dict(algorithm="pgm", step_adapt=True)),
        ("Adam", dict(algorithm="adaprox", scheme="adam",
                      prox_max_iter=100)),
        ("PAdam", dict(algorithm="adaprox", scheme="padam", p=0.45,
                       prox_max_iter=100)),
        ("AMSGrad", dict(algorithm="adaprox", scheme="amsgrad",
                         prox_max_iter=100)),
    ]

    print(f"scene: {C} bands x {N} px, K={K}, weighted (W = 1/sky)")
    for label, kw in runs:
        A, S = A0.copy(), S0.copy()
        res = pt.nmf.nmf(
            Y, A, S, W=W,
            prox_A=operators.prox_plus, prox_S=prox_S_composite,
            e_rel=1e-3, max_iter=500, **kw,
        )
        loss = float(pt.nmf.log_likelihood(
            jnp.asarray(A), jnp.asarray(S), Y=jnp.asarray(Y),
            W=jnp.asarray(W)))
        print(f"{label:16s} weighted loss = {loss:12.2f}  "
              f"iters = {res.iterations:4d}")


if __name__ == "__main__":
    main()
