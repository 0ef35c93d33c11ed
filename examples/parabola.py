"""Constrained 2-D quadratic — every solver on one tiny problem.

Minimizes f(x) = ||x - (1, 0.5)||^2 / 2 under either a circle constraint
(radius 0.5 disk) or a half-plane constraint, with every driver in the
framework: PGM, FISTA, all six AdaProx schemes, ADMM (two variants) and
SDMM with two simultaneous constraints. The constrained optimum on the
disk is r * c / ||c||, so all solvers can be checked against the analytic
answer.

Run:  python examples/parabola.py [--plot]
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np
import jax.numpy as jnp

import proxmin_tpu as pt
from proxmin_tpu import utils


CENTER = np.array([1.0, 0.5])
RADIUS = 0.5
X0 = np.array([-1.0, -1.0])
DISK_OPT = RADIUS * CENTER / np.linalg.norm(CENTER)


def f(x):
    return 0.5 * jnp.sum((x - jnp.asarray(CENTER)) ** 2)


def grad_f(x):
    return x - jnp.asarray(CENTER)


def prox_circle(x, step, r=RADIUS):
    """Projection onto the disk of radius r."""
    nrm = jnp.sqrt(jnp.sum(x ** 2))
    return jnp.where(nrm > r, x * (r / nrm), x)


def prox_line(x, step, b=0.15):
    """Projection onto the half-plane x_1 >= b."""
    return x.at[1].set(jnp.maximum(x[1], b))


def prox_f(v, step):
    """Proximal operator of f itself (for the ADMM family)."""
    return (v + step * jnp.asarray(CENTER)) / (1.0 + step)


def main(plot=False):
    traces = {}

    def run(label, fn):
        tb = utils.Traceback()
        res = fn(tb)
        x = np.asarray(res.x)
        err = np.linalg.norm(x - DISK_OPT)
        traces[label] = [t[0] for t in tb.trace]
        print(f"{label:18s} x = ({x[0]: .5f}, {x[1]: .5f})  "
              f"|x - x*| = {err:.2e}  iters = {res.iterations}")

    x0 = jnp.asarray(X0)
    run("PGM", lambda cb: pt.pgm(
        x0, grad_f, 0.5, prox=prox_circle, e_rel=1e-8, max_iter=1000,
        callback=cb))
    run("FISTA", lambda cb: pt.pgm(
        x0, grad_f, 0.5, prox=prox_circle, accelerated=True,
        e_rel=1e-8, max_iter=1000, callback=cb))
    run("PGM backtrack", lambda cb: pt.pgm(
        x0, grad_f, 10.0, prox=prox_circle, backtracking=True, f=f,
        e_rel=1e-8, max_iter=1000, callback=cb))

    for scheme in ["adam", "nadam", "amsgrad", "padam", "adamx", "radam"]:
        run(f"AdaProx {scheme}", lambda cb, s=scheme: pt.adaprox(
            x0, grad_f, 0.1, prox=prox_circle, scheme=s,
            e_rel=1e-8, max_iter=3000, callback=cb))

    run("ADMM", lambda cb: pt.admm(
        x0, prox_f, 0.5, prox_g=prox_circle,
        e_rel=1e-8, max_iter=3000, callback=cb))
    run("ADMM direct", lambda cb: pt.admm(
        x0, lambda v, s: prox_circle(prox_f(v, s), s), 0.5,
        e_rel=1e-8, e_abs=1e-8, max_iter=3000, callback=cb))
    run("SDMM (M=2)", lambda cb: pt.sdmm(
        x0, prox_f, 0.5, proxs_g=[prox_circle, prox_line],
        e_rel=1e-8, max_iter=3000, callback=cb))

    if plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib not available; skipping plot")
            return
        fig, ax = plt.subplots(figsize=(6, 6))
        theta = np.linspace(0, 2 * np.pi, 200)
        ax.plot(RADIUS * np.cos(theta), RADIUS * np.sin(theta), "k--",
                lw=0.8)
        for label, tr in traces.items():
            xy = np.stack(tr)
            ax.plot(xy[:, 0], xy[:, 1], ".-", ms=2, lw=0.6, label=label)
        ax.plot(*CENTER, "k*", ms=12)
        ax.plot(*DISK_OPT, "rx", ms=10)
        ax.legend(fontsize=6)
        ax.set_aspect("equal")
        fig.savefig("parabola_trajectories.png", dpi=150)
        print("wrote parabola_trajectories.png")


if __name__ == "__main__":
    main(plot="--plot" in sys.argv)
