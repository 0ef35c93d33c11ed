"""Pure-functional solver factories: jittable, vmap-able solves.

The top-level drivers (:func:`proxmin_tpu.pgm`, ...) are host APIs — they
match the reference's calling convention (NumPy write-back, callbacks,
logging, driver caching). This module exposes the same compiled cores as
*pure functions* for composition with JAX transforms:

* ``jax.vmap(solve)`` solves a whole **batch of problems in one compiled
  call** — under ``vmap`` the ``lax.while_loop`` runs until every lane
  converges (converged lanes hold their fixed point, so results equal the
  per-problem solves). The reference (one Python loop per solve,
  ``/root/reference/proxmin/algorithms.py``) has no analogue; on TPU this
  turns thousands of small independent solves into one device program.
* ``jax.jit`` / ``lax.map`` / checkpointing compose the same way.

The factories reuse the drivers' own body/init/cond builders (the same
ones the AOT exporter serializes), so they cannot drift from the
in-process semantics.

Reverse-mode differentiation through a ``lax.while_loop`` is not defined;
for solver differentiation use a fixed iteration count via
``lax.fori_loop``-style unrolling or implicit differentiation at the
fixed point (not provided here).
"""

import jax
import jax.numpy as jnp

from . import utils
from .utils import make_stepper

__all__ = ["make_pgm_solver", "make_adaprox_solver"]


def make_pgm_solver(grad, step, prox=None, accelerated=False,
                    backtracking=False, f=None, e_rel=1e-6, max_iter=1000):
    """Build a pure PGM/FISTA solve: ``solve(*x0) -> (x, iterations,
    converged, diverged)``.

    Same semantics as :func:`proxmin_tpu.pgm` (reference
    ``algorithms.py:12-144``) minus the host conveniences. The returned
    callable is pure and traceable: wrap in ``jax.jit`` yourself, or
    ``jax.vmap`` it over a leading batch axis of the initial blocks.
    ``grad=None`` derives the gradient from ``f`` via ``jax.grad``.
    """
    from .solvers.common import grad_from_f, normalize_per_block, \
        normalize_prox
    from .solvers.pgm import _init_state, _make_pgm_body, _run_fused

    def solve(*x0):
        n = len(x0)
        g = grad if grad is not None else grad_from_f(f, n)
        prox_t = normalize_prox(prox, n)
        e_rel_t = normalize_per_block(e_rel, n)
        assert backtracking is False or f is not None
        stepper = make_stepper(step, n)
        body = _make_pgm_body(g, stepper, prox_t, e_rel_t, accelerated,
                              backtracking, f)
        state = _init_state(x0, g, stepper, n, max_iter, False, accelerated)
        st = _run_fused(state, body, max_iter, n)
        x = st.x[0] if n == 1 else st.x
        return x, st.it, st.converged, st.diverged

    return solve


def make_adaprox_solver(grad, step, prox=None, scheme="adam", b1=0.9,
                        b2=0.999, eps=1e-8, p=0.25, check_convergence=True,
                        e_rel=1e-6, max_iter=1000, prox_max_iter=1000,
                        f=None, separable_prox=False):
    """Build a pure AdaProx solve: ``solve(*x0) -> (x, M, V, Vhat,
    iterations, converged, diverged)`` (cold-started moments).

    Same semantics as :func:`proxmin_tpu.adaprox` (reference
    ``algorithms.py:248-423``); jit/vmap-compatible like
    :func:`make_pgm_solver`.
    """
    from .solvers.adaprox import (
        SCHEMES, _make_adaprox_body, init_adaprox_state, make_adaprox_cond,
        normalize_b1_schedule,
    )
    from .solvers.common import (
        grad_from_f, normalize_per_block, normalize_prox, separable_blocks,
    )

    b1 = normalize_b1_schedule(b1, max_iter)
    assert 0 <= b2 < 1
    assert eps >= 0
    assert 0 < p <= 0.5
    phi_psi = SCHEMES[scheme.lower()]

    def solve(*x0):
        n = len(x0)
        g = grad if grad is not None else grad_from_f(f, n)
        prox_in = utils._as_tuple(prox)
        if len(prox_in) == 1:
            prox_in = prox_in * n
        has_prox = tuple(pj is not None for pj in prox_in)
        prox_t = normalize_prox(prox_in, n)
        e_rel_t = normalize_per_block(e_rel, n)
        separable = separable_blocks(prox_in, has_prox, separable_prox)
        stepper = make_stepper(step, n)
        body = _make_adaprox_body(g, stepper, prox_t, has_prox, phi_psi,
                                  b1, b2, eps, p, e_rel_t,
                                  check_convergence, prox_max_iter,
                                  separable=separable)
        zeros = tuple(jnp.zeros_like(x) for x in x0)
        state = init_adaprox_state(x0, zeros, zeros, zeros, stepper, g,
                                   n, max_iter, trace=False)
        cond = make_adaprox_cond(check_convergence, max_iter)
        st = jax.lax.while_loop(cond, body, state)
        x = st.x[0] if n == 1 else st.x
        return x, st.M, st.V, st.Vhat, st.it, st.converged, st.diverged

    return solve
