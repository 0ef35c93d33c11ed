"""Collective-layout audit: optimized-HLO assertions for every mesh path.

The numerics tests (``test_sharding.py``) prove the sharded solves get
the right ANSWER; nothing there would notice XLA all-gathering a
pixel-sharded S every iteration on a real pod. These tests pin the
COMMUNICATION PATTERN: each solver family is lowered/compiled on the
8-device virtual mesh with pixel-sharded inputs and the optimized HLO is
asserted to contain

* NO ``all-gather`` / ``reduce-scatter`` / ``all-to-all`` /
  ``collective-permute`` at all — the pixel axis is never resharded or
  materialized whole on any device, in or out of the loop;
* only SMALL ``all-reduce`` ops — the (C,K) gradient contraction
  (reference ``/root/reference/proxmin/nmf.py:39-41`` — the one
  contraction over the pixel axis, which must become the single
  all-reduce), K×K Grams, C×K×K weighted-refresh Grams, and the scalar
  convergence/loss reductions. A pixel-sharded operand leaking into a
  collective would show up orders of magnitude larger.

Audit targets and how they map to the production paths:

* pgm under ``nmf(mesh=...)`` → the EXPLICIT shard_map whole-solve,
  audited via the exact production builder
  (:func:`proxmin_tpu.parallel.sharding._build_pgm_solve`).
* adaprox / bsdmm under ``nmf(mesh=...)`` and sharded-input admm/sdmm →
  auto-SPMD through the ordinary drivers. Audited via the
  :mod:`proxmin_tpu.functional` factories, which reuse the drivers' own
  body/init builders (``_make_adaprox_body``, ``_sdmm_core``, the bsdmm
  ``_export_runner``) — same computation, same avals, same input
  shardings as the host drivers' internal jit, but exposed as a pure
  function that can be ``.lower().compile()``d.

The per-iteration communication volumes these layouts imply are
tabulated in ``docs/DESIGN.md`` ("Per-iteration communication volume").
"""

from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from proxmin_tpu import functional, operators
from proxmin_tpu.nmf import (
    _bsdmm_adapters,
    grad_likelihood,
    step_adaprox,
    step_pgm,
)
from proxmin_tpu.parallel import make_mesh, shard_nmf_problem
from proxmin_tpu.parallel.sharding import _build_pgm_solve

C, K, N = 6, 3, 1024

# any collective whose result carries this many elements or more moved a
# pixel-sharded operand (the smallest pixel-axis array is S: K*N global,
# K*N/8 per shard); legitimate collectives top out at C*K*K
_BIG = K * N // 8
assert _BIG > 4 * C * K * K

def collective_profile(txt):
    """[(op, max-elements-across-tuple-members, sizes)] built on the
    package's auditing primitive (one extractor for tests and the
    pod-scaling harness; XLA may merge several reductions into one
    tuple-shaped all-reduce — the threshold checks use the max member,
    :func:`collective_sizes` exposes every member)."""
    from proxmin_tpu.parallel import hlo_collectives

    return [(op, max(sizes), sizes) for op, sizes in hlo_collectives(txt)]


def collective_sizes(txt):
    """Flat set of every tuple-member element count across collectives."""
    return {s for _, _, sizes in collective_profile(txt) for s in sizes}


def compile_hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def assert_layout(txt, allow_big_psum=False):
    """No resharding collectives; all-reduces small; at least one
    all-reduce (the layout is actually distributed, not single-shard)."""
    prof = collective_profile(txt)
    bad = [p for p in prof if p[0] != "all-reduce"]
    assert not bad, f"pixel-axis resharding collectives found: {bad}"
    assert any(op == "all-reduce" for op, _, _ in prof), \
        "no all-reduce at all — the computation is not distributed"
    if not allow_big_psum:
        big = [p for p in prof if p[1] >= _BIG]
        assert not big, f"large all-reduce(s) move sharded operands: {big}"


@pytest.fixture
def problem(rng):
    Y = rng.random((C, N)).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    return Y, A0, S0, W


def _sharded(mesh, Y, A0, S0, W=None):
    return shard_nmf_problem(mesh, Y, A0, S0, W)


# ---------------------------------------------------------------------------
# pgm: the explicit shard_map whole-solve (the nmf(mesh=) pgm path)

def test_pgm_explicit_unweighted(problem):
    Y, A0, S0, _ = problem
    mesh = make_mesh()
    Ys, As, Ss, _ = _sharded(mesh, Y, A0, S0)
    Ws = jnp.ones_like(Ys)
    solve = _build_pgm_solve(mesh, False, operators.prox_plus,
                             operators.prox_plus, 1e-3, 100,
                             "data", None, None, False)
    txt = compile_hlo(solve, As, Ss, Ys, Ws)
    assert_layout(txt)
    # the design-doc layout: a (C,K) grad_A psum and a (K,K) Gram psum
    sizes = collective_sizes(txt)
    assert C * K in sizes       # grad_A all-reduce
    assert K * K in sizes       # S S^T Gram all-reduce


def test_pgm_explicit_weighted_adaptive(problem):
    """Weighted whole-solve with adaptive strides: the refresh's
    C×K×K Gram psum and per-pass reductions are all small; the
    (N_local, K) power iterate never rides a collective on a 1-D mesh."""
    Y, A0, S0, W = problem
    mesh = make_mesh()
    Ys, As, Ss, Wsh = _sharded(mesh, Y, A0, S0, W)
    solve = _build_pgm_solve(mesh, True, operators.prox_plus,
                             operators.prox_plus, 1e-3, 100,
                             "data", None, 10, True)
    txt = compile_hlo(solve, As, Ss, Ys, Wsh)
    assert_layout(txt)
    sizes = collective_sizes(txt)
    assert C * K in sizes           # grad_A psum
    assert C * K * K in sizes       # weighted-refresh Gram psum


def test_pgm_explicit_2d_mesh(problem):
    """DP×TP: channel axis sharded over 'model'. grad_S gains a psum
    over 'model' of the LOCAL (K, N_local) block — legitimately larger
    than _BIG (it is the TP contraction, not a pixel resharding), so
    this case asserts only the no-resharding property plus the expected
    psum inventory."""
    Y, A0, S0, _ = problem
    mesh = make_mesh(shape=(4, 2))
    Ys, As, Ss, _ = shard_nmf_problem(mesh, Y, A0, S0,
                                      model_axis="model")
    Ws = jax.device_put(np.ones_like(Y), NamedSharding(
        mesh, P("model", "data")))
    solve = _build_pgm_solve(mesh, False, operators.prox_plus,
                             operators.prox_plus, 1e-3, 100,
                             "data", "model", None, False)
    txt = compile_hlo(solve, As, Ss, Ys, Ws)
    assert_layout(txt, allow_big_psum=True)
    sizes = collective_sizes(txt)
    n_local = N // 4
    assert K * n_local in sizes     # grad_S TP psum (local pixel shard)
    # and nothing at global pixel size: the pixel axis never aggregates
    assert not any(s >= K * N for s in sizes)


# ---------------------------------------------------------------------------
# adaprox: auto-SPMD through the driver body (the nmf(mesh=) adaprox path)

def test_adaprox_auto_spmd(problem):
    Y, A0, S0, _ = problem
    mesh = make_mesh()
    Ys, As, Ss, _ = _sharded(mesh, Y, A0, S0)

    def full(A0, S0, Y):
        solve = functional.make_adaprox_solver(
            lambda A, S: grad_likelihood(A, S, Y=Y),
            step_adaprox, prox=operators.prox_plus,
            e_rel=1e-4, max_iter=100)
        return solve(A0, S0)

    txt = compile_hlo(full, As, Ss, Ys)
    assert_layout(txt)
    # grad_A = D S^T psum — the one pixel-axis contraction
    assert C * K in collective_sizes(txt)


# ---------------------------------------------------------------------------
# pgm auto-SPMD (sharded inputs through the ordinary driver, no mesh=)

def test_pgm_auto_spmd(problem):
    Y, A0, S0, _ = problem
    mesh = make_mesh()
    Ys, As, Ss, _ = _sharded(mesh, Y, A0, S0)

    def full(A0, S0, Y):
        solve = functional.make_pgm_solver(
            lambda A, S: grad_likelihood(A, S, Y=Y),
            step_pgm, prox=operators.prox_plus,
            e_rel=1e-4, max_iter=100)
        return solve(A0, S0)

    txt = compile_hlo(full, As, Ss, Ys)
    assert_layout(txt)


# ---------------------------------------------------------------------------
# bsdmm: auto-SPMD through the driver's own runner (the nmf CMF path)

def test_bsdmm_auto_spmd(problem):
    Y, A0, S0, _ = problem
    mesh = make_mesh()
    Ys, As, Ss, _ = _sharded(mesh, Y, A0, S0)

    def full(A0, S0, Y):
        prox_f, step_f = _bsdmm_adapters(
            Y, 1, (operators.prox_plus, operators.prox_plus), None)
        solve = functional.make_bsdmm_solver(prox_f, step_f,
                                             e_rel=1e-4, max_iter=50)
        return solve(A0, S0)

    txt = compile_hlo(full, As, Ss, Ys)
    assert_layout(txt)
    assert C * K in collective_sizes(txt)   # grad_A psum


# ---------------------------------------------------------------------------
# admm / sdmm: pixel-sharded primal variable, elementwise proxs — the
# whole iteration is shard-local; only the Boyd residual norms reduce

def test_admm_auto_spmd(problem):
    Y, _, S0, _ = problem
    mesh = make_mesh()
    sh = NamedSharding(mesh, P(None, "data"))
    B = jax.device_put(Y[:K], sh)
    x0 = jax.device_put(S0, sh)

    def full(x0, B):
        def prox_f(x, step):
            return (x + step * B) / (1.0 + step)

        solve = functional.make_admm_solver(
            prox_f, 0.5, prox_g=operators.prox_plus,
            e_rel=1e-6, max_iter=50)
        return solve(x0)

    txt = compile_hlo(full, x0, B)
    assert_layout(txt)


def test_sdmm_auto_spmd(problem):
    Y, _, S0, _ = problem
    mesh = make_mesh()
    sh = NamedSharding(mesh, P(None, "data"))
    B = jax.device_put(Y[:K], sh)
    x0 = jax.device_put(S0, sh)

    def full(x0, B):
        def prox_f(x, step):
            return (x + step * B) / (1.0 + step)

        solve = functional.make_sdmm_solver(
            prox_f, 0.5,
            (operators.prox_plus, partial(operators.prox_max, thresh=2.0)),
            e_rel=1e-6, max_iter=50)
        return solve(x0)

    txt = compile_hlo(full, x0, B)
    assert_layout(txt)


def test_pgm_explicit_weighted_adaptive_resume(problem):
    """The resume variant (state= continuation) keeps the same pinned
    layout: the carried segment pre-loop and the resumed refresh loop
    add no pixel-axis collectives — preempted pod solves restart with
    the identical communication pattern."""
    Y, A0, S0, W = problem
    mesh = make_mesh()
    Ys, As, Ss, Wsh = _sharded(mesh, Y, A0, S0, W)
    solve = _build_pgm_solve(mesh, True, operators.prox_plus,
                             operators.prox_plus, 1e-3, 100,
                             "data", None, 10, True, resume=True)
    sharding = NamedSharding(mesh, P("data", None))
    v0 = jax.device_put(np.ones((N, K), np.float32), sharding)
    txt = compile_hlo(solve, As, Ss, Ys, Wsh,
                      jnp.int32(19),                   # it0
                      jnp.asarray(False), jnp.asarray(False),  # conv flags
                      jnp.float32(0.5),                # carried loss
                      jnp.float32(0.01), jnp.float32(0.01),
                      jnp.int32(12), jnp.int32(24), v0)
    assert_layout(txt)
    sizes = collective_sizes(txt)
    assert C * K in sizes           # grad_A psum
    assert C * K * K in sizes       # weighted-refresh Gram psum
