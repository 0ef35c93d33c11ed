"""Flagship benchmark: 1e6-pixel hyperspectral PGM-NMF, TPU vs NumPy.

Three measurements (VERDICT r1 #2):

1. **Unweighted per-iteration marginal** (headline, printed last): the
   full PGM-NMF update (residual, both factor gradients, Lipschitz step
   sizes, non-negativity prox, fixed-point norms — the reference's
   per-iteration work, reference ``nmf.py:39-41,44-65``) vs an
   equivalent NumPy implementation. Marginal slope between two
   iteration counts of one compiled executable cancels per-call
   dispatch overhead.
2. **Weighted flagship** with ``step_stride=10``: the weighted
   Lipschitz bounds (reference ``nmf.py:69-88``) via implicit batched
   power iteration, strided; the NumPy side gets the SAME strided
   implicit algorithm (not the reference's per-iteration sparse eigs,
   which would inflate the win by orders of magnitude).
3. **End-to-end fixed-work solve**: one compiled nmf() call running
   2000 iterations, wall-clock including fixed dispatch overhead; NumPy
   equivalent = measured NumPy per-iteration time x the same iteration
   count. (Fixed work, not to-tolerance: at this scale with random
   init the nonconvex NMF never reaches e_rel=1e-3/1e-4 within 3000
   iterations — verified true of the reference's math as well, so a
   to-tolerance wall-clock does not exist for either side.)

Roofline: the naive HBM bound per iteration is read Y + read/write S
(+ read W when weighted). The marginal can legitimately beat that bound
on v5e because the loop-invariant working set (Y, and S between
iterations) stays VMEM-resident inside the fori_loop — the achieved-GB/s
line prints both the naive-bound figure and the VMEM-residency caveat so
the number defends itself either way.

Prints diagnostic lines to stderr and JSON lines to stdout; the LAST
stdout line is the headline metric (same key as round 1). Secondary
metrics are embedded in the headline object under "extra" and also
printed as their own JSON lines.
"""

import json
import sys
import time
from functools import partial

import numpy as np


C, K = 5, 7
N = 1_000_000
ITERS_LO, ITERS_HI = 200, 600
W_ITERS_LO, W_ITERS_HI = 50, 250
NUMPY_ITERS = 10
SEED = 101
V5E_PEAK_GBS = 819.0   # public TPU v5e HBM bandwidth spec
STRIDE = 10
POWER_ITERS = 48       # cold-start passes (first refresh)
WARM_ITERS = 12        # warm-started passes (subsequent refreshes),
                       # matching proxmin_tpu.nmf.WeightedPGMStepper


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_problem(weighted=False):
    rng = np.random.default_rng(SEED)
    A_true = rng.random((C, K)).astype(np.float32)
    S_true = rng.random((K, N)).astype(np.float32)
    Y = (A_true @ S_true + 0.02 * rng.standard_normal((C, N))).astype(
        np.float32
    )
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32) if weighted else None
    return Y, A0, S0, W


# --------------------------------------------------------------------------
# NumPy reference implementations (identical math)

def numpy_step(A, S, Y):
    """One unweighted PGM-NMF iteration in NumPy (reference per-iteration
    math: grad_likelihood + spectral steps + prox_plus + norms)."""
    D = A @ S - Y
    gA = D @ S.T
    gS = A.T @ D
    sA = 1.0 / np.linalg.eigvalsh(S @ S.T)[-1]
    sS = 1.0 / np.linalg.eigvalsh(A.T @ A)[-1]
    A_new = np.maximum(A - sA * gA, 0)
    S_new = np.maximum(S - sS * gS, 0)
    _ = ((A_new - A) ** 2).sum() <= 0 * (A_new ** 2).sum()
    _ = ((S_new - S) ** 2).sum() <= 0 * (S_new ** 2).sum()
    return A_new, S_new


def numpy_weighted_steps(A, S, W, v=None):
    """Weighted Lipschitz bounds, implicit (same algorithm as the TPU
    path): max_c lmax(S diag(W_c) S^T) via small eigh, and
    max_n lmax(A^T diag(W_n) A) via batched power iteration —
    warm-started from the previous refresh's iterate (cold
    POWER_ITERS passes on the first refresh, WARM_ITERS after),
    exactly like proxmin_tpu.nmf.WeightedPGMStepper."""
    H_A = np.einsum("kn,cn,ln->ckl", S, W, S)
    LA = max(np.linalg.eigvalsh(H_A[c])[-1] for c in range(W.shape[0]))

    if v is None:
        iters = POWER_ITERS
        v = np.ones((S.shape[1], A.shape[1]), S.dtype)
        v += 0.01 * np.arange(A.shape[1], dtype=S.dtype)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
    else:
        iters = WARM_ITERS
    for _ in range(iters):
        t = v @ A.T           # (N, C)
        u = W.T * t
        v = u @ A             # (N, K)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                        np.finfo(S.dtype).tiny)
    t = v @ A.T
    hv = (W.T * t) @ A
    rayleigh = (v * hv).sum(1) / np.maximum((v * v).sum(1),
                                            np.finfo(S.dtype).tiny)
    LS = rayleigh.max()
    v_next = hv / np.maximum(np.linalg.norm(hv, axis=1, keepdims=True),
                             np.finfo(S.dtype).tiny)
    return 1.0 / LA, 1.0 / LS, v_next


def numpy_weighted_step(A, S, Y, W, cached, it):
    """One weighted PGM-NMF iteration with the SAME stride-10 step
    caching + warm-started refresh the TPU side uses (0.9 safety)."""
    if it % STRIDE == 0:
        sA, sS, v = numpy_weighted_steps(A, S, W,
                                         None if cached is None
                                         else cached[2])
        cached = (0.9 * sA, 0.9 * sS, v)
    sA, sS, _ = cached
    D = W * (A @ S - Y)
    gA = D @ S.T
    gS = A.T @ D
    A_new = np.maximum(A - sA * gA, 0)
    S_new = np.maximum(S - sS * gS, 0)
    return A_new, S_new, cached


def bench_numpy(Y, A0, S0):
    A, S = A0.copy(), S0.copy()
    for _ in range(2):
        A, S = numpy_step(A, S, Y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(NUMPY_ITERS):
            A, S = numpy_step(A, S, Y)
        best = min(best, (time.perf_counter() - t0) / NUMPY_ITERS)
    return best


def bench_numpy_weighted(Y, A0, S0, W):
    A, S = A0.copy(), S0.copy()
    cached = None
    A, S, cached = numpy_weighted_step(A, S, Y, W, cached, 0)  # warm
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(STRIDE):   # one full stride period incl. refresh
            A, S, cached = numpy_weighted_step(A, S, Y, W, cached, i)
        best = min(best, (time.perf_counter() - t0) / STRIDE)
    return best


# --------------------------------------------------------------------------
# TPU timing

def _timed(call, n_lo, n_hi, reps=2, max_reps=6, budget_s=20.0):
    """Marginal per-iteration time between two iteration counts.

    Device-side contention shows up as slow outliers, so the least-
    contended estimate of each call is taken independently (min over
    reps) before forming the slope — min-of-paired-slopes would instead
    amplify mismatched pairs (slow lo + fast hi) into impossibly low
    marginals.

    The shared pool's stall mode is BIMODAL (identical compiled calls
    100x slower for stretches), so after the base ``reps`` the loop
    keeps sampling — up to ``max_reps`` within ``budget_s`` — as long
    as the latest rep still improved a minimum by >10% (i.e. the fast
    mode is still being found). In an uncontended run this adds zero
    extra reps."""
    t_los, t_his = [], []
    t_start = time.perf_counter()
    for r in range(max_reps):
        prev = (min(t_los), min(t_his)) if t_los else None
        t0 = time.perf_counter()
        call(n_lo)
        t_los.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        call(n_hi)
        t_his.append(time.perf_counter() - t0)
        if r + 1 >= reps:
            improving = prev is not None and (
                min(t_los) < 0.9 * prev[0] or min(t_his) < 0.9 * prev[1])
            if not improving:
                break
            if time.perf_counter() - t_start > budget_s:
                break
    marginal = (min(t_his) - min(t_los)) / (n_hi - n_lo)
    return marginal, min(t_los)


def roofline(label, t_iter, bytes_naive):
    """Print achieved GB/s against the naive HBM bound and the spec."""
    gbs = bytes_naive / t_iter / 1e9
    note = ""
    if gbs > V5E_PEAK_GBS:
        note = (" — exceeds the 819 GB/s HBM spec because the "
                "loop-invariant working set (Y, S) is VMEM-resident "
                "across fori_loop iterations; the naive bound assumes "
                "HBM re-reads that do not occur")
    log(f"{label}: naive HBM bound {bytes_naive / 1e6:.0f} MB/iter -> "
        f"achieved {gbs:.0f} GB/s vs {V5E_PEAK_GBS:.0f} GB/s peak{note}")
    return gbs


def bench_tpu(Y, A0, S0):
    import jax
    import jax.numpy as jnp
    from proxmin_tpu import operators
    from proxmin_tpu.nmf import _make_fused_pgm_runner, pgm_nmf_iteration

    log(f"devices: {jax.devices()}")
    Y_dev = jnp.asarray(Y)
    A = jnp.asarray(A0)
    S = jnp.asarray(S0)

    # --- engine 1: XLA-fused solver loop --------------------------------
    # Y rides as a jit ARGUMENT, exactly like the production drivers
    # (common.split_partial_data): closure-capturing it embeds a 20 MB
    # HLO constant whose serialization through the remote-lowering path
    # dominated "compile" time in earlier rounds (measured 387s lower +
    # 10s compile captured vs 0.2s + 1.6s as an argument — the r02
    # "1497s compile cliff" was THIS, not XLA compile time).
    @jax.jit
    def run_xla(A, S, Y, n):
        def body(i, carry):
            A, S, _ = carry
            return pgm_nmf_iteration(A, S, Y)

        return jax.lax.fori_loop(0, n, body, (A, S, jnp.asarray(False)))

    t0 = time.perf_counter()
    lowered = run_xla.lower(A, S, Y_dev, ITERS_LO)
    compiled_obj = lowered.compile()
    compile_time = time.perf_counter() - t0

    def call_xla(n):
        # the iteration count is a traced scalar, so the one AOT
        # Compiled object serves every n — going through run_xla()
        # would pay a SECOND full trace+compile (the jit call cache is
        # separate from .lower().compile()) and corrupt the
        # stall-vs-compile attribution
        out = compiled_obj(A, S, Y_dev, jnp.int32(n))
        np.asarray(out[2])         # conv flag is a live output
        return np.asarray(out[0])  # tiny transfer forces real completion

    call_xla(ITERS_LO)   # first dispatch (tunnel stalls land here,
                         # timed separately from compile on purpose)
    t_xla, first = _timed(call_xla, ITERS_LO, ITERS_HI)
    fixed = max(first - ITERS_LO * t_xla, 0.0)
    log(f"tpu/xla:    {t_xla * 1e3:.3f} ms/iter (marginal; "
        f"~{fixed * 1e3:.0f} ms fixed/call; compile {compile_time:.0f}s)")

    # naive bound: read Y (C*N) + read S + write S (K*N each), f32
    bytes_naive = (C * N + 2 * K * N) * 4
    gbs = roofline("tpu/xla", t_xla, bytes_naive)

    # --- engine 2: fully-fused Pallas iteration kernel ------------------
    run_pallas = _make_fused_pgm_runner(
        operators.prox_plus, None, 0.0, 8192, C, K, N, jnp.float32.dtype
    )

    def call_pallas(n):
        out = run_pallas(A, S, Y_dev, n)
        return np.asarray(out[0])

    call_pallas(ITERS_LO)  # compile
    t_pal, first = _timed(call_pallas, ITERS_LO, ITERS_HI)
    fixed = max(first - ITERS_LO * t_pal, 0.0)
    log(f"tpu/pallas: {t_pal * 1e3:.3f} ms/iter (marginal; "
        f"~{fixed * 1e3:.0f} ms fixed/call)")
    roofline("tpu/pallas", t_pal, bytes_naive)

    if t_pal < t_xla:
        return t_pal, "pallas", gbs, compile_time
    return t_xla, "xla", gbs, compile_time


def bench_tpu_unweighted_strided(Y, A0, S0):
    """Unweighted flagship with the STRIDED step policy on both engines
    (``step_adapt=True``, in-carry ApproximateCache growth): the XLA
    driver skips its per-iteration ``S S^T`` Gram + eigensolves between
    refreshes (a full extra S read below the residency cliff it no
    longer pays), the fused runner's segmented frozen-step inner loop
    drops its in-loop eigensolves. The adaptive rows are the fastest
    unweighted configurations measured (r4 follow-up); the headline
    stays the per-iteration-exact engines (same algorithm as the NumPy
    baseline)."""
    import jax.numpy as jnp
    import proxmin_tpu as pt

    Y_dev = jnp.asarray(Y)
    A = jnp.asarray(A0)
    S = jnp.asarray(S0)
    bytes_naive = (C * N + 2 * K * N) * 4

    out = {}
    for name, kw in (
        ("xla-adapt", dict(step_adapt=True, engine="xla")),
        ("pallas-adapt", dict(step_adapt=True, engine="pallas")),
    ):
        def call(n, _kw=kw):
            res = pt.nmf.nmf(Y_dev, A, S, e_rel=0, max_iter=n, **_kw)
            return np.asarray(res.x[0])

        call(ITERS_LO)  # compile
        t_s, first = _timed(call, ITERS_LO, ITERS_HI)
        fixed = max(first - ITERS_LO * t_s, 0.0)
        log(f"tpu/unweighted[{name}]: {t_s * 1e3:.3f} ms/iter "
            f"(marginal; ~{fixed * 1e3:.0f} ms fixed/call)")
        roofline(f"tpu/unweighted[{name}]", t_s, bytes_naive)
        out[name] = t_s
    return out


def bench_tpu_weighted(Y, A0, S0, W):
    """Weighted flagship through the production ``nmf()`` driver, three
    engines: (a) XLA driver with the warm-started
    :class:`~proxmin_tpu.nmf.WeightedPGMStepper` in segmented mode,
    fixed stride; (b) the same with the ADAPTIVE stride (in-carry
    ApproximateCache growth — refreshes become rare as A settles);
    (c) the fused single-pass Pallas iteration kernel
    (``engine='pallas'``), fixed stride."""
    import jax.numpy as jnp
    import proxmin_tpu as pt

    Y_dev = jnp.asarray(Y)
    W_dev = jnp.asarray(W)
    A = jnp.asarray(A0)
    S = jnp.asarray(S0)
    bytes_naive = (2 * C * N + 2 * K * N) * 4  # + W read per iteration

    out = {}
    variants = (
        ("xla-stride", dict(step_stride=STRIDE, engine="xla")),
        ("xla-adapt", dict(step_stride=STRIDE, step_adapt=True,
                           engine="xla")),
        ("pallas-stride", dict(step_stride=STRIDE, engine="pallas")),
        ("pallas-adapt", dict(step_stride=STRIDE, step_adapt=True,
                              engine="pallas")),
    )
    for name, kw in variants:
        def call(n, _kw=kw):
            res = pt.nmf.nmf(Y_dev, A, S, W=W_dev, e_rel=0, max_iter=n,
                             **_kw)
            return np.asarray(res.x[0])

        t0 = time.perf_counter()
        call(W_ITERS_LO)  # compile
        compile_time = time.perf_counter() - t0
        t_w, first = _timed(call, W_ITERS_LO, W_ITERS_HI)
        fixed = max(first - W_ITERS_LO * t_w, 0.0)
        log(f"tpu/weighted[{name}]: {t_w * 1e3:.3f} ms/iter "
            f"(marginal; ~{fixed * 1e3:.0f} ms fixed/call; "
            f"compile {compile_time:.0f}s)")
        roofline(f"tpu/weighted[{name}]", t_w, bytes_naive)
        out[name] = t_w
    return out


def bench_tpu_adaprox(Y, A0, S0):
    """AdaProx flagship, three engines: (a) XLA driver with the
    separable closed-form prox; (b) the fused single-pass Pallas
    Adam+prox kernel (f32 moments — naive traffic 188 MB/iter, same as
    xla's floor, but no gS materialization); (c) the fused kernel with
    in-kernel bf16 moment storage (132 MB/iter — the only variant whose
    naive bound beats the 0.19 ms xla measurement). Returns the dict;
    headline takes the min."""
    import jax.numpy as jnp
    import proxmin_tpu as pt

    Y_dev = jnp.asarray(Y)
    A = jnp.asarray(A0)
    S = jnp.asarray(S0)

    variants = (
        ("xla-separable", dict()),
        ("pallas-fused", dict(engine="pallas")),
        ("pallas-fused-bf16m", dict(engine="pallas",
                                    moment_dtype=jnp.bfloat16)),
    )
    out = {}
    for name, kw in variants:
        def call(n, _kw=kw):
            res = pt.nmf.nmf(Y_dev, A, S, algorithm="adaprox", e_rel=0,
                             max_iter=n, separable_prox="auto", **_kw)
            return np.asarray(res.x[0])

        call(ITERS_LO)  # compile
        t_a, first = _timed(call, ITERS_LO, ITERS_HI)
        fixed = max(first - ITERS_LO * t_a, 0.0)
        log(f"tpu/adaprox[{name}]: {t_a * 1e3:.3f} ms/iter (marginal; "
            f"~{fixed * 1e3:.0f} ms fixed/call)")
        out[name] = t_a
    return out


E2E_ITERS = 2000


def bench_e2e(Y, A0, S0):
    """End-to-end fixed-work solve (2000 iterations through the full
    production nmf() driver): one compiled call, wall-clock INCLUDING
    fixed dispatch/transfer overhead and the driver's per-iteration
    convergence machinery. Also decomposes the driver cost into a
    marginal slope + fixed/call between two iteration budgets, so the
    driver's per-iteration overhead over the raw fused body is a
    recorded number (r4: the shared fixed-point norms made it ~zero)."""
    import jax.numpy as jnp
    import proxmin_tpu as pt

    Y_dev = jnp.asarray(Y)
    A = jnp.asarray(A0)
    S = jnp.asarray(S0)

    def call(n):
        res = pt.nmf.nmf(Y_dev, A, S, e_rel=0, max_iter=n)
        np.asarray(res.x[0])
        return res

    res = call(E2E_ITERS)  # compile
    iters = res.iterations
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = call(E2E_ITERS)
        best = min(best, time.perf_counter() - t0)
    log(f"tpu e2e solve: {best:.3f} s for {iters} iters "
        f"(one compiled call incl. dispatch + convergence machinery)")

    call(ITERS_LO)  # compile the lo budget
    marg, t_lo = _timed(call, ITERS_LO, E2E_ITERS)
    fixed = max(t_lo - ITERS_LO * marg, 0.0)
    log(f"tpu driver: {marg * 1e3:.3f} ms/iter marginal, "
        f"~{fixed * 1e3:.0f} ms fixed/call")
    return best, iters, marg, fixed


def _backend_alive(timeout_s=180):
    """Probe the accelerator backend in a SUBPROCESS with a timeout.

    The remote TPU tunnel has transient outages during which any jax op
    blocks indefinitely (observed repeatedly); probing in-process would
    hang this benchmark. A dead probe -> fail fast with an explanation
    instead of hanging the caller."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "jnp.ones(3).block_until_ready(); print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _backend_alive():
        log("FATAL: accelerator backend unreachable (remote-tunnel "
            "outage) — benchmark cannot run. Last measured numbers are "
            "recorded in benchmarks/results_r4.json and "
            "docs/BENCHMARKS.md (unweighted 0.07-0.10 ms/iter "
            "~1100-1600x NumPy, weighted adaptive 0.10-0.17 ms/iter, "
            "adaprox fused-bf16m 0.13-0.16 ms/iter, e2e 2000 iters "
            "~0.28 s).")
        sys.exit(1)

    Y, A0, S0, W = make_problem(weighted=True)
    log(f"problem: Y {C}x{N}, K={K}, float32")

    t_np = bench_numpy(Y, A0, S0)
    log(f"numpy: {t_np * 1e3:.2f} ms/iter")
    t_np_w = bench_numpy_weighted(Y, A0, S0, W)
    log(f"numpy weighted (strided, implicit): {t_np_w * 1e3:.2f} ms/iter")

    # fixed-iteration timing solves each emit a "did not converge"
    # WARNING through the production drivers; collapse them to one
    # summary line so a real regression warning stays visible
    from proxmin_tpu.utils import summarize_convergence_warnings

    with summarize_convergence_warnings():
        t_tpu, engine, gbs, compile_s = bench_tpu(Y, A0, S0)
        log(f"tpu best ({engine}): {t_tpu * 1e3:.3f} ms/iter")
        t_us = bench_tpu_unweighted_strided(Y, A0, S0)
        t_ws = bench_tpu_weighted(Y, A0, S0, W)
        t_tpu_w = min(t_ws.values())
        t_as = bench_tpu_adaprox(Y, A0, S0)
        # headline stays the full-precision number; the bf16-moment
        # fused row is reported alongside, clearly labeled (reduced
        # moment precision is an opt-in, not a silent default)
        t_tpu_a = t_as["xla-separable"]
        t_e2e, e2e_iters, t_drv, fixed_drv = bench_e2e(Y, A0, S0)

    speedup = t_np / t_tpu
    speedup_w = t_np_w / t_tpu_w
    e2e_numpy_equiv = t_np * e2e_iters
    e2e_speedup = e2e_numpy_equiv / t_e2e

    extra = {
        "weighted_stride10_per_iter_speedup_vs_numpy": round(speedup_w, 1),
        "weighted_tpu_ms_per_iter": round(t_tpu_w * 1e3, 4),
        "weighted_variants_ms_per_iter": {
            k: round(v * 1e3, 4) for k, v in t_ws.items()
        },
        "flagship_compile_seconds": round(compile_s, 1),
        "e2e_2000iter_seconds": round(t_e2e, 3),
        "e2e_iterations": e2e_iters,
        "e2e_speedup_vs_numpy_equiv": round(e2e_speedup, 1),
        "driver_marginal_ms_per_iter": round(t_drv * 1e3, 4),
        "driver_fixed_ms_per_call": round(fixed_drv * 1e3, 1),
        "xla_ms_per_iter": round(t_tpu * 1e3, 4),
        "unweighted_strided_variants_ms_per_iter": {
            k: round(v * 1e3, 4) for k, v in t_us.items()
        },
        "unweighted_best_any_policy_ms_per_iter": round(
            min(t_tpu, min(t_us.values())) * 1e3, 4),
        "adaprox_separable_ms_per_iter": round(t_tpu_a * 1e3, 4),
        "adaprox_variants_ms_per_iter": {
            k: round(v * 1e3, 4) for k, v in t_as.items()
        },
        "adaprox_best_ms_per_iter": round(min(t_as.values()) * 1e3, 4),
        "numpy_ms_per_iter": round(t_np * 1e3, 2),
        "achieved_gbs_vs_naive_hbm_bound": round(gbs, 0),
        "hbm_peak_gbs": V5E_PEAK_GBS,
        "roofline_note": (
            "marginal/iter can exceed the naive HBM bound because the "
            "loop-invariant working set stays VMEM-resident across "
            "fori_loop iterations"
        ),
    }
    # secondary metrics as their own JSON lines (machine-capturable), the
    # headline LAST so tail-parsers keep working
    print(json.dumps({
        "metric": "nmf_pgm_1e6px_weighted_stride10_per_iter_speedup",
        "value": round(speedup_w, 1), "unit": "x",
        "vs_baseline": round(speedup_w, 1),
    }))
    print(json.dumps({
        "metric": "nmf_pgm_1e6px_e2e_2000iter_seconds",
        "value": round(t_e2e, 3), "unit": "s",
        "vs_baseline": round(e2e_speedup, 1),
    }))
    print(json.dumps({
        "metric": "nmf_pgm_1e6px_per_iter_speedup_vs_numpy",
        "value": round(speedup, 1),
        "unit": "x",
        "vs_baseline": round(speedup, 1),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
