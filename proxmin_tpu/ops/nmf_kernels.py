"""Fused NMF gradient kernel.

The XLA path for one NMF iteration materializes the residual
``D = W * (A S - Y)`` (C×N) in HBM and reads it back for each of the two
factor-gradient matmuls (reference math: ``nmf.py:39-41``). At the 1e6-pixel
scale the iteration is HBM-bandwidth-bound, so that extra round trip is the
dominant waste.

:func:`fused_nmf_grad` streams S/Y(/W) tiles through VMEM once and produces

* ``grad_A = D S^T``            (C×K, accumulated across tiles in VMEM)
* ``grad_S = A^T D``            (K×N, written tile by tile)
* ``SSt    = S S^T``            (K×K Gram, for the Lipschitz step — free
                                 since S is already in VMEM)
* ``loss   = sum(W (A S - Y)^2) / 2``

D never touches HBM. Factor dims are zero-padded to the float32 tile
sublane (8); zero rows/columns contribute exact zeros to every output, so
no masking is needed (padding correctness argued in the tests).
"""

import functools

from ..precision import (
    KERNEL_RESIDUAL_PRECISION,
    STREAM_PRECISION,
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_nmf_grad", "fused_nmf_pgm_step", "fused_nmf_adaprox_step"]

_SUBLANE = 8          # float32 sublane tile
_LANE = 128
_DEFAULT_TILE_N = 8192

#: In-kernel implementation of the absolute-error-critical K-axis
#: product ``A @ S`` (see precision.py). Mosaic has no HIGH (bf16x3)
#: lowering and its HIGHEST (bf16x6) measured +55% on the v5e flagship,
#: so the kernels compute the product as an explicit K-step FMA on the
#: VPU: the operands are VMEM-resident per tile, the multiplies are
#: exact f32 (better than HIGH/HIGHEST: no bf16 splitting at all), and
#: it measured FASTEST of every converging variant (r5 residual-impl
#: sweep: fma 0.1123 ms/iter flagship-adapt vs split3 0.1449,
#: dot-highest 0.1547; dot-default 0.0908 but NON-CONVERGENT —
#: benchmarks/results_r5.json). "split3" (the manual bf16 hi/lo
#: 3-dot scheme, = XLA HIGH) remains available for very large C*K
#: where the VPU loop would bind. bf16-STORED operands multiply
#: exactly in one pass, so they use the plain dot either way.
RESIDUAL_IMPL = "auto"  # "auto" | "fma" | "split3" | "dot-highest" | "dot-default"

#: "auto" crossover: the VPU FMA loop costs C*K multiply-adds per
#: pixel column while split3 costs three MXU passes regardless, so
#: the FMA wins small factor planes and loses big ones (r5 shape
#: sweep: fma 0.114 vs split3 0.133 ms/iter at C*K=512, but 0.301
#: vs 0.216 at C*K=2048). Padded dims decide at trace time.
_FMA_MAX_CK = 512


def _residual_dot(A, S):
    """``A @ S`` with f32-grade product accuracy inside a kernel.

    ``A``/``S`` may be f32 or bf16 (store_dtype); bf16 inputs multiply
    exactly on the MXU so the single-pass dot is already exact for
    them."""
    f32 = jnp.float32
    if A.dtype != f32 and S.dtype != f32:
        return jnp.dot(A, S, preferred_element_type=f32,
                       precision=STREAM_PRECISION)
    impl = RESIDUAL_IMPL
    if impl == "auto":
        impl = "fma" if A.shape[0] * A.shape[1] <= _FMA_MAX_CK else "split3"
    if impl == "dot-highest":
        return jnp.dot(A, S, preferred_element_type=f32,
                       precision=KERNEL_RESIDUAL_PRECISION)
    if impl == "dot-default":
        return jnp.dot(A, S, preferred_element_type=f32,
                       precision=STREAM_PRECISION)
    if impl == "fma":
        # explicit K-step FMA on the VPU: exact f32, no MXU passes
        A32 = A.astype(f32)
        S32 = S.astype(f32)
        acc = A32[:, 0:1] * S32[0:1, :]
        for k in range(1, A.shape[1]):
            acc = acc + A32[:, k : k + 1] * S32[k : k + 1, :]
        return acc

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=f32,
                       precision=STREAM_PRECISION)

    A32 = A.astype(f32)
    S32 = S.astype(f32)
    A_hi = A32.astype(jnp.bfloat16)
    A_lo = (A32 - A_hi.astype(f32)).astype(jnp.bfloat16)
    S_hi = S32.astype(jnp.bfloat16)
    S_lo = (S32 - S_hi.astype(f32)).astype(jnp.bfloat16)
    return d(A_hi, S_hi) + (d(A_hi, S_lo) + d(A_lo, S_hi))


def _pad_to(x, rows=None, cols=None):
    r = 0 if rows is None else rows - x.shape[0]
    c = 0 if cols is None else cols - x.shape[1]
    if r == 0 and c == 0:
        return x
    return jnp.pad(x, ((0, r), (0, c)))


def _round_up(v, m):
    return ((v + m - 1) // m) * m


_VMEM_BUDGET = 12 * 2 ** 20  # leave headroom under the ~16MB scoped limit


def _auto_tile(Cp, Kp, weighted, tile_n, N):
    """Shrink the pixel tile until the working set fits VMEM (large-C
    problems would otherwise OOM the ~16MB scoped allocation).

    Model (bytes per pixel column, f32): double-buffered I/O blocks
    (S, S_new, Y, and W when weighted) plus the kernel's live
    intermediates (residual/D at Cp rows; gS, S_new, iota masks at Kp
    rows) — validated against Mosaic's scoped-allocation report.
    """
    tile_n = min(tile_n, _round_up(N, _LANE))
    io_cols = 2 * (2 * Kp + Cp * (2 if weighted else 1))
    tmp_cols = Cp * (2 if weighted else 1) + 4 * Kp
    per_col = 4 * (io_cols + tmp_cols)
    while tile_n > _LANE and tile_n * per_col > _VMEM_BUDGET:
        tile_n //= 2
    return max(_round_up(tile_n, _LANE), _LANE)


def _kernel(A_ref, S_ref, Y_ref, *refs, weighted):
    # refs = (W_ref?, gA_ref, gS_ref, SSt_ref, loss_ref): the W input only
    # exists in the weighted variant — declaring an unused block would
    # still be DMA'd into VMEM (bandwidth + scoped-memory cost)
    if weighted:
        W_ref, gA_ref, gS_ref, SSt_ref, loss_ref = refs
    else:
        gA_ref, gS_ref, SSt_ref, loss_ref = refs
    j = pl.program_id(0)

    A = A_ref[:]                     # (Cp, Kp)
    S = S_ref[:]                     # (Kp, TN)
    Y = Y_ref[:]                     # (Cp, TN)

    # K-axis product: absolute-error-critical (see _residual_dot)
    R = _residual_dot(A, S) - Y
    D = W_ref[:] * R if weighted else R

    @pl.when(j == 0)
    def _():
        gA_ref[:] = jnp.zeros_like(gA_ref)
        SSt_ref[:] = jnp.zeros_like(SSt_ref)
        loss_ref[0, 0] = jnp.float32(0.0)

    gA_ref[:] += jnp.dot(D, S.T, preferred_element_type=jnp.float32,
                         precision=STREAM_PRECISION)
    gS_ref[:] = jnp.dot(A.T, D, preferred_element_type=jnp.float32,
                        precision=STREAM_PRECISION)
    SSt_ref[:] += jnp.dot(S, S.T, preferred_element_type=jnp.float32,
                          precision=STREAM_PRECISION)
    # loss = sum(W R^2)/2 = sum(D R)/2 (reduces to sum(R^2)/2 unweighted)
    loss_ref[0, 0] += jnp.sum(D * R) / 2


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _fused_call(A, S, Y, W, tile_n, interpret):
    C, K = A.shape
    N = S.shape[1]
    Cp = _round_up(max(C, _SUBLANE), _SUBLANE)
    Kp = _round_up(max(K, _SUBLANE), _SUBLANE)
    weighted = W is not None
    tile_n = _auto_tile(Cp, Kp, weighted, tile_n, N)
    Np = _round_up(N, tile_n)

    A_p = _pad_to(A.astype(jnp.float32), Cp, Kp)
    S_p = _pad_to(S.astype(jnp.float32), Kp, Np)
    Y_p = _pad_to(Y.astype(jnp.float32), Cp, Np)

    grid = (Np // tile_n,)
    kernel = functools.partial(_kernel, weighted=weighted)

    in_specs = [
        pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [A_p, S_p, Y_p]
    if weighted:
        in_specs.append(pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(_pad_to(W.astype(jnp.float32), Cp, Np))

    gA, gS, SSt, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * (Cp * Kp * 3 + Kp * Kp),
            bytes_accessed=4 * Np * (Kp * 2 + Cp * (2 if weighted else 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)

    return gA[:C, :K], gS[:K, :N], SSt[:K, :K], loss[0, 0]


def _pgm_step_kernel(dims_ref, sS_ref, A_ref, S_ref, Y_ref, *refs,
                     weighted, prox_S, tile_n, mask_padding):
    """One whole PGM iteration's S-side work in a single pass over the tile:

        R        = A S - Y            (residual, VMEM only)
        D        = W R (or R)
        gS       = A^T D
        S_new    = prox_S(S - sS gS, sS)      masked to valid rows/cols
        gA      += D S^T                       (uses OLD S — Jacobi block
                                                update, reference pgm
                                                semantics algorithms.py:105-108)
        SSt_new += S_new S_new^T               (the NEXT iteration's
                                                Lipschitz input — exact,
                                                not lagged)
        stats   += [loss, ||S_new - S||^2, ||S_new||^2]
    """
    if weighted:
        W_ref, gA_ref, Snew_ref, SSt_ref, stats_ref = refs
    else:
        gA_ref, Snew_ref, SSt_ref, stats_ref = refs
    j = pl.program_id(0)
    C_orig = dims_ref[0]
    K_orig = dims_ref[1]
    N_orig = dims_ref[2]
    sS = sS_ref[0, 0]

    # storage dtype may be bfloat16 (half the HBM traffic); all compute is
    # f32 — the MXU consumes bf16 operands natively with f32 accumulation
    store_dt = S_ref.dtype
    A = A_ref[:]
    S_raw = S_ref[:]
    S = S_raw.astype(jnp.float32)
    Y = Y_ref[:].astype(jnp.float32)

    R = _residual_dot(A.astype(store_dt), S_raw) - Y
    D = W_ref[:].astype(jnp.float32) * R if weighted else R

    gS = jnp.dot(A.T, D, preferred_element_type=jnp.float32,
                 precision=STREAM_PRECISION)
    S_new = prox_S(S - sS * gS, sS)

    if mask_padding:
        # zero out padded rows/columns so arbitrary prox functions (which
        # may move zeros) cannot leak padding into the next iteration.
        # Skipped for the built-in non-negativity prox: zeros are exact
        # fixed points of the padded recursion, and the two iotas + select
        # are measurable VPU overhead per tile.
        Kp, TN = S.shape
        row_ok = jax.lax.broadcasted_iota(jnp.int32, (Kp, TN), 0) < K_orig
        col_ok = (jax.lax.broadcasted_iota(jnp.int32, (Kp, TN), 1)
                  + j * TN) < N_orig
        S_new = jnp.where(jnp.logical_and(row_ok, col_ok), S_new, 0.0)

    @pl.when(j == 0)
    def _():
        gA_ref[:] = jnp.zeros_like(gA_ref)
        SSt_ref[:] = jnp.zeros_like(SSt_ref)
        stats_ref[0] = jnp.float32(0.0)
        stats_ref[1] = jnp.float32(0.0)
        stats_ref[2] = jnp.float32(0.0)

    S_new_stored = S_new.astype(store_dt)
    Snew_ref[:] = S_new_stored
    # the Gram feeding the next Lipschitz step uses the values that will
    # actually be read back (post-rounding) so the recursion stays
    # self-consistent under bf16 storage
    S_next = S_new_stored.astype(jnp.float32)
    gA_ref[:] += jnp.dot(D, S.T, preferred_element_type=jnp.float32,
                         precision=STREAM_PRECISION)
    SSt_ref[:] += jnp.dot(S_next, S_next.T,
                          preferred_element_type=jnp.float32,
                          precision=STREAM_PRECISION)
    stats_ref[0] += jnp.sum(D * R) / 2
    dS = S_next - S
    stats_ref[1] += jnp.sum(dS * dS)
    stats_ref[2] += jnp.sum(S_next * S_next)


def fused_nmf_pgm_step(A, S, Y, sS, W=None, prox_S=None,
                       tile_n=_DEFAULT_TILE_N, dims=None, interpret=None):
    """Single fused PGM-NMF iteration (S-side) — one HBM pass.

    Inputs must be pre-padded to tile-aligned shapes (use
    :func:`pad_nmf_problem`); ``dims = (C, K, N)`` gives the true sizes for
    padding masks. Returns ``(gA, S_new, SSt_new, loss, dS_sq, nS_sq)``:

    * ``gA``: gradient of the A factor at the (old) iterate — the caller
      applies ``A_new = prox_A(A - sA * gA, sA)`` (a tiny C×K op);
    * ``S_new``: the proxed S update with step ``sS``;
    * ``SSt_new = S_new S_new^T``: the exact Gram the *next* iteration
      needs for its Lipschitz step — so the PGM recursion stays exact
      while doing one pass per iteration;
    * ``loss`` at the old iterate, and the fixed-point convergence
      statistics ``||S_new - S||^2`` / ``||S_new||^2``.

    ``prox_S`` must be a jittable elementwise-or-factor-axis-local
    operator (anything normalizing along the pixel axis needs the sharded
    path instead). Default: non-negativity.
    """
    import jax.numpy as jnp  # local alias for clarity

    # the built-in non-negativity prox preserves zeros exactly, so padded
    # rows/columns stay zero without masking; arbitrary user proxs get the
    # safety masks
    mask_padding = prox_S is not None
    if prox_S is None:
        prox_S = lambda x, s: jnp.maximum(x, 0.0)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    Cp, Kp = A.shape
    Np = S.shape[1]
    sub = 16 if S.dtype == jnp.bfloat16 else _SUBLANE
    assert Cp % sub == 0 and Kp % sub == 0 and Np % tile_n == 0, (
        "fused_nmf_pgm_step expects pre-padded shapes; use pad_nmf_problem"
    )
    if dims is None:
        dims = (Cp, Kp, Np)
    dims_arr = jnp.asarray(dims, jnp.int32)
    sS_arr = jnp.full((1, 1), sS, jnp.float32)
    weighted = W is not None

    kernel = functools.partial(
        _pgm_step_kernel, weighted=weighted, prox_S=prox_S, tile_n=tile_n,
        mask_padding=mask_padding,
    )
    grid = (Np // tile_n,)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),       # dims (3,)
        pl.BlockSpec((1, 1), lambda j: (0, 0),
                     memory_space=pltpu.SMEM),       # sS
        pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [dims_arr, sS_arr, A, S, Y]
    if weighted:
        in_specs.append(pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(W)

    gA, S_new, SSt, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Np), S.dtype),
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * (Cp * Kp * 3 + Kp * Kp),
            bytes_accessed=S.dtype.itemsize * Np
            * (Kp * 2 + Cp * (2 if weighted else 1)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)

    return gA, S_new, SSt, stats[0], stats[1], stats[2]


def _adaprox_step_kernel(dims_ref, sc_ref, alpha_ref, A_ref, S_ref, M_ref,
                         V_ref, Y_ref, *refs, weighted, prox_S, b2, eps,
                         mask_padding):
    """One whole AdaProx (proximal-Adam, ``scheme='adam'``) iteration's
    S-side work in a single pass over the pixel tile:

        R      = A S - Y                      (residual, VMEM only)
        D      = W R (or R)
        gS     = A^T D
        M'     = (1 - b1_t) gS + b1_t M       (EMA moments — reference
        V'     = (1 - b2) gS^2 + b2 V          algorithms.py:147-160)
        Phi    = M' / (1 - b1_t^t)
        Psi    = sqrt(V' / (1 - b2^t)) + eps
        S1     = prox_S(S - alpha_S Phi/Psi, alpha_S/Psi)   (separable
                 closed-form scaled prox — exact, adaprox.py:271-281)
        gA    += D S^T                        (OLD S — Jacobi blocks,
                                               reference algorithms.py:374)
        rowsum+= sum_n S1                     (feeds the NEXT iteration's
                                               step_adaprox mean/10 step)
        stats += [loss, ||S1 - S||^2, ||S1||^2]

    S, M, V stream through VMEM exactly once per iteration (read+write);
    the moments never round-trip through HBM between the EMA update and
    the Psi/prox consumption, unlike the XLA path where gS materializes.
    M/V refs may be stored bfloat16 (``moment_dtype``): the cast happens
    in-register inside the same pass, so — unlike the XLA
    ``moment_dtype`` path, where the casts are separate VPU passes over
    HBM-resident arrays — reduced-precision storage here strictly
    reduces HBM traffic.
    """
    if weighted:
        W_ref, gA_ref, Snew_ref, Mnew_ref, Vnew_ref, rowsum_ref, \
            stats_ref = refs
    else:
        gA_ref, Snew_ref, Mnew_ref, Vnew_ref, rowsum_ref, stats_ref = refs
    j = pl.program_id(0)
    K_orig = dims_ref[1]
    N_orig = dims_ref[2]
    b1_t = sc_ref[0]    # b1 at this iteration (schedule value)
    bc1 = sc_ref[1]     # 1 / (1 - b1_t^t)
    bc2 = sc_ref[2]     # 1 / (1 - b2^t)

    # storage dtype may be bfloat16 for S/Y/W (like the PGM kernel);
    # all compute is f32 — casts are in-register within this pass
    store_dt = S_ref.dtype
    A = A_ref[:]
    S_raw = S_ref[:]
    S = S_raw.astype(jnp.float32)
    Y = Y_ref[:].astype(jnp.float32)
    alpha = alpha_ref[:]                       # (Kp, 1) per-row step

    R = _residual_dot(A.astype(store_dt), S_raw) - Y
    D = W_ref[:].astype(jnp.float32) * R if weighted else R

    gS = jnp.dot(A.T, D, preferred_element_type=jnp.float32,
                 precision=STREAM_PRECISION)
    M1 = (1.0 - b1_t) * gS + b1_t * M_ref[:].astype(jnp.float32)
    V1 = (1.0 - b2) * (gS * gS) + b2 * V_ref[:].astype(jnp.float32)
    Phi = M1 * bc1
    Psi = jnp.sqrt(V1 * bc2) + eps
    Psi_safe = jnp.maximum(Psi, jnp.finfo(jnp.float32).tiny)
    S1 = S - alpha * (Phi / Psi_safe)
    if prox_S is not None:
        S1 = prox_S(S1, alpha / Psi_safe)
    else:
        S1 = jnp.maximum(S1, 0.0)

    if mask_padding:
        # arbitrary separable proxs may move zeros; keep padding exact
        Kp, TN = S.shape
        row_ok = jax.lax.broadcasted_iota(jnp.int32, (Kp, TN), 0) < K_orig
        col_ok = (jax.lax.broadcasted_iota(jnp.int32, (Kp, TN), 1)
                  + j * TN) < N_orig
        S1 = jnp.where(jnp.logical_and(row_ok, col_ok), S1, 0.0)

    @pl.when(j == 0)
    def _():
        gA_ref[:] = jnp.zeros_like(gA_ref)
        rowsum_ref[:] = jnp.zeros_like(rowsum_ref)
        stats_ref[0] = jnp.float32(0.0)
        stats_ref[1] = jnp.float32(0.0)
        stats_ref[2] = jnp.float32(0.0)

    S1_stored = S1.astype(store_dt)
    Snew_ref[:] = S1_stored
    Mnew_ref[:] = M1.astype(Mnew_ref.dtype)
    Vnew_ref[:] = V1.astype(Vnew_ref.dtype)
    # downstream statistics use the values that will actually be read
    # back (post-rounding), keeping the recursion self-consistent under
    # bf16 storage — same rule as the PGM kernel's SSt
    S1_next = S1_stored.astype(jnp.float32)
    gA_ref[:] += jnp.dot(D, S.T, preferred_element_type=jnp.float32,
                         precision=STREAM_PRECISION)
    rowsum_ref[:] += jnp.sum(S1_next, axis=1, keepdims=True)
    stats_ref[0] += jnp.sum(D * R) / 2
    dS = S1_next - S
    stats_ref[1] += jnp.sum(dS * dS)
    stats_ref[2] += jnp.sum(S1_next * S1_next)


def _adaprox_auto_tile(Cp, Kp, weighted, tile_n, N, moment_bytes=4,
                       store_bytes=4):
    """VMEM budget model for the adaprox kernel: double-buffered I/O
    blocks (S in/out, M in/out, V in/out, Y, W?) plus live intermediates
    (R/D at Cp rows; gS, M1, V1, Phi/Psi, S1 at Kp rows)."""
    tile_n = min(tile_n, _round_up(N, _LANE))
    io_cols = 2 * (2 * Kp                       # S in + out
                   + Cp * (2 if weighted else 1))
    io_bytes_col = store_bytes * io_cols + 2 * moment_bytes * 2 * Kp * 2
    tmp_bytes_col = 4 * (Cp * (2 if weighted else 1) + 6 * Kp)
    per_col = io_bytes_col + tmp_bytes_col
    while tile_n > _LANE and tile_n * per_col > _VMEM_BUDGET:
        tile_n //= 2
    return max(_round_up(tile_n, _LANE), _LANE)


def fused_nmf_adaprox_step(A, S, M, V, Y, alpha_S, scalars, W=None,
                           prox_S=None, b2=0.999, eps=1e-8,
                           tile_n=_DEFAULT_TILE_N, dims=None,
                           interpret=None):
    """Single fused proximal-Adam NMF iteration (S-side) — one HBM pass.

    Inputs must be pre-padded to tile-aligned shapes; ``dims=(C, K, N)``
    gives true sizes. ``alpha_S`` is the per-row step ``(Kp, 1)``;
    ``scalars = (b1_t, 1/(1-b1_t^t), 1/(1-b2^t))`` as a float32 ``(3,)``
    array (computed by the caller per iteration — cheap host-XLA math,
    keeping powers-of-traced-scalars out of the kernel). ``M``/``V`` may
    be bfloat16 (``moment_dtype``): compute is f32 in-register either
    way. Returns
    ``(gA, S_new, M_new, V_new, rowsum_S1, loss, dS_sq, nS_sq)``.

    ``prox_S`` must be a separable (elementwise, factor-axis-local)
    scaled prox — the exact closed form of the adaprox sub-iteration
    limit (see ``solvers/adaprox.py:271-281``); default non-negativity.
    """
    mask_padding = prox_S is not None
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    Cp, Kp = A.shape
    Np = S.shape[1]
    assert M.shape == S.shape and V.shape == S.shape
    sub = 16 if S.dtype == jnp.bfloat16 else _SUBLANE
    assert Cp % sub == 0 and Kp % sub == 0 and \
        Np % tile_n == 0, (
            "fused_nmf_adaprox_step expects pre-padded shapes"
        )
    if dims is None:
        dims = (Cp, Kp, Np)
    dims_arr = jnp.asarray(dims, jnp.int32)
    sc_arr = jnp.asarray(scalars, jnp.float32)
    weighted = W is not None
    mdt = M.dtype

    kernel = functools.partial(
        _adaprox_step_kernel, weighted=weighted, prox_S=prox_S,
        b2=float(b2), eps=float(eps), mask_padding=mask_padding,
    )
    grid = (Np // tile_n,)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),       # dims (3,)
        pl.BlockSpec(memory_space=pltpu.SMEM),       # scalars (3,)
        pl.BlockSpec((Kp, 1), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),       # alpha_S
        pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),       # S
        pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),       # M
        pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),       # V
        pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),       # Y
    ]
    inputs = [dims_arr, sc_arr, alpha_S, A, S, M, V, Y]
    if weighted:
        in_specs.append(pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(W)

    gA, S_new, M_new, V_new, rowsum, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Np), S.dtype),
            jax.ShapeDtypeStruct((Kp, Np), mdt),
            jax.ShapeDtypeStruct((Kp, Np), mdt),
            jax.ShapeDtypeStruct((Kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Cp * Kp * 3 + 12 * Np * Kp,
            bytes_accessed=Np * (
                S.dtype.itemsize * 2 * Kp        # S read + write
                + 2 * mdt.itemsize * 2 * Kp      # M, V read + write
                + S.dtype.itemsize * Cp * (2 if weighted else 1)
            ),
            transcendentals=Np * Kp,             # the Psi sqrt
        ),
        interpret=interpret,
    )(*inputs)

    return (gA, S_new, M_new, V_new, rowsum,
            stats[0], stats[1], stats[2])


def pad_nmf_problem(A, S, Y, W=None, tile_n=_DEFAULT_TILE_N):
    """Zero-pad an NMF problem to tile-aligned shapes (one-time cost).

    Zero rows/columns are exact fixed points of the fused iteration (the
    kernel masks them after the prox), so padding changes nothing.
    Returns ``(A_p, S_p, Y_p, W_p, dims)`` with ``dims = (C, K, N)``.
    """
    C, K = A.shape
    N = S.shape[1]
    Cp = _round_up(max(C, _SUBLANE), _SUBLANE)
    Kp = _round_up(max(K, _SUBLANE), _SUBLANE)
    tile_n = _auto_tile(Cp, Kp, W is not None, tile_n, N)
    Np = _round_up(N, tile_n)
    A_p = _pad_to(jnp.asarray(A, jnp.float32), Cp, Kp)
    S_p = _pad_to(jnp.asarray(S, jnp.float32), Kp, Np)
    Y_p = _pad_to(jnp.asarray(Y, jnp.float32), Cp, Np)
    W_p = (_pad_to(jnp.asarray(W, jnp.float32), Cp, Np)
           if W is not None else None)
    return A_p, S_p, Y_p, W_p, (C, K, N), tile_n


def fused_nmf_grad(A, S, Y, W=None, tile_n=_DEFAULT_TILE_N, interpret=None):
    """One-pass fused NMF gradients.

    Returns ``(grad_A, grad_S, SSt, loss)`` for the Gaussian model with
    residual ``D = W * (A S - Y)`` (W=None for unweighted): both factor
    gradients, the ``S S^T`` Gram (Lipschitz step input) and the loss,
    reading S/Y/W from HBM exactly once and never materializing D.

    ``interpret=None`` auto-selects: compiled on TPU backends, interpreter
    elsewhere (for tests).
    """
    A = jnp.asarray(A)
    S = jnp.asarray(S)
    Y = jnp.asarray(Y)
    if W is not None:
        W = jnp.asarray(W)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    N = S.shape[1]
    tile_n = min(tile_n, _round_up(N, _LANE))
    return _fused_call(A, S, Y, W, tile_n, interpret)
