"""Stream-merge experiment for the fused proximal-Adam kernel.

Question (round-4 follow-up): the f32 single-pass fused adaprox kernel
measured 0.34-0.45 ms/iter at the flagship — ABOVE its ~0.18 ms
bandwidth bound — while the bf16-moment variant sits AT its bound
(0.129 ms for 132 MB/iter). The hypothesis recorded in
benchmarks/results_r4.json is that the DMA *stream count* (7 concurrent
HBM block streams: S/M/V in, S/M/V out, Y), not bytes, limits the f32
variant. This script settles it by measuring packed-state variants that
move the same bytes through fewer streams:

  base-f32    : S,M,V separate        -> 7 streams (current kernel)
  packed-f32  : SMV stacked (3Kp, N)  -> 3 streams (SMV in/out, Y)
  base-bf16m  : S f32, M,V bf16       -> 7 streams (current kernel)
  packed-bf16m: S f32, MV (2Kp) bf16  -> 5 streams

All variants compute the identical iteration (verified in
tests/test_pallas_ops.py::test_packed_adaprox_variant_matches); only
the HBM layout differs. Timing is the lo/hi marginal protocol
(independent minima per the measurement playbook).

Run: python benchmarks/stream_merge.py [--quick]
"""
import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from proxmin_tpu.ops.nmf_kernels import (          # noqa: E402
    _SUBLANE, _round_up, fused_nmf_adaprox_step,
)


def _packed_kernel(dims_ref, sc_ref, alpha_ref, A_ref, *refs, b2, eps,
                   Kp, layout):
    """The adaprox S-side iteration with packed state.

    layout='smv': refs = (SMV, Y, gA, SMVnew, rowsum, stats); SMV is
    (3Kp, tile) f32 rows [S; M; V].
    layout='mv': refs = (S, MV, Y, gA, Snew, MVnew, rowsum, stats); MV
    is (2Kp, tile) bf16 rows [M; V], S separate f32.
    """
    if layout == "smv":
        SMV_ref, Y_ref, gA_ref, SMVn_ref, rowsum_ref, stats_ref = refs
        S = SMV_ref[0:Kp, :]
        M = SMV_ref[Kp:2 * Kp, :].astype(jnp.float32)
        V = SMV_ref[2 * Kp:3 * Kp, :].astype(jnp.float32)
    else:
        S_ref, MV_ref, Y_ref, gA_ref, Sn_ref, MVn_ref, rowsum_ref, \
            stats_ref = refs
        S = S_ref[:]
        M = MV_ref[0:Kp, :].astype(jnp.float32)
        V = MV_ref[Kp:2 * Kp, :].astype(jnp.float32)

    j = pl.program_id(0)
    b1_t = sc_ref[0]
    bc1 = sc_ref[1]
    bc2 = sc_ref[2]
    A = A_ref[:]
    Y = Y_ref[:]
    alpha = alpha_ref[:]

    R = jnp.dot(A, S, preferred_element_type=jnp.float32) - Y
    gS = jnp.dot(A.T, R, preferred_element_type=jnp.float32)
    M1 = (1.0 - b1_t) * gS + b1_t * M
    V1 = (1.0 - b2) * (gS * gS) + b2 * V
    Phi = M1 * bc1
    Psi = jnp.sqrt(V1 * bc2) + eps
    Psi_safe = jnp.maximum(Psi, jnp.finfo(jnp.float32).tiny)
    S1 = jnp.maximum(S - alpha * (Phi / Psi_safe), 0.0)

    @pl.when(j == 0)
    def _():
        gA_ref[:] = jnp.zeros_like(gA_ref)
        rowsum_ref[:] = jnp.zeros_like(rowsum_ref)
        stats_ref[0] = jnp.float32(0.0)
        stats_ref[1] = jnp.float32(0.0)
        stats_ref[2] = jnp.float32(0.0)

    if layout == "smv":
        SMVn_ref[0:Kp, :] = S1
        SMVn_ref[Kp:2 * Kp, :] = M1
        SMVn_ref[2 * Kp:3 * Kp, :] = V1
    else:
        Sn_ref[:] = S1
        MVn_ref[0:Kp, :] = M1.astype(MVn_ref.dtype)
        MVn_ref[Kp:2 * Kp, :] = V1.astype(MVn_ref.dtype)
    gA_ref[:] += jnp.dot(R, S.T, preferred_element_type=jnp.float32)
    rowsum_ref[:] += jnp.sum(S1, axis=1, keepdims=True)
    stats_ref[0] += jnp.sum(R * R) / 2
    dS = S1 - S
    stats_ref[1] += jnp.sum(dS * dS)
    stats_ref[2] += jnp.sum(S1 * S1)


def packed_step(A, SMV_or_S, Y, alpha, scalars, MV=None, b2=0.999,
                eps=1e-8, tile_n=8192, interpret=None):
    """Dispatch the packed kernel; MV=None -> 'smv' f32 layout."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    Cp, Kp = A.shape
    layout = "smv" if MV is None else "mv"
    Np = SMV_or_S.shape[1]
    grid = (Np // tile_n,)
    rows = 3 * Kp if layout == "smv" else Kp

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((Kp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, tile_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [jnp.zeros(3, jnp.int32), scalars, alpha, A, SMV_or_S]
    out_specs = [
        pl.BlockSpec((Cp, Kp), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((Cp, Kp), jnp.float32)]
    if layout == "mv":
        in_specs.append(pl.BlockSpec((2 * Kp, tile_n), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(MV)
        out_specs.append(pl.BlockSpec((Kp, tile_n), lambda j: (0, j),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Kp, Np), jnp.float32))
        out_specs.append(pl.BlockSpec((2 * Kp, tile_n), lambda j: (0, j),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((2 * Kp, Np), MV.dtype))
    else:
        out_specs.append(pl.BlockSpec((3 * Kp, tile_n), lambda j: (0, j),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((3 * Kp, Np), jnp.float32))
    in_specs.append(pl.BlockSpec((Cp, tile_n), lambda j: (0, j),
                                 memory_space=pltpu.VMEM))
    inputs.append(Y)
    # reorder: Y belongs before outputs in the positional refs
    inputs = inputs[:5] + ([inputs[5]] if layout == "mv" else []) + \
        [inputs[-1]]
    out_specs += [
        pl.BlockSpec((Kp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((Kp, 1), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
    ]

    kernel = functools.partial(_packed_kernel, b2=b2, eps=eps, Kp=Kp,
                               layout=layout)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(*inputs)


def build_loops(Cp, Kp, Np, tile_n):
    """Jitted n-iteration S-side loops for all four variants."""
    scalars = jnp.asarray([0.9, 1.2, 1.3], jnp.float32)

    @jax.jit
    def base(A, S, M, V, Y, alpha, n):
        def body(_, carry):
            S, M, V = carry
            gA, S1, M1, V1, rs, *_ = fused_nmf_adaprox_step(
                A, S, M, V, Y, alpha, scalars, tile_n=tile_n,
                prox_S=None)
            return (S1, M1, V1)
        S, M, V = jax.lax.fori_loop(0, n, body, (S, M, V))
        return S[0, :8], M[0, :8], V[0, :8]

    @jax.jit
    def packed_smv(A, SMV, Y, alpha, n):
        def body(_, SMV):
            gA, SMV1, rs, st = packed_step(A, SMV, Y, alpha, scalars,
                                           tile_n=tile_n)
            return SMV1
        SMV = jax.lax.fori_loop(0, n, body, SMV)
        return SMV[0, :8]

    @jax.jit
    def packed_mv(A, S, MV, Y, alpha, n):
        def body(_, carry):
            S, MV = carry
            gA, S1, MV1, rs, st = packed_step(A, S, Y, alpha, scalars,
                                              MV=MV, tile_n=tile_n)
            return (S1, MV1)
        S, MV = jax.lax.fori_loop(0, n, body, (S, MV))
        return S[0, :8], MV[0, :8]

    return base, packed_smv, packed_mv


def marginal(fn, lo, hi, reps):
    """Independent-minima lo/hi marginal per-iteration seconds."""
    tlo, thi = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(lo))
        tlo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(fn(hi))
        thi.append(time.perf_counter() - t0)
    return (min(thi) - min(tlo)) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="single-step parity of packed vs base kernels")
    ap.add_argument("--C", type=int, default=5)
    ap.add_argument("--K", type=int, default=7)
    ap.add_argument("--N", type=int, default=1_000_000)
    args = ap.parse_args()

    tile_n = 8192
    Cp = _round_up(max(args.C, _SUBLANE), _SUBLANE)
    Kp = _round_up(max(args.K, _SUBLANE), _SUBLANE)
    Np = _round_up(args.N, tile_n)
    rng = np.random.default_rng(0)

    A = jnp.asarray(rng.random((Cp, Kp)), jnp.float32)
    S = jnp.asarray(rng.random((Kp, Np)), jnp.float32)
    Y = jnp.asarray(rng.random((Cp, Np)), jnp.float32)
    alpha = jnp.full((Kp, 1), 0.01, jnp.float32)
    M0 = jnp.zeros((Kp, Np), jnp.float32)
    V0 = jnp.zeros((Kp, Np), jnp.float32)

    if args.check:
        scalars = jnp.asarray([0.9, 1.2, 1.3], jnp.float32)
        M = jnp.asarray(rng.random((Kp, Np)), jnp.float32) * 0.1
        V = jnp.asarray(rng.random((Kp, Np)), jnp.float32) * 0.1
        gA0, S1b, M1b, V1b, rs0, *_ = fused_nmf_adaprox_step(
            A, S, M, V, Y, alpha, scalars, tile_n=tile_n, prox_S=None)
        gA1, SMV1, rs1, _ = packed_step(
            A, jnp.concatenate([S, M, V], axis=0), Y, alpha, scalars,
            tile_n=tile_n)
        np.testing.assert_allclose(np.asarray(SMV1[:Kp]),
                                   np.asarray(S1b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(SMV1[Kp:2 * Kp]),
                                   np.asarray(M1b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(SMV1[2 * Kp:]),
                                   np.asarray(V1b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gA1), np.asarray(gA0),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rs1), np.asarray(rs0),
                                   rtol=1e-5)
        Mb, Vb = M.astype(jnp.bfloat16), V.astype(jnp.bfloat16)
        gA2, S1c, M1c, V1c, rs2, *_ = fused_nmf_adaprox_step(
            A, S, Mb, Vb, Y, alpha, scalars, tile_n=tile_n, prox_S=None)
        gA3, S1d, MV1d, rs3, _ = packed_step(
            A, S, Y, alpha, scalars,
            MV=jnp.concatenate([Mb, Vb], axis=0), tile_n=tile_n)
        np.testing.assert_allclose(np.asarray(S1d), np.asarray(S1c),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(MV1d[:Kp]).astype(np.float32),
            np.asarray(M1c).astype(np.float32), atol=1e-6)
        print("CHECK-PASS")
        return

    base, packed_smv, packed_mv = build_loops(Cp, Kp, Np, tile_n)

    lo, hi, reps = (5, 25, 2) if args.quick else (50, 250, 4)
    out = {"shape": [args.C, args.K, args.N], "tile_n": tile_n,
           "protocol": f"marginal lo={lo} hi={hi} reps={reps}"}

    variants = {
        "base_f32": lambda n: base(A, S, M0, V0, Y, alpha, n),
        "packed_f32_smv": lambda n: packed_smv(
            A, jnp.concatenate([S, M0, V0], axis=0), Y, alpha, n),
        "base_bf16m": lambda n: base(A, S, M0.astype(jnp.bfloat16),
                                     V0.astype(jnp.bfloat16), Y, alpha,
                                     n),
        "packed_bf16m_mv": lambda n: packed_mv(
            A, S,
            jnp.concatenate([M0, V0], axis=0).astype(jnp.bfloat16),
            Y, alpha, n),
    }
    for name, fn in variants.items():
        jax.device_get(fn(2))  # compile
        ms = marginal(fn, lo, hi, reps) * 1e3
        out[name + "_ms_per_iter"] = round(ms, 4)
        print(f"{name:18s} {ms:.4f} ms/iter", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
