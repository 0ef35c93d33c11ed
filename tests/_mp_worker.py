import sys
import jax
jax.config.update("jax_platforms", "cpu")
from proxmin_tpu.parallel import initialize_distributed, make_mesh

addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
info = initialize_distributed(coordinator_address=addr,
                              num_processes=nproc, process_id=pid)
assert info.process_count == nproc, info
assert info.global_device_count == nproc, info

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()  # all global devices, 1-D ('data',)
assert mesh.devices.size == nproc

# one global psum over the mesh: each process contributes its shard
local = np.full((4,), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local)

@jax.jit
def total(x):
    return jnp.sum(x)

out = float(total(garr))
expect = 4.0 * sum(range(1, nproc + 1))
assert out == expect, (out, expect)
print(f"proc {pid}: global sum {out} OK", flush=True)

# an actual sharded PGM-NMF training step across the process group:
# Y/S shard over pixels (each process holds its local pixel block), A
# replicated; the grad_A contraction psums across processes
from proxmin_tpu.parallel import make_nmf_pgm_step

C, K, N_local = 4, 3, 16
rng = np.random.default_rng(7)           # same seed: replicated A
A = rng.random((C, K)).astype(np.float32)
S_local = np.random.default_rng(100 + pid).random((K, N_local)).astype(np.float32)
Y_local = np.random.default_rng(200 + pid).random((C, N_local)).astype(np.float32)

Yg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, "data")), Y_local)
Sg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, "data")), S_local)
Ag = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P(None, None)))

step = make_nmf_pgm_step(mesh)
A1, S1, loss = step(Ag, Sg, Yg, None)
jax.block_until_ready((A1, S1, loss))
assert np.isfinite(float(loss))
assert A1.shape == (C, K) and S1.shape == (K, N_local * nproc)
print(f"proc {pid}: sharded NMF step loss {float(loss):.4f} OK", flush=True)

# the WHOLE-SOLVE explicit-collective path across the process group:
# nmf_pgm_sharded on the 2-process mesh must match a process-local
# single-device solve of the reconstructed global problem (f32
# reduction-order tolerance)
from proxmin_tpu.parallel import nmf_pgm_sharded

Y_blocks = [np.random.default_rng(200 + p).random((C, N_local)).astype(np.float32)
            for p in range(nproc)]
S_blocks = [np.random.default_rng(100 + p).random((K, N_local)).astype(np.float32)
            for p in range(nproc)]
Y_global = np.concatenate(Y_blocks, axis=1)
S_global = np.concatenate(S_blocks, axis=1)

res = nmf_pgm_sharded(Yg, Ag, Sg, mesh=mesh, e_rel=0.0, max_iter=10)
A_dist = np.asarray(res.x[0])  # replicated -> addressable everywhere

from proxmin_tpu.nmf import nmf
local = nmf(jnp.asarray(Y_global), jnp.asarray(A),
            jnp.asarray(S_global), e_rel=0.0, max_iter=10)
A_local = np.asarray(local.x[0])
np.testing.assert_allclose(A_dist, A_local, rtol=2e-5, atol=2e-6)
assert res.iterations == 10
print(f"proc {pid}: whole-solve sharded nmf matches local "
      f"(loss {res.loss:.5f}) OK", flush=True)

# REAL multi-process checkpoint/resume: every process participates in an
# orbax save of the sharded whole-solve state (pixel-sharded power
# iterate included), restores it with sharded targets, and the resumed
# solve matches the uninterrupted one exactly
if len(sys.argv) > 4:
    ckpt_dir = sys.argv[4]
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint

    Wg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, "data")),
        (0.5 + np.random.default_rng(300 + pid).random(
            (C, N_local)).astype(np.float32)))
    full = nmf_pgm_sharded(Yg, Ag, Sg, W=Wg, mesh=mesh, e_rel=0.0,
                           max_iter=24, step_adapt=True)
    half = nmf_pgm_sharded(Yg, Ag, Sg, W=Wg, mesh=mesh, e_rel=0.0,
                           max_iter=11, step_adapt=True)
    path = save_checkpoint(ckpt_dir + "/pod_state",
                           solver_state=half.state, use_orbax=True)
    ck = load_checkpoint(path, like={"solver_state": half.state},
                         use_orbax=True)
    res = nmf_pgm_sharded(
        Yg, half.x[0], half.x[1], W=Wg, mesh=mesh, e_rel=0.0,
        max_iter=13, step_adapt=True, state=ck["solver_state"])
    A_res = np.asarray(res.x[0])
    A_full = np.asarray(full.x[0])
    np.testing.assert_array_equal(A_res, A_full)
    print(f"proc {pid}: multi-process orbax checkpoint resume exact OK",
          flush=True)
