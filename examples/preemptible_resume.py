"""Preemptible-pod drill: checkpoint a long sharded solve, kill it,
resume exactly.

A weighted adaptive-stride NMF solve (the production configuration for
large problems) runs in ``--slice``-iteration slices; after each slice
the factors and the solver's exact-resume ``.state`` are checkpointed to
disk through ``proxmin_tpu.checkpoint``. The "preemption" then drops
every in-memory object; the continuation reloads the checkpoint on a
freshly-built mesh and finishes the solve. The drill verifies the
resumed trajectory is IDENTICAL to an uninterrupted reference solve —
including mid-stride kills, where the carried segment state (frozen
Lipschitz steps, adaptive refresh interval, segment boundary, sharded
power iterate) is what makes exactness possible.

The reference proxmin has no continuation at all: a restarted ``nmf``
re-derives steps and restarts its caches from scratch
(``/root/reference/proxmin/nmf.py:96-203``).

Works on real meshes and the virtual CPU mesh::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/preemptible_resume.py --cpu
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import tempfile

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp  # noqa: F401
    from proxmin_tpu.checkpoint import load_checkpoint, save_checkpoint
    from proxmin_tpu.nmf import nmf
    from proxmin_tpu.parallel import make_mesh

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    total = int(args[0]) if args else 60
    slice_iters = int(args[1]) if len(args) > 1 else 23  # not a stride
    # multiple: every preemption lands mid-segment on purpose

    n_dev = jax.device_count()
    rng = np.random.default_rng(7)
    C, K, N = 8, 4, 4096 * n_dev
    A_true = rng.random((C, K)).astype(np.float32)
    S_true = rng.random((K, N)).astype(np.float32)
    Y = (A_true @ S_true
         + 0.01 * rng.standard_normal((C, N))).astype(np.float32)
    W = (0.5 + rng.random((C, N))).astype(np.float32)
    A0 = rng.random((C, K)).astype(np.float32)
    S0 = rng.random((K, N)).astype(np.float32)

    kw = dict(W=W, e_rel=0.0, step_adapt=True)

    # --- uninterrupted reference run ------------------------------------
    mesh = make_mesh()
    ref = nmf(Y, A0.copy(), S0.copy(), mesh=mesh, max_iter=total, **kw)
    print(f"uninterrupted: {total} iters, loss {ref.loss:.6f}")

    # --- preempted run: solve in slices, checkpoint, drop everything ----
    ckpt_dir = tempfile.mkdtemp(prefix="preempt_")
    path = None
    done = 0
    while done < total:
        mesh = make_mesh()  # each slice: a "new pod", rebuilt mesh
        if path is None:
            a, s, state = A0.copy(), S0.copy(), None
        else:
            ckpt = load_checkpoint(path, use_orbax=False)
            a, s = ckpt["x"][0], ckpt["x"][1]
            state = ckpt["solver_state"]
        n = min(slice_iters, total - done)
        res = nmf(Y, a, s, mesh=mesh, max_iter=n,
                  **({} if state is None else {"state": state}), **kw)
        done += res.iterations
        path = save_checkpoint(
            _os.path.join(ckpt_dir, f"ckpt_{done:04d}"),
            x=[np.asarray(x) for x in res.x],
            solver_state=res.state, use_orbax=False)
        print(f"  slice -> it {done} (seg_end "
              f"{int(res.state['seg_end'])}, stride "
              f"{int(res.state['stride'])}) checkpointed")
        del res, a, s, state, mesh  # the preemption

    final = load_checkpoint(path, use_orbax=False)
    dA = float(np.max(np.abs(final["x"][0] - np.asarray(ref.x[0]))))
    dS = float(np.max(np.abs(final["x"][1] - np.asarray(ref.x[1]))))
    print(f"max |resumed - uninterrupted|: A {dA:.3g}, S {dS:.3g}")
    assert dA == 0.0 and dS == 0.0, "resume drifted!"
    print("exact: preempted trajectory == uninterrupted trajectory")


if __name__ == "__main__":
    main()
