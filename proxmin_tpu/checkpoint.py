"""Checkpoint / resume for solver state.

The reference's only continuation mechanism is AdaProx warm start via the
``M``/``V``/``Vhat`` moment arrays plus the caller's own ``X``
(``algorithms.py:262-264,347-359``) — no serialization anywhere. Here every
solver's resumable state is a pytree of arrays, so checkpointing is generic:

* :func:`save_checkpoint` / :func:`load_checkpoint` persist any pytree of
  arrays. Orbax is used when available (async, multi-host-safe, the
  TPU-native choice); otherwise a pickle fallback (``.pkl``) keeps the
  feature dependency-free.
* For AdaProx, ``save_checkpoint(path, x=res.x, M=res.M, V=res.V,
  Vhat=res.Vhat)`` then ``adaprox(ckpt["x"], ..., M=ckpt["M"], ...)``
  resumes exactly like the reference's warm start.
"""

import os

import numpy as np
import jax

__all__ = ["save_checkpoint", "load_checkpoint"]


def _try_orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except Exception:
        return None


def save_checkpoint(path, tree=None, *, use_orbax=None, **named):
    """Persist a pytree (or keyword arrays) of solver state.

    ``path``: directory (orbax) or file path (pickle fallback; ``.pkl``
    appended if missing). Pass either a single ``tree`` or keyword
    entries; they merge into one dict pytree. Returns the path actually
    written.
    """
    state = dict(named)
    if tree is not None:
        state["__tree__"] = tree
    if use_orbax is None:
        use_orbax = _try_orbax() is not None
    state = jax.tree_util.tree_map(np.asarray, state)

    if use_orbax:
        ocp = _try_orbax()
        if ocp is None:
            raise RuntimeError("orbax requested but not importable")
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return path

    import pickle
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    with open(path, "wb") as fh:
        pickle.dump(state, fh)
    return path


def load_checkpoint(path, like=None, *, use_orbax=None):
    """Load a checkpoint saved by :func:`save_checkpoint`.

    For orbax checkpoints of nontrivial pytrees, pass ``like=`` an example
    pytree (shapes/dtypes) when restoring across processes.
    Returns the dict pytree; a bare ``tree`` argument round-trips under the
    ``"__tree__"`` key.
    """
    if use_orbax is None:
        use_orbax = _try_orbax() is not None and os.path.isdir(path)

    if use_orbax:
        ocp = _try_orbax()
        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            like = jax.tree_util.tree_map(np.asarray, like)
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))

    import pickle
    if not path.endswith(".pkl"):
        path = path + ".pkl"
    with open(path, "rb") as fh:
        return pickle.load(fh)
