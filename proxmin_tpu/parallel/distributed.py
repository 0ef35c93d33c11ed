"""Multi-process (multi-host) bring-up.

A TPU pod slice spans multiple hosts, each seeing only its local chips;
JAX's runtime links them into one global device set via
``jax.distributed.initialize``. This module wraps that bring-up with the
conventions the rest of :mod:`proxmin_tpu.parallel` assumes (global
meshes from ``jax.devices()``, pixel-axis sharding) and makes it
idempotent, so library code and user scripts can call it unconditionally.

The reference is single-process only (SURVEY.md §5: no distributed
communication of any kind); this is new TPU-native surface. See
``docs/SERVING.md`` ("Multi-process / multi-host meshes") for the full
recipe including per-process data loading.
"""

from typing import NamedTuple

__all__ = ["initialize_distributed", "DistributedInfo"]


class DistributedInfo(NamedTuple):
    """Summary of the process's place in the global runtime."""

    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Initialize JAX's multi-process runtime (idempotent).

    On TPU pods (and most managed environments: GKE, SLURM) all
    arguments auto-detect from the environment — call with none. For
    manual bring-up pass ``coordinator_address`` (``"host:port"`` of
    process 0), ``num_processes`` and this process's ``process_id``
    (reference: none — the reference is single-process NumPy).

    After initialization, ``jax.devices()`` returns the GLOBAL device
    set, so :func:`~proxmin_tpu.parallel.make_mesh` builds pod-wide
    meshes unchanged; give the mesh a leading ``"dcn"`` axis across
    slices and pass ``data_axis=("dcn", "data")`` to
    :func:`~proxmin_tpu.parallel.shard_nmf_problem` for the standard
    multi-slice layout (pixel shards split across slices first, ICI
    within a slice second).

    Safe to call when already initialized, and a no-op single-process
    fallback when nothing to connect to is configured (no arguments and
    no recognized environment): returns the current process layout
    either way.

    Returns:
        :class:`DistributedInfo` with the process index/count and
        device counts.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids

    def _client_up():
        """Structural initialized-probe: a live distributed client."""
        try:
            from jax._src.distributed import global_state as _gs
            return getattr(_gs, "client", None) is not None
        except ImportError:  # private-module layout changed
            return False

    if not _client_up():
        try:
            jax.distributed.initialize(**kwargs)
        except (ValueError, RuntimeError) as e:
            # benign cases, checked structurally first: (a) a client
            # exists NOW — a raced/previous initialize won; proceed.
            # (b) NOTHING is configured in a single-process run
            # (auto-detect found no coordinator) — fall back to the
            # local backend. Everything else re-raises, including
            # bring-up FAILURES on an env-configured cluster
            # (coordinator timeout, unreachable host): swallowing those
            # would silently degrade a pod job to per-host
            # single-process solves with no error anywhere.
            #
            # Case (b) has no public structural probe, so it falls back
            # to matching jax's wording (verified on jax 0.4.35–0.9.0:
            # "coordinator_address should be defined" from initialize()
            # auto-detect, "must be called before" when a local backend
            # already started). A rewording would turn a plain
            # single-process run into this raise — the test suite pins
            # the fallback behavior (tests/test_distributed.py).
            msg = str(e).lower()
            benign = (
                _client_up()
                or "already initialized" in msg
                or (not kwargs and "coordinator_address" in msg
                    and "should be defined" in msg)
                # backend already up (e.g. an environment that imports
                # jax at startup) AND nothing configured to join: a
                # single-process run. With explicit kwargs the user
                # meant to join a cluster — re-raise so the ordering
                # error is not silently ignored.
                or (not kwargs and "must be called before" in msg)
            )
            if not benign:
                raise

    return DistributedInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )
