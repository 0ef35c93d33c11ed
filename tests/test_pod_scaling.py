"""CI smoke of the pod-scaling harness (VERDICT r3 item 4) on the
8-device virtual CPU mesh: the sweep runs, produces sane rows, and the
HLO-verified collective inventory matches the modeled per-iteration
volume (the same no-resharding property the collective-layout audit
pins)."""

import sys

import numpy as np

sys.path.insert(0, "benchmarks")


def test_pod_scaling_sweep_unweighted():
    from pod_scaling import modeled_comm_bytes_per_iter, run_scaling

    rows = run_scaling([1, 2, 8], C=4, K=3, N=4096, iters_lo=5,
                       iters_hi=15, reps=1, log=lambda *_: None)
    assert [r["devices"] for r in rows] == [1, 2, 8]
    for r in rows:
        # reps=1 marginals can come out <= 0 under host contention (a
        # slow lo sample); CI smokes the harness mechanics, not timing
        # quality — finiteness is the invariant
        assert np.isfinite(r["ms_per_iter"])
        assert r["modeled_comm_bytes_per_iter"] == \
            modeled_comm_bytes_per_iter(4, 3, False, 10)
        # no resharding collectives, and the all-reduce members match
        # the design table: grad_A (C*K), Gram (K*K), 3 scalars
        inv = r["hlo_collectives"]
        assert all(k.startswith("all-reduce") for k in inv)
        members = sorted(
            int(x) for k in inv
            for x in k[len("all-reduce["):-1].split(", "))
        assert members == [1, 1, 1, 3 * 3, 4 * 3]


def test_pod_scaling_sweep_weighted_two_level():
    from pod_scaling import run_scaling

    rows = run_scaling([2, 8], C=4, K=3, N=4096, iters_lo=5,
                       iters_hi=15, reps=1, weighted=True,
                       step_stride=5, two_level=True,
                       log=lambda *_: None)
    assert [r["devices"] for r in rows] == [2, 8]
    for r in rows:
        assert r["two_level"]
        inv = r["hlo_collectives"]
        assert all(k.startswith("all-reduce") for k in inv)
        # the weighted refresh's (C,K,K) Gram psum is present
        sizes = [int(x) for k in inv
                 for x in k[len("all-reduce["):-1].split(", ")]
        assert 4 * 3 * 3 in sizes
