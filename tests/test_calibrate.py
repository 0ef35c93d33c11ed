"""Runtime engine-calibration tests (VERDICT r4 #2).

The static routing cliffs are v5e-session constants; inside the gray
zone around them ``engine='auto'`` probes ~20 marginal iterations of
each eligible engine once per (device kind, shape, policy) and caches
the winner. These tests drive the decision machinery with fake probes
and timers (both outcomes), verify the cache layers and failure
fallback, and check the nmf() integration end-to-end on CPU.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

import proxmin_tpu as pt
from proxmin_tpu import calibrate


@pytest.fixture(autouse=True)
def _fresh_calibration(tmp_path, monkeypatch):
    monkeypatch.setenv("PROXMIN_TPU_AUTOTUNE_CACHE",
                       str(tmp_path / "routing.json"))
    calibrate._CACHE.clear()
    calibrate._DISK = {}
    calibrate._DISK_LOADED = False
    prev = calibrate.set_auto_calibration("on")
    yield
    calibrate.set_auto_calibration(prev)
    calibrate._CACHE.clear()
    calibrate._DISK = {}
    calibrate._DISK_LOADED = False


def _fake_probes(ms_per_iter, calls):
    """Probe callables whose fake 'runtime' is iters * ms_per_iter,
    delivered through an injected timer."""
    clock = {"t": 0.0}

    def timer():
        return clock["t"]

    probes = {}
    for name, ms in ms_per_iter.items():
        def probe(n, _ms=ms, _name=name):
            calls.append((_name, n))
            clock["t"] += n * _ms * 1e-3
        probes[name] = probe
    return probes, timer


@pytest.mark.parametrize("faster", ["xla", "pallas"])
def test_measured_choice_picks_faster_engine(faster):
    slower = "pallas" if faster == "xla" else "xla"
    calls = []
    probes, timer = _fake_probes({faster: 0.1, slower: 0.2}, calls)
    got = calibrate.measured_choice(("k", 1), probes, fallback=slower,
                                    _timer=timer)
    assert got == faster
    # compile warmup + 2 reps of each of the two iteration counts
    assert {c[0] for c in calls} == {"xla", "pallas"}


def test_measured_choice_caches_in_process():
    calls = []
    probes, timer = _fake_probes({"xla": 0.1, "pallas": 0.2}, calls)
    key = ("kind", 5, 7, 1000)
    assert calibrate.measured_choice(key, probes, "pallas",
                                     _timer=timer) == "xla"
    n = len(calls)
    assert calibrate.measured_choice(key, probes, "pallas",
                                     _timer=timer) == "xla"
    assert len(calls) == n  # no re-probe


def test_measured_choice_disk_roundtrip():
    calls = []
    probes, timer = _fake_probes({"xla": 0.3, "pallas": 0.1}, calls)
    key = ("v5e", 5, 7, 1000, True)
    assert calibrate.measured_choice(key, probes, "xla",
                                     _timer=timer) == "pallas"
    # a fresh process: in-memory caches dropped, disk survives
    calibrate._CACHE.clear()
    calibrate._DISK = {}
    calibrate._DISK_LOADED = False
    n = len(calls)
    assert calibrate.measured_choice(key, probes, "xla",
                                     _timer=timer) == "pallas"
    assert len(calls) == n  # served from disk, no probes


def test_measured_choice_near_tie_keeps_static_fallback():
    """Marginals within NEAR_TIE must not overrule the static tables —
    pool noise (and probes that converge inside their budget, which
    shorten both engines identically) land here by construction."""
    calls = []
    probes, timer = _fake_probes({"xla": 0.100, "pallas": 0.098}, calls)
    got = calibrate.measured_choice(("tie",), probes, fallback="xla",
                                    _timer=timer)
    assert got == "xla"  # pallas 'won' by 2% — inside the tie band
    calls2 = []
    probes2, timer2 = _fake_probes({"xla": 0.100, "pallas": 0.098},
                                   calls2)
    got2 = calibrate.measured_choice(("tie2",), probes2,
                                     fallback="pallas", _timer=timer2)
    assert got2 == "pallas"


def test_mode_off_uses_fallback_without_probing():
    calls = []
    probes, timer = _fake_probes({"xla": 0.1, "pallas": 0.2}, calls)
    calibrate.set_auto_calibration("off")
    assert calibrate.measured_choice(("k",), probes, "pallas",
                                     _timer=timer) == "pallas"
    assert not calls


def test_probe_failure_falls_back_to_static():
    def bad(n):
        raise RuntimeError("backend fell over")

    got = calibrate.measured_choice(("k2",), {"xla": bad, "pallas": bad},
                                    "xla")
    assert got == "xla"
    # failure decision is cached: no repeated probe storms
    got2 = calibrate.measured_choice(("k2",), {"xla": bad, "pallas": bad},
                                     "xla")
    assert got2 == "xla"


def test_set_auto_calibration_validates():
    with pytest.raises(ValueError):
        calibrate.set_auto_calibration("sometimes")


def test_gray_zone_covers_measured_boundaries():
    # flagship weighted shape sits just past the 90 MB cliff
    assert calibrate.in_gray_zone(5, 7, 1_000_000, True, True)
    # tiny problems are far below every cliff
    assert not calibrate.in_gray_zone(5, 7, 1_000, True, True)
    assert not calibrate.in_gray_zone(8, 4, 1_000, False, False)
    # the channel cliff (C >= 64) has an octave of slack each side
    assert calibrate.in_gray_zone(32, 4, 256, False, False)
    assert calibrate.in_gray_zone(127, 4, 256, False, False)
    assert not calibrate.in_gray_zone(128, 4, 256, False, False)
    # unweighted stream cliff at 200 MB
    assert calibrate.in_gray_zone(16, 8, 1_600_000, False, False)
    assert not calibrate.in_gray_zone(16, 8, 10_000, False, False)


def test_nmf_auto_probes_in_gray_zone(monkeypatch):
    """nmf(engine='auto') consults measured_choice for gray-zone shapes
    with both engine probes, and the probes run the REAL engines (the
    compiled executables the chosen solve then reuses)."""
    seen = {}

    real = calibrate.measured_choice

    def spy(key, probes, fallback, **kw):
        seen["key"] = key
        seen["engines"] = sorted(probes)
        # exercise the real machinery with the real probes (CPU: runs
        # short interpret-mode solves)
        return real(key, probes, fallback, **kw)

    monkeypatch.setattr(calibrate, "measured_choice", spy)
    rng = np.random.default_rng(0)
    C, K, N = 32, 4, 256  # inside the channel-cliff gray zone
    Y = jnp.asarray(rng.random((C, N)).astype(np.float32))
    A = jnp.asarray(rng.random((C, K)).astype(np.float32))
    S = jnp.asarray(rng.random((K, N)).astype(np.float32))
    res = pt.nmf.nmf(Y, A, S, engine="auto", e_rel=0, max_iter=3)
    assert res.iterations == 3
    assert seen["engines"] == ["pallas", "xla"]
    kind, C_, K_, N_, weighted = seen["key"][:5]
    assert (C_, K_, N_, weighted) == (C, K, N, False)


def test_nmf_auto_skips_probe_far_from_cliffs(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("should not probe far from the cliffs")

    monkeypatch.setattr(calibrate, "measured_choice", boom)
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.random((8, 128)).astype(np.float32))
    A = jnp.asarray(rng.random((8, 3)).astype(np.float32))
    S = jnp.asarray(rng.random((3, 128)).astype(np.float32))
    res = pt.nmf.nmf(Y, A, S, engine="auto", e_rel=0, max_iter=2)
    assert res.iterations == 2


def test_nmf_auto_respects_calibrated_winner(monkeypatch):
    """Both decision outcomes reach the real engines end-to-end."""
    rng = np.random.default_rng(0)
    C, K, N = 32, 4, 256
    Y = jnp.asarray(rng.random((C, N)).astype(np.float32))
    A = jnp.asarray(rng.random((C, K)).astype(np.float32))
    S = jnp.asarray(rng.random((K, N)).astype(np.float32))
    for forced in ("xla", "pallas"):
        monkeypatch.setattr(calibrate, "measured_choice",
                            lambda key, probes, fallback, **kw: forced)
        res = pt.nmf.nmf(Y, A, S, engine="auto", e_rel=0, max_iter=2)
        assert res.iterations == 2
        assert np.isfinite(np.asarray(res.x[0])).all()
