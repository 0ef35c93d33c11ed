"""Smoke tests: the shipped examples must run end-to-end (small sizes,
CPU backend). The heavier examples (astro_unmixing, unmixing,
image_tv at full size) are exercised manually / via their own unit
tests; these cover the ones cheap enough for every test run."""

import runpy
import sys

import pytest


@pytest.fixture
def argv(monkeypatch):
    def set_argv(*args):
        monkeypatch.setattr(sys, "argv", list(args))
    return set_argv


def test_parabola_example(argv, capsys):
    argv("parabola.py")
    runpy.run_path("/root/repo/examples/parabola.py", run_name="__main__")
    out = capsys.readouterr().out
    # every solver line reports its distance to the analytic optimum
    assert "SDMM" in out and "FISTA" in out


def test_tv_denoise_example(argv, capsys):
    argv("tv_denoise.py", "4096")
    runpy.run_path("/root/repo/examples/tv_denoise.py",
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "RMSE" in out   # the script asserts the denoising itself


def test_batched_solves_example(argv, capsys):
    argv("batched_solves.py", "64")
    runpy.run_path("/root/repo/examples/batched_solves.py",
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "64 solves in one call" in out
    assert "match individual solves" in out


def test_learn_regularizer_example(argv, capsys):
    argv("learn_regularizer.py")
    runpy.run_path("/root/repo/examples/learn_regularizer.py",
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "learned wins" in out
