"""Solver drivers: jit-compiled ``lax.while_loop`` iteration engines."""

from .pgm import pgm  # noqa: F401
from .adaprox import adaprox  # noqa: F401
from .admm import admm, sdmm  # noqa: F401
from .bsdmm import bsdmm  # noqa: F401

__all__ = ["pgm", "adaprox", "admm", "sdmm", "bsdmm"]
