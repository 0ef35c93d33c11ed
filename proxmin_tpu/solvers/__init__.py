"""Solver drivers: jit-compiled ``lax.while_loop`` iteration engines."""

from .pgm import pgm  # noqa: F401

__all__ = ["pgm"]
