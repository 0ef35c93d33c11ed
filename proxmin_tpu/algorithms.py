"""Solver API — mirrors the reference ``proxmin/algorithms.py`` surface.

The five iterative drivers (``pgm``, ``adaprox``, ``admm``, ``sdmm``,
``bsdmm``) live in ``proxmin_tpu.solvers`` as jit-compiled
``lax.while_loop`` engines; this module re-exports them under the
reference's flat namespace.
"""

from .solvers.pgm import pgm  # noqa: F401
from .solvers.adaprox import adaprox  # noqa: F401
from .solvers.admm import admm, sdmm  # noqa: F401
from .solvers.bsdmm import bsdmm  # noqa: F401

__all__ = ["pgm", "adaprox", "admm", "sdmm", "bsdmm"]
