"""proxmin_tpu — TPU-native proximal-splitting optimization framework.

A ground-up JAX/XLA re-design with the capabilities of the reference
``proxmin`` package (proximal splitting algorithms for constrained, possibly
non-convex optimization, plus constrained matrix factorization): solvers are
jit-compiled ``lax.while_loop`` drivers with on-device convergence tests,
proximal operators are pure functions (with Pallas kernels for the hot
paths), and the NMF/CMF application layer shards its pixel axis over a
``jax.sharding.Mesh`` with XLA collectives for the factor-gradient
reductions.

Top-level surface mirrors the reference (``/root/reference/proxmin/
__init__.py``): solvers and operators are re-exported flat; ``nmf`` and
``utils`` are submodules.
"""

from .algorithms import *  # noqa: F401,F403
from .operators import *  # noqa: F401,F403
from . import nmf  # noqa: F401
from . import utils  # noqa: F401
from . import operators  # noqa: F401
from . import algorithms  # noqa: F401
from . import linop  # noqa: F401
from . import special  # noqa: F401

__version__ = "0.1.0"
