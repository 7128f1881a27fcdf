"""gdm — a TPU-native Galerkin Difference Method framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++/deal.II library peterrum/dealii-galerkin-difference-methods:
high-order GD discretizations on structured grids, cut-cell (CutFEM)
solvers with Nitsche boundary conditions and ghost-penalty stabilization,
explicit/implicit time stepping, and sharded multi-device execution.
"""

from . import basis, quadrature, ops1d, solvers  # noqa: F401
from .grid import Grid  # noqa: F401
from .constraints import Constraints  # noqa: F401

__version__ = "0.1.0"
