"""tinman_sandbox_tpu — a TPU-native spectral-element dynamical-core framework.

A from-scratch JAX/Pallas re-design of the capabilities of
E3SM-Project/tinman_sandbox (the HOMME compute_and_apply_rhs performance
sandbox): batched GLL sphere operators, cumulative-sum vertical recurrences,
a fused Pallas CAAR kernel, RK time loop with tracer advection, cubed-sphere
domain decomposition with DSS halo exchange over a TPU mesh, plus the
profiling/benchmark harness.
"""

from .config import NP, NPSQ, NUM_TIME_LEVELS, Config
from .constants import CONSTANTS, PhysicalConstants
from .grid import (
    Geometry,
    HybridVCoord,
    analytic_geometry,
    analytic_hvcoord,
    dvv_matrix,
    random_geometry,
)
from .state import Derived, State, analytic_derived, analytic_state, random_state, zero_derived

__version__ = "0.1.0"

__all__ = [
    "NP",
    "NPSQ",
    "NUM_TIME_LEVELS",
    "Config",
    "CONSTANTS",
    "PhysicalConstants",
    "Geometry",
    "HybridVCoord",
    "analytic_geometry",
    "analytic_hvcoord",
    "dvv_matrix",
    "random_geometry",
    "Derived",
    "State",
    "analytic_derived",
    "analytic_state",
    "random_state",
    "zero_derived",
]
