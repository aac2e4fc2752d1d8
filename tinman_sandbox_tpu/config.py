"""Typed run configuration.

Replaces the reference's three config mechanisms — compile-time config.h dims
(/root/reference/compute_and_apply_rhs_test/config.h.in:1-7), CMake cache
options, and CLI flags (cxx/basic/main.cpp:36-91, fortran/main.F90:15-20) —
with one dataclass. Static shape fields feed jit as compile-time constants.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

NP = 4                    # GLL points per element edge (config.h.in NP)
NPSQ = NP * NP
NUM_TIME_LEVELS = 3       # leapfrog: nm1 / n0 / np1 (config.h.in NUM_TIME_LEVELS)
QDP_TIME_LEVELS = 2       # tracer-mass time levels


@dataclasses.dataclass(frozen=True)
class Config:
    """Problem + run configuration (all shape-determining fields are static)."""

    # -- dimensions (reference kinds.F90:13-27) --
    nlev: int = 72                    # vertical levels (PLEV)
    qsize: int = 1                    # number of tracers (QSIZE_D)
    nelem: int = 3                    # total elements (nelemd default, kinds.F90:21)
    ne: Optional[int] = None          # cubed-sphere resolution; nelem = 6*ne*ne if set

    # -- time integration --
    dt: float = 600.0                 # full timestep seconds (kokkos_init.cpp:97)
    rsplit: int = 1                   # >0: vertically-Lagrangian (no vertical advection)
    nsteps: int = 1

    # -- time-level indices (0-based; reference kinds.F90:23-26 are 1-based) --
    n0: int = 0
    np1: int = 1
    nm1: int = 2
    qn0: int = 0

    # -- numerics --
    dtype: str = "float32"            # fast-path dtype
    oracle_dtype: str = "float64"     # reference/oracle dtype

    # -- backend/dispatch --
    use_pallas: bool = True           # fused Pallas kernels where available
    elem_block: int = 8              # elements per Pallas block (8*16 GLL = 128 sublanes)

    # -- distribution --
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axis_names: Tuple[str, ...] = ("e",)

    def __post_init__(self):
        if self.ne is not None:
            object.__setattr__(self, "nelem", 6 * self.ne * self.ne)

    @property
    def nlevp(self) -> int:
        return self.nlev + 1

    @property
    def npoints(self) -> int:
        """Total grid points = elements x levels x GLL (the benchmark metric)."""
        return self.nelem * self.nlev * NPSQ
