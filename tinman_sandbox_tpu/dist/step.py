"""Distributed timestep: CAAR + DSS assembly of the updated fields.

Full-HOMME semantics: the CAAR apply writes spheremp-weighted updates
(routine_mod.F90:182-190); the boundary exchange then sums shared dofs and
multiplies by rspheremp. Here that is caar_xla followed by dss_scaled on the
np1 prognostic fields — one jitted function that runs identically on a
single device and element-sharded over a mesh.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax

from ..config import Config
from ..grid import Geometry, HybridVCoord
from ..kernels.caar_xla import caar_xla
from ..state import Derived, State
from .dss import dss_scaled

__all__ = ["caar_dss_step"]


@partial(jax.jit, static_argnames=("cfg", "ndof", "moist"))
def caar_dss_step(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    gdof,
    ndof: int,
    cfg: Config,
    dt2,
    eta_ave_w,
    moist: bool = True,
):
    """One CAAR evaluation + DSS assembly of u, v, T, dp3d at np1."""
    state, derived = caar_xla(
        state, derived, geom, hv, cfg, dt2, eta_ave_w, moist=moist
    )
    assemble = lambda x: dss_scaled(x, gdof, ndof, geom.rspheremp)
    return _assemble_np1(state, cfg, assemble), derived


def _assemble_np1(state: State, cfg: Config, assemble):
    np1 = cfg.np1
    return dataclasses.replace(
        state,
        u=state.u.at[np1].set(assemble(state.u[np1])),
        v=state.v.at[np1].set(assemble(state.v[np1])),
        t=state.t.at[np1].set(assemble(state.t[np1])),
        dp3d=state.dp3d.at[np1].set(assemble(state.dp3d[np1])),
    )


def caar_halo_step(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    plan,
    mesh,
    cfg: Config,
    dt2,
    eta_ave_w,
    moist: bool = True,
):
    """caar_dss_step with the explicit-collective halo DSS (dist/halo.py):
    per-shard local assembly + one psum of the partition-perimeter dofs."""
    from .halo import dss_scaled_halo

    state, derived = caar_xla(
        state, derived, geom, hv, cfg, dt2, eta_ave_w, moist=moist
    )
    assemble = lambda x: dss_scaled_halo(x, plan, mesh, geom.rspheremp)
    return _assemble_np1(state, cfg, assemble), derived


def caar_ppermute_step(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    plan,
    mesh,
    cfg: Config,
    dt2,
    eta_ave_w,
    moist: bool = True,
):
    """caar_dss_step with the neighbor-wise ppermute halo exchange
    (dist/halo_ppermute.py): per-shard assembly + point-to-point rounds."""
    from .halo_ppermute import dss_scaled_ppermute

    state, derived = caar_xla(
        state, derived, geom, hv, cfg, dt2, eta_ave_w, moist=moist
    )
    assemble = lambda x: dss_scaled_ppermute(x, plan, mesh, geom.rspheremp)
    return _assemble_np1(state, cfg, assemble), derived
