"""Runge-Kutta time integration on the CAAR right-hand side.

The reference only repeats the fused evaluate+apply call (its "(86400/600)*5
RK stages" workload, kokkos_init.cpp:97-99, never implements the stage
algebra). Here the factored tendencies (kernels.caar_xla.caar_rhs) enable a
real scheme: strong-stability-preserving RK3 (Shu-Osher form)

    U1 = P(U0 + dt L(U0))
    U2 = P(3/4 U0 + 1/4 (U1 + dt L(U1)))
    U3 = P(1/3 U0 + 2/3 (U2 + dt L(U2)))

with P the continuous (DSS) projection after every stage when a dof map is
given (full-HOMME semantics), and the derived mean-flux accumulators
weighted by the scheme's effective quadrature b = (1/6, 1/6, 2/3).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..grid import Geometry, HybridVCoord
from ..kernels.caar_xla import caar_rhs
from ..state import Derived, State

__all__ = ["ssprk3_step"]

_B_WEIGHTS = (1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0)


def _project(fields, geom, gdof, ndof, rsp2=None):
    if gdof is None:
        return fields
    from ..dist.dss import dss_project

    rsp = rsp2 if rsp2 is not None else geom.rspheremp
    return tuple(
        dss_project(x, gdof, ndof, geom.spheremp, rsp)
        for x in fields
    )


@partial(jax.jit, static_argnames=("cfg", "ndof", "moist"))
def ssprk3_step(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    cfg: Config,
    dt,
    gdof=None,
    ndof: int = 0,
    moist: bool = True,
    rsp2=None,
):
    """One SSPRK3 step of (u, v, T, dp3d), written to time level np1.

    Tracers (qdp) are held fixed (advanced separately by the Euler step,
    matching the reference's split). ``rsp2`` is an optional two-float
    (hi, lo) rspheremp pair (dist.dss.rsp_2f) for bias-free projection.
    Returns (state, derived).
    """
    n0, np1, qn0 = cfg.n0, cfg.np1, cfg.qn0
    dt = jnp.asarray(dt, state.u.dtype)
    qdp_q = state.qdp[qn0, :, 0] if moist else None

    u0 = (state.u[n0], state.v[n0], state.t[n0], state.dp3d[n0])

    def rhs(fields):
        return caar_rhs(*fields, qdp_q, state.phis, derived.pecnd,
                        geom, hv, cfg, moist=moist)

    def axpy(a, x, b, y):
        return tuple(a * xi + b * yi for xi, yi in zip(x, y))

    acc = {"vdp1": 0.0, "vdp2": 0.0, "omega_p": 0.0, "eta": 0.0}
    phi_last = None

    def accumulate(diags, w):
        acc["vdp1"] = acc["vdp1"] + w * diags["vdp1"]
        acc["vdp2"] = acc["vdp2"] + w * diags["vdp2"]
        acc["omega_p"] = acc["omega_p"] + w * diags["omega_p"]
        acc["eta"] = acc["eta"] + w * diags["eta_dot_dpdn"]

    # stage 1
    t1 = rhs(u0)
    accumulate(t1[4], _B_WEIGHTS[0])
    u1 = _project(axpy(1.0, u0, dt, t1[:4]), geom, gdof, ndof, rsp2)
    # stage 2
    t2 = rhs(u1)
    accumulate(t2[4], _B_WEIGHTS[1])
    u2 = _project(
        axpy(0.75, u0, 0.25, axpy(1.0, u1, dt, t2[:4])), geom, gdof, ndof,
        rsp2,
    )
    # stage 3
    t3 = rhs(u2)
    accumulate(t3[4], _B_WEIGHTS[2])
    phi_last = t3[4]["phi"]
    u3 = _project(
        axpy(1.0 / 3.0, u0, 2.0 / 3.0, axpy(1.0, u2, dt, t3[:4])),
        geom, gdof, ndof, rsp2,
    )

    new_state = dataclasses.replace(
        state,
        u=state.u.at[np1].set(u3[0]),
        v=state.v.at[np1].set(u3[1]),
        t=state.t.at[np1].set(u3[2]),
        dp3d=state.dp3d.at[np1].set(u3[3]),
    )
    new_derived = dataclasses.replace(
        derived,
        vn0_u=derived.vn0_u + acc["vdp1"],
        vn0_v=derived.vn0_v + acc["vdp2"],
        omega_p=derived.omega_p + acc["omega_p"],
        eta_dot_dpdn=derived.eta_dot_dpdn + acc["eta"],
        phi=phi_last,
    )
    return new_state, new_derived
