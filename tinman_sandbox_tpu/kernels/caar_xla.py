"""compute_and_apply_rhs as one jittable XLA function.

The XLA-fusion path of the CAAR kernel (behavior of routine_mod.F90:7-193 /
CaarFunctor.hpp:40-562): batched over [nelem, nlev, np, np], built from the
ops/ layer so the whole pipeline is a single fused HLO program. Works in any
dtype (f64 for the oracle gate on CPU, f32/bf16 on TPU). The Pallas fast path
(kernels/caar_pallas.py) implements the same contract.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..constants import CONSTANTS
from ..grid import Geometry, HybridVCoord
from ..ops import (
    divergence_sphere,
    eta_dot_dpdn_rsplit0,
    gradient_sphere,
    midpoint_pressure,
    preq_hydrostatic,
    preq_omega_ps,
    preq_vertadv,
    virtual_temperature,
    vorticity_sphere,
)
from ..state import Derived, State


def caar_rhs(
    u, v, t, dp,
    qdp_q,          # [nelem, nlev, np, np] tracer 0 mass at qn0 (or None)
    phis,
    pecnd,
    geom: Geometry,
    hv: HybridVCoord,
    cfg: Config,
    moist: bool = True,
):
    """Pure CAAR tendencies at one time level (no mass-matrix apply).

    The RHS evaluation of routine_mod.F90:7-177 as a function of the fields
    themselves — the building block for arbitrary time discretizations
    (timeloop/rk.py) and for caar_xla below. Returns
    (vtens1, vtens2, ttens, dptens, diags) where dptens = -(divdp + delta_k
    eta_dot_dpdn) and diags carries phi / omega_p / vdp / eta_dot_dpdn.
    """
    c = CONSTANTS
    dvv = geom.dvv
    # add a broadcast level axis to per-element geometry
    dinv = geom.dinv[:, None]
    d = geom.d[:, None]
    metdet = geom.metdet[:, None]
    rmetdet = geom.rmetdet[:, None]
    fcor = geom.fcor[:, None]
    rr = jnp.asarray(c.rrearth, u.dtype)

    # pressure + its gradient (routine_mod.F90:72-91)
    p = midpoint_pressure(hv.hyai[0] * hv.ps0, dp)
    grad_p1, grad_p2 = gradient_sphere(p, dvv, dinv, rr)
    vgrad_p = u * grad_p1 + v * grad_p2
    vdp1, vdp2 = u * dp, v * dp

    # mass-flux divergence + vorticity (routine_mod.F90:92-93)
    divdp = divergence_sphere(vdp1, vdp2, dvv, dinv, metdet, rmetdet, rr)
    vort = vorticity_sphere(u, v, dvv, d, rmetdet, rr)

    # virtual temperature (routine_mod.F90:95-118)
    if moist:
        t_v = virtual_temperature(t, qdp_q, dp, c.rgas_over_rvap_m1)
    else:
        t_v = t

    # vertical scans (routine_mod.F90:119-120)
    phi = preq_hydrostatic(phis, t_v, p, dp, c.Rgas)
    omega_p = preq_omega_ps(p, vgrad_p, divdp)

    # vertical mass flux + advection: rsplit>0 is vertically-Lagrangian
    # (eta_dot_dpdn = T_vadv = v_vadv = 0, routine_mod.F90:121-124); rsplit=0
    # is the full eta-coordinate path (routine_extracted.F90:224-260)
    nelem, nlev = t.shape[0], t.shape[1]
    if cfg.rsplit > 0:
        t_vadv = u_vadv = v_vadv = jnp.zeros_like(t)
        eta_dot = jnp.zeros((nelem, nlev + 1) + t.shape[2:], t.dtype)
        d_eta_int = 0.0
    else:
        eta_dot, _ = eta_dot_dpdn_rsplit0(divdp, hv.hybi)
        t_vadv, u_vadv, v_vadv = preq_vertadv(t, u, v, eta_dot, 1.0 / dp)
        d_eta_int = eta_dot[:, 1:] - eta_dot[:, :-1]

    # tendencies (routine_mod.F90:140-177)
    ephi = 0.5 * (u * u + v * v) + phi + pecnd
    grad_t1, grad_t2 = gradient_sphere(t, dvv, dinv, rr)
    vgrad_t = u * grad_t1 + v * grad_t2
    gephi1, gephi2 = gradient_sphere(ephi, dvv, dinv, rr)
    gpterm = c.Rgas * (t_v / p)
    fcor_vort = fcor + vort
    vtens1 = -u_vadv + v * fcor_vort - gephi1 - gpterm * grad_p1
    vtens2 = -v_vadv - (u * fcor_vort) - gephi2 - gpterm * grad_p2
    ttens = -t_vadv - vgrad_t + c.kappa * t_v * omega_p
    dptens = -(divdp + d_eta_int)

    diags = dict(phi=phi, omega_p=omega_p, vdp1=vdp1, vdp2=vdp2,
                 eta_dot_dpdn=eta_dot)
    return vtens1, vtens2, ttens, dptens, diags


@partial(jax.jit, static_argnames=("cfg", "moist"))
def caar_xla(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    cfg: Config,
    dt2,
    eta_ave_w,
    moist: bool = True,
):
    """One CAAR evaluation + leapfrog/RK-substep update.

    Returns (new_state, new_derived). Matches ref/caar_ref.py to fp tolerance.
    """
    n0, np1, nm1, qn0 = cfg.n0, cfg.np1, cfg.nm1, cfg.qn0
    sph = geom.spheremp[:, None]

    vtens1, vtens2, ttens, dptens, diags = caar_rhs(
        state.u[n0], state.v[n0], state.t[n0], state.dp3d[n0],
        state.qdp[qn0, :, 0] if moist else None,
        state.phis, derived.pecnd, geom, hv, cfg, moist=moist,
    )

    # apply (routine_mod.F90:182-190; dp3d with the interface-flux stencil,
    # routine_extracted.F90:517)
    new_state = dataclasses.replace(
        state,
        u=state.u.at[np1].set(sph * (state.u[nm1] + dt2 * vtens1)),
        v=state.v.at[np1].set(sph * (state.v[nm1] + dt2 * vtens2)),
        t=state.t.at[np1].set(sph * (state.t[nm1] + dt2 * ttens)),
        dp3d=state.dp3d.at[np1].set(
            sph * (state.dp3d[nm1] + dt2 * dptens)
        ),
    )
    new_derived = dataclasses.replace(
        derived,
        vn0_u=derived.vn0_u + eta_ave_w * diags["vdp1"],
        vn0_v=derived.vn0_v + eta_ave_w * diags["vdp2"],
        phi=diags["phi"],
        omega_p=derived.omega_p + eta_ave_w * diags["omega_p"],
        eta_dot_dpdn=derived.eta_dot_dpdn + eta_ave_w * diags["eta_dot_dpdn"],
    )
    return new_state, new_derived
