"""Tracer advection Euler step.

Parity with the reference's EulerStepFunctor
(/root/reference/compute_and_apply_rhs_test/cxx/level_vectorized_ppscan/
EulerStepFunctor.hpp:33-69): for every tracer q,
    qdp_out = qdp + (-dt) * div(vstar * qdp)
via the fused alpha/beta divergence update (SphereOperators.hpp:362-403).
Batched here over [nelem, qsize, nlev, np, np] in one einsum program.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..constants import CONSTANTS
from ..grid import Geometry
from ..ops import divergence_sphere_update
from ..state import State

__all__ = ["euler_step", "advance_qdp", "ssprk3_tracer_step"]


@partial(jax.jit, static_argnames=("cfg",))
def euler_step(
    qdp,          # [nelem, qsize, nlev, np, np] tracer mass at qn0
    vstar_u,      # [nelem, nlev, np, np] advective velocity
    vstar_v,
    geom: Geometry,
    cfg: Config,
    dt,
):
    """qdp - dt*div(vstar*qdp) for all tracers at once."""
    rr = jnp.asarray(CONSTANTS.rrearth, qdp.dtype)
    # broadcast element geometry over (qsize, nlev)
    dinv = geom.dinv[:, None, None]
    metdet = geom.metdet[:, None, None]
    rmetdet = geom.rmetdet[:, None, None]
    vq1 = vstar_u[:, None] * qdp
    vq2 = vstar_v[:, None] * qdp
    return divergence_sphere_update(
        vq1, vq2, -dt, 1.0, qdp, geom.dvv, dinv, metdet, rmetdet, rr
    )


def advance_qdp(state: State, geom: Geometry, cfg: Config, dt):
    """Full-state tracer step: reads qdp[qn0] and the n0 winds, writes the
    other qdp time level (np1_qdp = 1 - qn0)."""
    np1_qdp = 1 - cfg.qn0
    new_qdp = euler_step(
        state.qdp[cfg.qn0], state.u[cfg.n0], state.v[cfg.n0], geom, cfg, dt
    )
    qdp = jnp.asarray(state.qdp).at[np1_qdp].set(new_qdp)
    return dataclasses.replace(state, qdp=qdp)


@partial(jax.jit, static_argnames=("cfg", "ndof", "limit"))
def ssprk3_tracer_step(qdp, vstar_u, vstar_v, geom: Geometry, cfg: Config,
                       dt, gdof=None, ndof: int = 0, limit: bool = False,
                       rsp2=None):
    """Strong-stability-preserving RK3 tracer transport (HOMME advances
    tracers with SSP substages inside qsplit; the reference's
    EulerStepFunctor is one such stage). Each stage is the fused Euler step,
    optionally the monotone mass-conserving limiter (ops/limiter.py, HOMME
    limiter8 analog, bounds from the stage's input extrema), then the
    continuous (DSS) projection when a dof map is given.
    """
    if gdof is not None:
        from ..dist.dss import dss_project

        rsp = rsp2 if rsp2 is not None else geom.rspheremp
        P = lambda q: dss_project(q, gdof, ndof, geom.spheremp, rsp)
    else:
        P = lambda q: q
    if limit:
        from ..ops.limiter import element_bounds, limit_tracer

        w = geom.spheremp[:, None, None]

        def L(q_out, q_in):
            qmin, qmax = element_bounds(q_in)
            return limit_tracer(q_out, w, qmin, qmax)
    else:
        L = lambda q_out, q_in: q_out
    E = lambda q: euler_step(q, vstar_u, vstar_v, geom, cfg, dt)
    q1 = P(L(E(qdp), qdp))
    q2 = P(L(0.75 * qdp + 0.25 * E(q1), q1))
    return P(L(qdp / 3.0 + (2.0 / 3.0) * E(q2), q2))
