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

__all__ = ["euler_step", "advance_qdp"]


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
