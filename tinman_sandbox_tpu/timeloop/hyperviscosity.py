"""Biharmonic hyperviscosity step.

The reference ships HOMME's full hyperviscosity operator set
(SphereOperators.hpp:537-994: laplace_simple/tensor, vlaplace_*) but no
driver that applies them. This module completes them into the standard HOMME
biharmonic damping: two weak-form Laplacian applications with DSS assembly
between (the weak operator produces spheremp-weighted residuals, so each
pass is closed by rspheremp * DSS), then an explicit update

    X <- X - dt * nu * grad^4(X)        (u, v, T; optionally dp3d)

subcycled ``hypervis_subcycle`` times per step.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..constants import CONSTANTS
from ..grid import Geometry
from ..ops import laplace_simple, vlaplace_sphere_wk_contra
from ..state import State
from ..dist.dss import dss_scaled

__all__ = ["biharmonic_wk", "apply_hyperviscosity"]


def _assemble(x, gdof, ndof, rspheremp):
    return dss_scaled(x, gdof, ndof, rspheremp)


def biharmonic_wk(u, v, t, geom: Geometry, gdof, ndof: int, nu_ratio=1.0):
    """Assembled grad^4 of (u, v) [vector] and t [scalar]:
    two (weak laplacian -> rspheremp*DSS) passes."""
    dvv = geom.dvv
    dinv = geom.dinv[:, None]
    d = geom.d[:, None]
    sph = geom.spheremp[:, None]
    mp = geom.mp[:, None]
    metinv = geom.metinv[:, None]
    metdet = geom.metdet[:, None]
    rmetdet = geom.rmetdet[:, None]
    rr = jnp.asarray(CONSTANTS.rrearth, t.dtype)
    rsp = geom.rspheremp

    def vec_lap(a, b):
        l1, l2 = vlaplace_sphere_wk_contra(
            a, b, dvv, d, dinv, mp, sph, metinv, metdet, rmetdet, rr, nu_ratio
        )
        return (_assemble(l1, gdof, ndof, rsp),
                _assemble(l2, gdof, ndof, rsp))

    def sca_lap(s):
        return _assemble(
            laplace_simple(s, dvv, dinv, sph, rr), gdof, ndof, rsp
        )

    lu, lv = vec_lap(u, v)
    lt = sca_lap(t)
    return (*vec_lap(lu, lv), sca_lap(lt))


@partial(jax.jit, static_argnames=("cfg", "ndof", "subcycle"))
def apply_hyperviscosity(state: State, geom: Geometry, gdof, ndof: int,
                         cfg: Config, nu, nu_div_ratio=1.0, dt=None,
                         subcycle: int = 1):
    """Damp the np1 time level: X -= (dt/subcycle)*nu*grad^4(X)."""
    np1 = cfg.np1
    dt = cfg.dt if dt is None else dt
    dt_sub = jnp.asarray(dt / subcycle, state.u.dtype)
    nu = jnp.asarray(nu, state.u.dtype)

    u, v, t = state.u[np1], state.v[np1], state.t[np1]
    for _ in range(subcycle):
        b_u, b_v, b_t = biharmonic_wk(u, v, t, geom, gdof, ndof, nu_div_ratio)
        u = u - dt_sub * nu * b_u
        v = v - dt_sub * nu * b_v
        t = t - dt_sub * nu * b_t
    return dataclasses.replace(
        state,
        u=state.u.at[np1].set(u),
        v=state.v.at[np1].set(v),
        t=state.t.at[np1].set(t),
    )
