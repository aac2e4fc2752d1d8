"""Global energy / mass diagnostics.

The reference carries HOMME's energy-budget accumulators only as dead code
(elem_accum_t, #ifdef ENERGY_DIAGNOSTICS, element_mod.F90:127-196;
routine_extracted.F90's KEvert/IEvert terms). This implements the live
diagnostics: spheremp-weighted global integrals of kinetic, internal, and
surface-potential energy and of air mass,

    KE = (1/g) sum spheremp * 0.5*(u^2+v^2) * dp
    IE = (1/g) sum spheremp * Cp * T * dp
    PE = (1/g) sum spheremp * phis * dp
    M  = (1/g) sum spheremp * dp

computed in f64 regardless of state dtype (diagnostics must not drift).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..constants import CONSTANTS
from ..state import State

__all__ = ["energy_diagnostics", "global_integral"]


def global_integral(field, spheremp):
    """(sum over elements/levels/GLL of spheremp * field) in f64.

    field: [nelem, nlev, np, np]; spheremp: [nelem, np, np].
    """
    f = field.astype(jnp.float64)
    w = spheremp.astype(jnp.float64)[:, None]
    return jnp.sum(w * f)


@partial(jax.jit, static_argnames=("cfg",))
def energy_diagnostics(state: State, spheremp, cfg: Config, tl: int | None = None):
    """{'KE','IE','PE','M'} at time level ``tl`` (default n0)."""
    c = CONSTANTS
    tl = cfg.n0 if tl is None else tl
    u = state.u[tl].astype(jnp.float64)
    v = state.v[tl].astype(jnp.float64)
    t = state.t[tl].astype(jnp.float64)
    dp = state.dp3d[tl].astype(jnp.float64)
    phis = state.phis.astype(jnp.float64)[:, None]
    ginv = 1.0 / c.g
    return {
        "KE": ginv * global_integral(0.5 * (u * u + v * v) * dp, spheremp),
        "IE": ginv * c.Cp * global_integral(t * dp, spheremp),
        "PE": ginv * global_integral(phis * dp, spheremp),
        "M": ginv * global_integral(dp, spheremp),
    }


@partial(jax.jit, static_argnames=("nlev",))
def energy_diagnostics_packed_t(s, meta, nlev: int):
    """energy_diagnostics on the packed stacked state ([4*nlev, E16] with
    u/v/T/dp row blocks; meta [16, E16] carrying spheremp/phis rows) — the
    monitoring hook for long packed-cadence runs (no unpacking)."""
    from ..kernels.layout import META_COLS

    c = CONSTANTS
    k = nlev
    u = s[0:k].astype(jnp.float64)
    v = s[k:2 * k].astype(jnp.float64)
    t = s[2 * k:3 * k].astype(jnp.float64)
    dp = s[3 * k:4 * k].astype(jnp.float64)
    sph = meta[META_COLS.index("spheremp")].astype(jnp.float64)[None]
    phis = meta[META_COLS.index("phis")].astype(jnp.float64)[None]
    ginv = 1.0 / c.g
    gi = lambda f: jnp.sum(sph * f)
    return {
        "KE": ginv * gi(0.5 * (u * u + v * v) * dp),
        "IE": ginv * c.Cp * gi(t * dp),
        "PE": ginv * gi(phis * dp),
        "M": ginv * gi(dp),
    }
