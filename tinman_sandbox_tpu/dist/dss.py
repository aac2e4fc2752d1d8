"""Direct stiffness summation (DSS) — assembly of shared GLL dofs.

The continuity operation full HOMME performs through its edge-exchange layer
(stripped from the reference; element_mod.F90:234-236, SURVEY §2.9/§5).
Expressed TPU-natively as a segment-sum over the global dof map: under jit
with element-sharded inputs XLA lowers the scatter/gather to the collectives,
so the same code is correct on 1 chip and on an N-device mesh.

The projection identity (SURVEY §7 "hard parts") is the correctness anchor:
    dss_project(x) == x   for any x continuous across element boundaries.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import NPSQ

__all__ = ["dss_sum", "dss_scaled", "dss_project"]


def _to_cols(x):
    """[e, ..., np, np] -> ([e*16, prod(mid)], mid_shape): dof-major columns."""
    e = x.shape[0]
    mid = x.shape[1:-2]
    xt = jnp.moveaxis(x.reshape(e, -1, NPSQ), 1, 2)     # [e, 16, mid]
    return xt.reshape(e * NPSQ, -1), mid


def _from_cols(cols, e, mid):
    x = cols.reshape(e, NPSQ, -1)
    return jnp.moveaxis(x, 2, 1).reshape(e, *mid, 4, 4)


@partial(jax.jit, static_argnames=("ndof",))
def dss_sum(x, gdof, ndof: int):
    """sum_{(e,i,j) aliasing each dof} x[e, ..., i, j], scattered back.

    x: [nelem, ..., np, np]; gdof: [nelem, np, np] int32.
    """
    cols, mid = _to_cols(x)
    summed = jax.ops.segment_sum(
        cols, gdof.reshape(-1), num_segments=ndof
    )                                                    # [ndof, mid]
    gathered = summed[gdof.reshape(-1)]
    return _from_cols(gathered, x.shape[0], mid)


def dss_scaled(x, gdof, ndof: int, rspheremp):
    """rspheremp * DSS(x): the assembly step applied to an already
    spheremp-weighted update (routine_mod.F90:182-190 produces
    spheremp*(...); full HOMME then exchanges + multiplies rspheremp)."""
    r = rspheremp
    while r.ndim < x.ndim:
        r = r[:, None]  # broadcast level axes between element and GLL dims
    return r * dss_sum(x, gdof, ndof)


def dss_project(x, gdof, ndof: int, spheremp, rspheremp):
    """Mass-weighted continuous projection:
    (sum_e spheremp*x) / (sum_e spheremp) at every shared dof."""
    s = spheremp
    while s.ndim < x.ndim:
        s = s[:, None]
    return dss_scaled(s * x, gdof, ndof, rspheremp)
