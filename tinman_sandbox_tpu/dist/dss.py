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

__all__ = ["dss_sum", "dss_scaled", "dss_project", "rsp_2f"]


def rsp_2f(spheremp, gdof, ndof: int):
    """Two-float (hi, lo) rspheremp for the FIELD layout: the exact f64
    reciprocal of the sum of f32-ROUNDED spheremp over each dof's aliases,
    split into f32 hi + lo (structured_dss.rsp_lanes_2f's contract on
    [nelem, np, np] arrays). The single-f32 rspheremp carries a fixed-sign
    O(1e-8) multiplicative bias per DSS pass that integrates into the
    field cadence's linear mass drift (ENERGY_DRIFT.json r2:
    3.4e-5/5 days; reference discipline utils_mod.F90:10-33)."""
    import numpy as np

    shape = np.asarray(spheremp).shape
    sph32 = np.asarray(spheremp, np.float32).astype(np.float64).reshape(-1)
    gd = np.asarray(gdof).reshape(-1)
    S = np.zeros(ndof, np.float64)
    np.add.at(S, gd, sph32)
    r = 1.0 / S[gd]
    hi = r.astype(np.float32)
    lo = (r - hi.astype(np.float64)).astype(np.float32)
    return hi.reshape(shape), lo.reshape(shape)


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
    spheremp*(...); full HOMME then exchanges + multiplies rspheremp).
    ``rspheremp`` may be a ``(hi, lo)`` two-float pair (from ``rsp_2f``):
    the product is then evaluated as y*hi + y*lo, cancelling the single-
    f32 reciprocal's systematic bias."""
    y = dss_sum(x, gdof, ndof)
    if isinstance(rspheremp, tuple):
        hi, lo = rspheremp
        while hi.ndim < x.ndim:
            hi, lo = hi[:, None], lo[:, None]
        return y * hi + y * lo
    r = rspheremp
    while r.ndim < x.ndim:
        r = r[:, None]  # broadcast level axes between element and GLL dims
    return r * y


def dss_project(x, gdof, ndof: int, spheremp, rspheremp):
    """Mass-weighted continuous projection:
    (sum_e spheremp*x) / (sum_e spheremp) at every shared dof."""
    s = spheremp
    while s.ndim < x.ndim:
        s = s[:, None]
    return dss_scaled(s * x, gdof, ndof, rspheremp)
