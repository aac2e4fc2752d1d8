"""Structured (gather-free) DSS on the contiguous cubed-sphere ordering.

The round-1 assembly path (dist/step_pallas.py) is an alias-table row
gather — correct everywhere, but it streams the whole field 5x through HBM
per assembled output. This module exploits the regularity of the packed
layout instead: with elements ordered face-major/row-major and GLL points
packed as ``[e*16 + i*4 + j, k]`` (kernels/layout.py), a field reshapes to

    x[face, ej, ei, i, j, k]      (verified: gdof[f,ej,ei,3,j]==gdof[f,ej,ei+1,0,j])

and direct stiffness summation decomposes into

  1. an alpha sweep — sum the shared i=3/i=0 columns of ei-neighbors
     (ONE static slice add over the whole array);
  2. a beta sweep on the result — sum the shared j=3/j=0 columns of
     ej-neighbors. The tensor-product order makes the 4-way in-face element
     corners come out exactly right (the alpha-summed corner columns get
     beta-summed in pairs);
  3. twelve cube-edge line exchanges — each cube edge joins two face sides
     whose GLL lines match either identically or reversed (resolved at plan
     build from the gdof map); endpoint (cube-corner) samples excluded;
  4. an 8-corner fix-up — each cube corner dof has exactly three aliasing
     rows (one per adjacent face), summed explicitly.

Steps 1-3 are static slices + adds + slice-updates: no gather, no scatter,
fully XLA-fusable, HBM-roofline-bound. Step 4 touches 24 rows.

This is the TPU-native replacement for HOMME's edge-buffer pack/exchange
(the layer the reference stripped, element_mod.F90:234-236), specialized to
the single-chip/full-grid case; the shard_map tiers in dist/halo*.py remain
the multi-chip path.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NP, NPSQ

__all__ = ["StructuredDssPlan", "make_structured_plan", "dss_structured",
           "dss_structured_scaled", "dss_structured_t",
           "dss_structured_scaled_t"]

_SIDES = ("W", "E", "S", "N")


def _side_line_idx(ne: int, face: int, side: str) -> np.ndarray:
    """Flat packed-row indices of a face side's GLL line, ordered along the
    edge ([ne*4] ints). Row = ((face*ne + ej)*ne + ei)*16 + i*4 + j."""
    if side in ("W", "E"):
        ei = 0 if side == "W" else ne - 1
        i = 0 if side == "W" else NP - 1
        ej = np.repeat(np.arange(ne), NP)
        j = np.tile(np.arange(NP), ne)
        iarr = np.full(ne * NP, i)
        eiarr = np.full(ne * NP, ei)
    else:
        ej_ = 0 if side == "S" else ne - 1
        j_ = 0 if side == "S" else NP - 1
        ei = np.repeat(np.arange(ne), NP)
        iarr = np.tile(np.arange(NP), ne)
        ej = np.full(ne * NP, ej_)
        j = np.full(ne * NP, j_)
        eiarr = ei
    if side in ("W", "E"):
        return ((face * ne + ej) * ne + eiarr) * NPSQ + iarr * NP + j
    return ((face * ne + ej) * ne + eiarr) * NPSQ + iarr * NP + j


@dataclasses.dataclass(frozen=True)
class StructuredDssPlan:
    """Static slice/orientation descriptors for one cubed-sphere resolution."""

    ne: int
    # 12 entries: (face_a, side_a, face_b, side_b, flip)
    edges: Tuple[Tuple[int, str, int, str, bool], ...]
    # [8, 3] packed-row indices of each cube corner's three aliases
    corner_rows: Tuple[Tuple[int, int, int], ...]


def make_structured_plan(gdof: np.ndarray, ne: int) -> StructuredDssPlan:
    """Derive the cube-edge pairing/orientation and corner aliases
    numerically from the global dof map (no hand-coded face table — robust
    to any face convention that keeps the packed ordering)."""
    g = np.asarray(gdof).reshape(-1)
    lines = {(f, s): _side_line_idx(ne, f, s) for f in range(6) for s in _SIDES}

    # sanity: the two in-face sweeps must see matching dofs
    g6 = np.asarray(gdof).reshape(6, ne, ne, NP, NP)
    assert np.array_equal(g6[:, :, :-1, NP - 1, :], g6[:, :, 1:, 0, :]), \
        "alpha-neighbor dofs misaligned — packed ordering changed?"
    assert np.array_equal(g6[:, :-1, :, :, NP - 1], g6[:, 1:, :, :, 0]), \
        "beta-neighbor dofs misaligned — packed ordering changed?"

    keys = list(lines)
    used = set()
    edges = []
    for a_i, ka in enumerate(keys):
        if ka in used:
            continue
        ga = g[lines[ka]]
        for kb in keys[a_i + 1:]:
            if kb in used:
                continue
            gb = g[lines[kb]]
            if np.array_equal(ga, gb):
                edges.append((ka[0], ka[1], kb[0], kb[1], False))
            elif np.array_equal(ga, gb[::-1]):
                edges.append((ka[0], ka[1], kb[0], kb[1], True))
            else:
                continue
            used.add(ka)
            used.add(kb)
            break
    assert len(edges) == 12, f"expected 12 cube edges, found {len(edges)}"

    # cube corners: dofs aliased by exactly 3 rows
    rows_of = {}
    for r, d in enumerate(g):
        rows_of.setdefault(d, []).append(r)
    corners = sorted(rs for rs in rows_of.values() if len(rs) == 3)
    assert len(corners) == 8, f"expected 8 cube corners, found {len(corners)}"

    return StructuredDssPlan(
        ne=ne,
        edges=tuple(edges),
        corner_rows=tuple(tuple(rs) for rs in corners),
    )


def _get_line(x6, ne: int, face: int, side: str):
    """Extract a face-side GLL line as [..., ne*4, k] from the
    [..., 6, ne, ne, 4, 4, k] view (ordering matches _side_line_idx)."""
    if side == "W":
        ln = x6[..., face, :, 0, 0, :, :]
    elif side == "E":
        ln = x6[..., face, :, ne - 1, NP - 1, :, :]
    elif side == "S":
        ln = x6[..., face, 0, :, :, 0, :]
    else:  # N
        ln = x6[..., face, ne - 1, :, :, NP - 1, :]
    shape = ln.shape
    return ln.reshape(*shape[:-3], ne * NP, shape[-1])


def _set_line(x6, ne: int, face: int, side: str, val):
    val = val.reshape(*val.shape[:-2], ne, NP, val.shape[-1])
    if side == "W":
        return x6.at[..., face, :, 0, 0, :, :].set(val)
    if side == "E":
        return x6.at[..., face, :, ne - 1, NP - 1, :, :].set(val)
    if side == "S":
        return x6.at[..., face, 0, :, :, 0, :].set(val)
    return x6.at[..., face, ne - 1, :, :, NP - 1, :].set(val)


@partial(jax.jit, static_argnames=("plan",))
def dss_structured(x, plan: StructuredDssPlan):
    """DSS (unscaled shared-dof sum) of a packed [e*16, k] field."""
    ne = plan.ne
    e16, k = x.shape
    assert e16 == 6 * ne * ne * NPSQ, (e16, ne)
    x6 = x.reshape(6, ne, ne, NP, NP, k)

    # 1. alpha sweep (ei-neighbors share the i=3 / i=0 GLL columns)
    t = x6[:, :, :-1, NP - 1, :, :] + x6[:, :, 1:, 0, :, :]
    x6 = x6.at[:, :, :-1, NP - 1, :, :].set(t).at[:, :, 1:, 0, :, :].set(t)

    # 2. beta sweep on the result (4-way corners finish here)
    t = x6[:, :-1, :, :, NP - 1, :] + x6[:, 1:, :, :, 0, :]
    x6 = x6.at[:, :-1, :, :, NP - 1, :].set(t).at[:, 1:, :, :, 0, :].set(t)

    # 3. cube-edge line exchanges (endpoints = cube corners, fixed in step 4)
    for fa, sa, fb, sb, flip in plan.edges:
        la = _get_line(x6, ne, fa, sa)
        lb = _get_line(x6, ne, fb, sb)
        lbo = jnp.flip(lb, axis=-2) if flip else lb
        s = la + lbo
        sa_new = la.at[1:-1].set(s[1:-1])
        sb_new = lb.at[1:-1].set(
            (jnp.flip(s, axis=-2) if flip else s)[1:-1]
        )
        x6 = _set_line(x6, ne, fa, sa, sa_new)
        x6 = _set_line(x6, ne, fb, sb, sb_new)

    # 4. cube corners: 3 aliasing rows each, summed from pre-exchange values
    flat = x6.reshape(e16, k)
    rows = jnp.asarray(np.asarray(plan.corner_rows))        # [8, 3]
    vals = x[rows[:, 0]] + x[rows[:, 1]] + x[rows[:, 2]]    # [8, k]
    flat = flat.at[rows[:, 0]].set(vals) \
               .at[rows[:, 1]].set(vals) \
               .at[rows[:, 2]].set(vals)
    return flat


@partial(jax.jit, static_argnames=("plan",))
def dss_structured_scaled(x, plan: StructuredDssPlan, rsp_rows):
    """rspheremp * DSS(x) for packed [e*16, k] fields — drop-in for
    dist.step_pallas.dss_scaled_packed's role without any row gathers."""
    return rsp_rows * dss_structured(x, plan)


# -- transposed ([k, e16]) layout ---------------------------------------------

def _get_line_t(x6, ne: int, face: int, side: str):
    """Face-side GLL line as [..., k, ne*4] from the transposed
    [..., k, 6, ne, ne, 4, 4] view."""
    if side == "W":
        ln = x6[..., face, :, 0, 0, :]
    elif side == "E":
        ln = x6[..., face, :, ne - 1, NP - 1, :]
    elif side == "S":
        ln = x6[..., face, 0, :, :, 0]
    else:  # N
        ln = x6[..., face, ne - 1, :, :, NP - 1]
    shape = ln.shape
    return ln.reshape(*shape[:-2], ne * NP)


def _set_line_t(x6, ne: int, face: int, side: str, val):
    val = val.reshape(*val.shape[:-1], ne, NP)
    if side == "W":
        return x6.at[..., face, :, 0, 0, :].set(val)
    if side == "E":
        return x6.at[..., face, :, ne - 1, NP - 1, :].set(val)
    if side == "S":
        return x6.at[..., face, 0, :, :, 0].set(val)
    return x6.at[..., face, ne - 1, :, :, NP - 1].set(val)


@partial(jax.jit, static_argnames=("plan",))
def dss_structured_t(x, plan: StructuredDssPlan):
    """DSS (unscaled shared-dof sum) of a transposed [k, e*16] field —
    the same sweep algebra as dss_structured with the element axis on
    lanes (kernels/caar_pallas_t.py layout)."""
    ne = plan.ne
    k, e16 = x.shape
    assert e16 == 6 * ne * ne * NPSQ, (e16, ne)
    x6 = x.reshape(k, 6, ne, ne, NP, NP)

    # 1. alpha sweep (ei-neighbors share the i=3 / i=0 GLL columns)
    t = x6[:, :, :, :-1, NP - 1, :] + x6[:, :, :, 1:, 0, :]
    x6 = x6.at[:, :, :, :-1, NP - 1, :].set(t).at[:, :, :, 1:, 0, :].set(t)

    # 2. beta sweep on the result
    t = x6[:, :, :-1, :, :, NP - 1] + x6[:, :, 1:, :, :, 0]
    x6 = x6.at[:, :, :-1, :, :, NP - 1].set(t).at[:, :, 1:, :, :, 0].set(t)

    # 3. cube-edge line exchanges
    for fa, sa, fb, sb, flip in plan.edges:
        la = _get_line_t(x6, ne, fa, sa)
        lb = _get_line_t(x6, ne, fb, sb)
        lbo = jnp.flip(lb, axis=-1) if flip else lb
        s = la + lbo
        sa_new = la.at[:, 1:-1].set(s[:, 1:-1])
        sb_new = lb.at[:, 1:-1].set(
            (jnp.flip(s, axis=-1) if flip else s)[:, 1:-1]
        )
        x6 = _set_line_t(x6, ne, fa, sa, sa_new)
        x6 = _set_line_t(x6, ne, fb, sb, sb_new)

    # 4. cube corners (from pre-exchange values — untouched by steps 1-3)
    flat = x6.reshape(k, e16)
    rows = jnp.asarray(np.asarray(plan.corner_rows))        # [8, 3]
    vals = x[:, rows[:, 0]] + x[:, rows[:, 1]] + x[:, rows[:, 2]]  # [k, 8]
    flat = flat.at[:, rows[:, 0]].set(vals) \
               .at[:, rows[:, 1]].set(vals) \
               .at[:, rows[:, 2]].set(vals)
    return flat


@partial(jax.jit, static_argnames=("plan",))
def dss_structured_scaled_t(x, plan: StructuredDssPlan, rsp_lanes):
    """rspheremp * DSS(x) for transposed [k, e*16] fields
    (``rsp_lanes``: [1, e*16], or [2, e*16] two-float hi+lo)."""
    return apply_rsp_t(rsp_lanes, dss_structured_t(x, plan))


def apply_rsp_t(rsp_lanes, y):
    """y * rspheremp on the lane axis, two-float aware ([2, n] = hi + lo
    rows; see kernels.dss_pallas._rsp_mul for why)."""
    if rsp_lanes.shape[0] == 2:
        return y * rsp_lanes[0:1] + y * rsp_lanes[1:2]
    return rsp_lanes * y


def rsp_lanes_2f(spheremp, gdof, ndof: int):
    """Two-float rspheremp lanes [2, e16] (hi + lo f32 rows).

    Computed against the f32-ROUNDED spheremp actually multiplied into
    the kernels: S = sum over a dof's aliases of f32(spheremp), in f64;
    hi + lo = 1/S to ~2^-48. The single-f32 rspheremp satisfies
    fl(rsp)*S = 1 + O(1e-8) with a FIXED per-dof sign — a systematic
    multiplicative bias every DSS pass that integrates into a linear
    mass drift (utils_mod.F90:10-33 is the reference's analogous
    compensated-arithmetic discipline)."""
    sph32 = np.asarray(spheremp, np.float32).astype(np.float64).reshape(-1)
    gd = np.asarray(gdof).reshape(-1)
    S = np.zeros(ndof, np.float64)
    np.add.at(S, gd, sph32)
    r = 1.0 / S[gd]
    hi = r.astype(np.float32)
    lo = (r - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo])


def _sweep_masks_t(ne: int, e16: int):
    """0/1 lane masks selecting the in-face shared GLL columns, for the
    roll-based sweeps (lane = ((f*ne + ej)*ne + ei)*16 + i*4 + j)."""
    lane = jnp.arange(e16, dtype=jnp.int32)[None, :]
    i = (lane // NP) % NP
    j = lane % NP
    ei = (lane // NPSQ) % ne
    ej = (lane // (NPSQ * ne)) % ne
    f32 = jnp.float32
    m_a_hi = ((i == NP - 1) & (ei < ne - 1)).astype(f32)   # partner +4 lanes
    m_a_lo = ((i == 0) & (ei > 0)).astype(f32)             # partner -4 lanes
    m_b_hi = ((j == NP - 1) & (ej < ne - 1)).astype(f32)   # +(16*ne - 3)
    m_b_lo = ((j == 0) & (ej > 0)).astype(f32)             # -(16*ne - 3)
    return m_a_hi, m_a_lo, m_b_hi, m_b_lo


@partial(jax.jit, static_argnames=("plan",))
def dss_structured_t_roll(x, plan: StructuredDssPlan):
    """dss_structured_t with the alpha/beta sweeps as masked lane ROLLS
    instead of strided slice-updates: the in-face alpha partner of a lane
    is exactly 4 lanes away (i=3 <-> next element's i=0) and the beta
    partner 16*ne-3 lanes away, so each sweep is two cyclic lane shifts
    + masked adds — one fused elementwise pass over the array, no
    sublane/lane relayouts. Edge lines + cube corners as in
    dss_structured_t."""
    ne = plan.ne
    k, e16 = x.shape
    assert e16 == 6 * ne * ne * NPSQ, (e16, ne)
    m_a_hi, m_a_lo, m_b_hi, m_b_lo = _sweep_masks_t(ne, e16)

    # 1+2. alpha then beta sweep, each as two masked rolls
    y = (x + m_a_hi * jnp.roll(x, -NP, axis=1)
           + m_a_lo * jnp.roll(x, NP, axis=1))
    db = NPSQ * ne - (NP - 1)
    z = (y + m_b_hi * jnp.roll(y, -db, axis=1)
           + m_b_lo * jnp.roll(y, db, axis=1))

    x6 = z.reshape(k, 6, ne, ne, NP, NP)

    # 3. cube-edge line exchanges
    for fa, sa, fb, sb, flip in plan.edges:
        la = _get_line_t(x6, ne, fa, sa)
        lb = _get_line_t(x6, ne, fb, sb)
        lbo = jnp.flip(lb, axis=-1) if flip else lb
        s = la + lbo
        sa_new = la.at[:, 1:-1].set(s[:, 1:-1])
        sb_new = lb.at[:, 1:-1].set(
            (jnp.flip(s, axis=-1) if flip else s)[:, 1:-1]
        )
        x6 = _set_line_t(x6, ne, fa, sa, sa_new)
        x6 = _set_line_t(x6, ne, fb, sb, sb_new)

    # 4. cube corners (from pre-sweep values)
    flat = x6.reshape(k, e16)
    rows = jnp.asarray(np.asarray(plan.corner_rows))        # [8, 3]
    vals = x[:, rows[:, 0]] + x[:, rows[:, 1]] + x[:, rows[:, 2]]  # [k, 8]
    flat = flat.at[:, rows[:, 0]].set(vals) \
               .at[:, rows[:, 1]].set(vals) \
               .at[:, rows[:, 2]].set(vals)
    return flat


# -- field-layout wrappers (for the RK / hyperviscosity / tracer paths) ------

def _to_packed_cols(x):
    """[nelem, *mid, np, np] -> ([nelem*16, M], mid) in packed row order."""
    ne = x.shape[0]
    mid = x.shape[1:-2]
    cols = x.reshape(ne, -1, NP, NP)
    cols = jnp.moveaxis(cols, 1, 3)                 # [ne, np, np, M]
    return cols.reshape(ne * NPSQ, -1), mid


def _from_packed_cols(cols, ne, mid):
    x = cols.reshape(ne, NP, NP, -1)
    x = jnp.moveaxis(x, 3, 1)
    return x.reshape(ne, *mid, NP, NP)


def _rows(per_elem):
    """[nelem, np, np] -> [nelem*16, 1]."""
    return jnp.asarray(per_elem).reshape(-1, 1)


@partial(jax.jit, static_argnames=("plan",))
def dss_scaled_structured_field(x, plan: StructuredDssPlan, rspheremp):
    """rspheremp * DSS(x) on [nelem, *mid, np, np] fields — the gather-free
    drop-in for dist.dss.dss_scaled on the full (unsharded) grid."""
    cols, mid = _to_packed_cols(x)
    out = _rows(rspheremp).astype(cols.dtype) * dss_structured(cols, plan)
    return _from_packed_cols(out, x.shape[0], mid)


@partial(jax.jit, static_argnames=("plan",))
def dss_project_structured_field(x, plan: StructuredDssPlan, spheremp,
                                 rspheremp):
    """rspheremp * DSS(spheremp * x) — dist.dss.dss_project drop-in."""
    cols, mid = _to_packed_cols(x)
    cols = _rows(spheremp).astype(cols.dtype) * cols
    out = _rows(rspheremp).astype(cols.dtype) * dss_structured(cols, plan)
    return _from_packed_cols(out, x.shape[0], mid)
