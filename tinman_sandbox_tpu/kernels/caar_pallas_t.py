"""Fused Pallas CAAR kernel on the transposed "[K, E16]" layout.

Same math as kernels/caar_pallas.py (routine_mod.F90:7-193 /
CaarFunctor.hpp:40-562) with levels on SUBLANES and packed element-GLL
points on LANES:

  * zero tile padding: nlev=72 = 9 sublane tiles exactly; eb=8 elements
    = 128 lanes exactly. The "[E16, K]" layout pads 72 lanes to 128 —
    1.78x HBM footprint and a measured ~1.3x bandwidth penalty on v5e
    (404-409 GB/s transposed vs 308-319 GB/s padded in the triad probe);
  * the Dvv contractions become right-multiplications by the transposed
    block-diagonal operators: F_T @ DXB^T ([nlev,128] @ [128,128] MXU);
  * the vertical scans become left-multiplications by the transposed
    triangular operators: A^T @ F_T ([nlev,nlev] @ [nlev,128]);
  * the dp3d interface stencil and the rsplit=0 vertical advection use
    sublane shifts instead of lane shifts.

This is the round-2 headline layout; the "[E16, K]" twin is kept for the
structured-DSS assembled path until its epilogue is retargeted.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NPSQ, Config
from ..constants import CONSTANTS
from ..grid import Geometry, HybridVCoord
from ..state import Derived, State
from .fdot import make_dots, make_sel
from .layout import (
    META_COLS,
    block_derivative_ops,
    pack_field_t,
    pack_meta_t,
    scan_matrices,
    unpack_field_t,
)

__all__ = [
    "caar_pallas_t",
    "caar_pallas_packed_t",
    "caar_pallas_packed_t4_ext",
    "caar_pallas_packed_t4_rk",
    "caar_pallas_packed_rsplit0_t",
    "pack_problem_t",
]

_MC = {name: i for i, name in enumerate(META_COLS)}



def _caar_physics(split, moist, rgas, kappa, rv_factor, rrearth,
                  scal_ref, dxbt, dybt, ainct_ref, astrt_ref, bstrt_ref,
                  row, u, v, t, dp, um1x, vm1x, tm1x, dpm1x,
                  qdp_ref, pecnd_ref):
    """The CAAR update for one lane block (routine_mod.F90:7-193 math,
    rsplit>0): returns (u1v, v1v, t1v, dp1v, phi, vdp1, vdp2, omega_p).
    Shared verbatim by `_caar_kernel_t` and the ring-fused kernel
    (kernels/ring_fused.py) so the two compile to identical fp-op
    sequences."""
    f32 = jnp.float32
    dt2 = scal_ref[0, 0]
    dot, dot_lx, _ = make_dots(split)
    rr = f32(rrearth)

    dinv00, dinv01 = row("dinv00"), row("dinv01")
    dinv10, dinv11 = row("dinv10"), row("dinv11")
    metdet, rmetdet = row("metdet"), row("rmetdet")

    def grad(s):
        v1 = dot(s, dxbt) * rr
        v2 = dot(s, dybt) * rr
        return dinv00 * v1 + dinv10 * v2, dinv01 * v1 + dinv11 * v2

    def div(a, b):
        gv1 = metdet * (dinv00 * a + dinv01 * b)
        gv2 = metdet * (dinv10 * a + dinv11 * b)
        return (dot(gv1, dxbt) + dot(gv2, dybt)) * (rmetdet * rr)

    ld = lambda ref: ref[:].astype(f32)

    # 1. midpoint pressure: p = hyai0*ps0 + cumsum_k(dp) - dp/2
    p = scal_ref[0, 2] + dot_lx(ainct_ref[:], dp) - 0.5 * dp

    # 2. grad p / v.grad p / mass flux
    gp1, gp2 = grad(p)
    vgrad_p = u * gp1 + v * gp2
    vdp1, vdp2 = u * dp, v * dp

    # 3. div(v*dp) + vorticity
    divdp = div(vdp1, vdp2)
    vco1 = row("d00") * u + row("d10") * v
    vco2 = row("d01") * u + row("d11") * v
    vort = (dot(vco2, dxbt) - dot(vco1, dybt)) * (rmetdet * rr)

    # 4. virtual temperature
    if moist:
        t_v = t * (1.0 + f32(rv_factor) * (ld(qdp_ref) / dp))
    else:
        t_v = t

    # 5. hydrostatic: phi = phis + revcumsum_strict(q) + q/2
    q = f32(rgas) * t_v * (dp / p)
    phi = row("phis") + dot_lx(bstrt_ref[:], q) + 0.5 * q

    # 6. omega/p
    cum_strict = dot_lx(astrt_ref[:], divdp)
    omega_p = (vgrad_p - cum_strict - 0.5 * divdp) / p

    # 8. tendencies (rsplit>0: no vertical advection terms)
    ephi = 0.5 * (u * u + v * v) + phi + ld(pecnd_ref)
    gt1, gt2 = grad(t)
    ge1, ge2 = grad(ephi)
    gpterm = f32(rgas) * (t_v / p)
    fcor_vort = row("fcor") + vort
    vtens1 = v * fcor_vort - ge1 - gpterm * gp1
    vtens2 = -(u * fcor_vort) - ge2 - gpterm * gp2
    ttens = -(u * gt1 + v * gt2) + f32(kappa) * t_v * omega_p

    # 9. apply
    sph = row("spheremp")
    u1v = sph * (um1x + dt2 * vtens1)
    v1v = sph * (vm1x + dt2 * vtens2)
    t1v = sph * (tm1x + dt2 * ttens)
    dp1v = sph * (dpm1x - dt2 * divdp)
    return u1v, v1v, t1v, dp1v, phi, vdp1, vdp2, omega_p


def _caar_kernel_t(split, moist, rgas, kappa, rv_factor, rrearth, rsplit0,
                   stacked, ext, cM, single, *refs):
    assert not (stacked and rsplit0)
    assert not ((ext or single) and not stacked)
    sf_ref = ext_ref = q_ref = None
    if ext:
        # scalar-prefetch slot/flag table first, slab output last
        sf_ref, refs, ext_ref = refs[0], refs[1:-1], refs[-1]
        if cM:
            # compact extraction: one-hot row-selection table (see
            # kernels/dss_pallas.py::cext_tables) right after sf
            q_ref, refs = refs[0], refs[1:]
    if single:
        # RK-stage mode: ONE stacked state operand serves both the n0
        # (evaluation) and nm1 (base) roles — the generic pair mode would
        # fetch the identical buffer twice from HBM
        (scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref, bstrt_ref,
         meta_ref, s0_ref,
         qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref,
         s1_ref, phi_ref,
         vn0u_out, vn0v_out, omg_out) = refs
        sm1_ref = None
    elif rsplit0:
        (scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref, bstrt_ref,
         hyb_ref, meta_ref,
         u0_ref, v0_ref, t0_ref, dp0_ref,
         um1_ref, vm1_ref, tm1_ref, dpm1_ref,
         qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref, etaacc_ref,
         u1_ref, v1_ref, t1_ref, dp1_ref, phi_ref,
         vn0u_out, vn0v_out, omg_out, eta_out) = refs
    elif stacked:
        # n0/nm1 prognostics ride in ONE [4*nlev, EB16] block each (the
        # wrapper passes the stacked array 4x with row-offset index maps
        # is not needed: a single 4k-row block is sliced here); output
        # likewise one stacked block — lets the DSS epilogue run once
        # with no concat/split passes
        (scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref, bstrt_ref,
         meta_ref, s0_ref, sm1_ref,
         qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref,
         s1_ref, phi_ref,
         vn0u_out, vn0v_out, omg_out) = refs
    else:
        (scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref, bstrt_ref,
         meta_ref,
         u0_ref, v0_ref, t0_ref, dp0_ref,
         um1_ref, vm1_ref, tm1_ref, dpm1_ref,
         qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref,
         u1_ref, v1_ref, t1_ref, dp1_ref, phi_ref,
         vn0u_out, vn0v_out, omg_out) = refs
    f32 = jnp.float32
    dt2 = scal_ref[0, 0]
    eta = scal_ref[0, 1]
    hyai0ps0 = scal_ref[0, 2]

    dxbt = dxbt_ref[:]
    dybt = dybt_ref[:]

    dot, dot_lx, _ = make_dots(split)

    def row(name):
        i = _MC[name]
        return meta_ref[i:i + 1, :]                  # [1, EB16]

    dinv00, dinv01 = row("dinv00"), row("dinv01")
    dinv10, dinv11 = row("dinv10"), row("dinv11")
    metdet, rmetdet = row("metdet"), row("rmetdet")
    rr = f32(rrearth)

    def grad(s):
        v1 = dot(s, dxbt) * rr
        v2 = dot(s, dybt) * rr
        return dinv00 * v1 + dinv10 * v2, dinv01 * v1 + dinv11 * v2

    def div(a, b):
        gv1 = metdet * (dinv00 * a + dinv01 * b)
        gv2 = metdet * (dinv10 * a + dinv11 * b)
        return (dot(gv1, dxbt) + dot(gv2, dybt)) * (rmetdet * rr)

    ld = lambda ref: ref[:].astype(f32)

    if stacked:
        k_ = s0_ref.shape[0] // 4
        u, v = s0_ref[0:k_], s0_ref[k_:2 * k_]
        t, dp = s0_ref[2 * k_:3 * k_], s0_ref[3 * k_:4 * k_]
        if single:
            um1x, vm1x, tm1x, dpm1x = u, v, t, dp
        else:
            um1x = sm1_ref[0:k_].astype(f32)
            vm1x = sm1_ref[k_:2 * k_].astype(f32)
            tm1x = sm1_ref[2 * k_:3 * k_].astype(f32)
            dpm1x = sm1_ref[3 * k_:4 * k_].astype(f32)
    else:
        u, v = u0_ref[:], v0_ref[:]
        t, dp = t0_ref[:], dp0_ref[:]
        um1x, vm1x = ld(um1_ref), ld(vm1_ref)
        tm1x, dpm1x = ld(tm1_ref), ld(dpm1_ref)

    # 1. midpoint pressure: p = hyai0*ps0 + cumsum_k(dp) - dp/2
    p = hyai0ps0 + dot_lx(ainct_ref[:], dp) - 0.5 * dp

    # 2. grad p / v.grad p / mass flux
    gp1, gp2 = grad(p)
    vgrad_p = u * gp1 + v * gp2
    vdp1, vdp2 = u * dp, v * dp

    # 3. div(v*dp) + vorticity
    divdp = div(vdp1, vdp2)
    vco1 = row("d00") * u + row("d10") * v
    vco2 = row("d01") * u + row("d11") * v
    vort = (dot(vco2, dxbt) - dot(vco1, dybt)) * (rmetdet * rr)

    # 4. virtual temperature
    if moist:
        t_v = t * (1.0 + f32(rv_factor) * (ld(qdp_ref) / dp))
    else:
        t_v = t

    # 5. hydrostatic: phi = phis + revcumsum_strict(q) + q/2
    q = f32(rgas) * t_v * (dp / p)
    phi = row("phis") + dot_lx(bstrt_ref[:], q) + 0.5 * q

    # 6. omega/p
    cum_strict = dot_lx(astrt_ref[:], divdp)
    omega_p = (vgrad_p - cum_strict - 0.5 * divdp) / p

    # 7. vertical mass flux + advection (rsplit=0 only)
    if rsplit0:
        k = u0_ref.shape[0]
        cum_inc = cum_strict + divdp
        sdot = cum_inc[k - 1:k, :]                   # [1, EB16] column total
        lev = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        eta_lo = jnp.where(lev > 0,
                           hyb_ref[:, 0:1] * sdot - cum_strict, 0.0)
        eta_hi = jnp.where(lev < k - 1,
                           hyb_ref[:, 1:2] * sdot - cum_inc, 0.0)
        rpdel = 1.0 / dp
        facp = 0.5 * rpdel * eta_hi
        facm = 0.5 * rpdel * eta_lo

        def vadv(x):
            dxp = x[1:, :] - x[:-1, :]               # x(k+1)-x(k) on sublanes
            z = jnp.zeros_like(x[:1, :])
            up = jnp.concatenate([dxp, z], axis=0)
            dn = jnp.concatenate([z, dxp], axis=0)
            return facp * up + facm * dn

        t_vadv, u_vadv, v_vadv = vadv(t), vadv(u), vadv(v)
        d_eta_int = eta_hi - eta_lo
    else:
        t_vadv = u_vadv = v_vadv = 0.0
        d_eta_int = 0.0

    # 8. tendencies
    ephi = 0.5 * (u * u + v * v) + phi + ld(pecnd_ref)
    gt1, gt2 = grad(t)
    ge1, ge2 = grad(ephi)
    gpterm = f32(rgas) * (t_v / p)
    fcor_vort = row("fcor") + vort
    vtens1 = -u_vadv + v * fcor_vort - ge1 - gpterm * gp1
    vtens2 = -v_vadv - (u * fcor_vort) - ge2 - gpterm * gp2
    ttens = -t_vadv - (u * gt1 + v * gt2) + f32(kappa) * t_v * omega_p

    # 9. apply + accumulate
    sph = row("spheremp")
    u1v = sph * (um1x + dt2 * vtens1)
    v1v = sph * (vm1x + dt2 * vtens2)
    t1v = sph * (tm1x + dt2 * ttens)
    dp1v = sph * (dpm1x - dt2 * (divdp + d_eta_int))
    if stacked:
        s1_ref[0:k_] = u1v
        s1_ref[k_:2 * k_] = v1v
        s1_ref[2 * k_:3 * k_] = t1v
        s1_ref[3 * k_:4 * k_] = dp1v
        if ext:
            # producer-fused tile extraction (kernels/dss_pallas.py::
            # ext_slot_arrays): affected 128-lane blocks also write their
            # np1 state TRANSPOSED to the slab slot; unflagged blocks skip
            # the write so the revisit-coalesced flush keeps the affected
            # tile's data. With cM the slab is COMPACT: only the tile's
            # fix lanes, selected by an exact one-hot contraction
            # (fdot.make_sel — bitwise equal to the dense rows).
            @pl.when(sf_ref[1, pl.program_id(0)] == 1)
            def _write_slab():
                if cM:
                    sel_l, _ = make_sel(split)
                    q = q_ref[:]
                    ext_ref[:, 0:k_] = sel_l(q, u1v.T)
                    ext_ref[:, k_:2 * k_] = sel_l(q, v1v.T)
                    ext_ref[:, 2 * k_:3 * k_] = sel_l(q, t1v.T)
                    ext_ref[:, 3 * k_:4 * k_] = sel_l(q, dp1v.T)
                else:
                    ext_ref[:, 0:k_] = u1v.T
                    ext_ref[:, k_:2 * k_] = v1v.T
                    ext_ref[:, 2 * k_:3 * k_] = t1v.T
                    ext_ref[:, 3 * k_:4 * k_] = dp1v.T
    else:
        u1_ref[:] = u1v
        v1_ref[:] = v1v
        t1_ref[:] = t1v
        dp1_ref[:] = dp1v
    phi_ref[:] = phi
    vn0u_out[:] = vn0u_ref[:] + eta * vdp1
    vn0v_out[:] = vn0v_ref[:] + eta * vdp2
    omg_out[:] = omg_ref[:] + eta * omega_p
    if rsplit0:
        eta_out[:] = etaacc_ref[:] + eta * eta_hi


@partial(jax.jit, static_argnames=("eb", "nlev", "moist", "interpret"))
def caar_pallas_packed_t(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                         u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
                         qdp, pecnd, vn0u, vn0v, omg,
                         eb: int, nlev: int, moist: bool = True,
                         interpret: bool = False):
    """Fused kernel on transposed [nlev, E16] arrays (rsplit>0 path).

    Returns (u1, v1, t1, dp1, phi, vn0u', vn0v', omega_p').
    """
    k, e16 = u0.shape
    eb16 = eb * NPSQ
    assert e16 % eb16 == 0, (e16, eb16)
    assert k == nlev
    nblocks = e16 // eb16
    f = jnp.float32

    fld = lambda: pl.BlockSpec((k, eb16), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((k, e16), f) for _ in range(8)]

    kernel = partial(
        _caar_kernel_t, not interpret, moist, CONSTANTS.Rgas, CONSTANTS.kappa,
        CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth, False, False, False,
        0, False,
    )
    flops_per_block = 13 * 2 * eb16 * eb16 * k + 3 * 2 * eb16 * k * k
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rep((eb16, eb16)), rep((eb16, eb16)),
            rep((k, k)), rep((k, k)), rep((k, k)),
            pl.BlockSpec((len(META_COLS), eb16), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            fld(), fld(), fld(), fld(),          # n0
            fld(), fld(), fld(), fld(),          # nm1
            fld(), fld(),                        # qdp, pecnd
            fld(), fld(), fld(),                 # accumulators
        ],
        out_specs=[fld() for _ in range(8)],
        out_shape=out_shape,
        input_output_aliases={17: 5, 18: 6, 19: 7},
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=(14 + 8) * e16 * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
      u0, v0, t0, dp0, um1, vm1, tm1, dpm1, qdp, pecnd, vn0u, vn0v, omg)


@partial(jax.jit, static_argnames=("eb", "nlev", "moist", "interpret"))
def caar_pallas_packed_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                          s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                          eb: int, nlev: int, moist: bool = True,
                          interpret: bool = False):
    """Stacked-state variant of caar_pallas_packed_t: the four prognostic
    fields ride in ONE [4*nlev, E16] buffer per time level (row blocks
    u/v/t/dp), and the output is likewise one stacked buffer — so the
    structured-DSS epilogue runs ONCE over the stacked array with no
    concat/split passes. Returns (s1, phi, vn0u', vn0v', omega_p')."""
    k4, e16 = s0.shape
    k = nlev
    assert k4 == 4 * k, (k4, k)
    eb16 = eb * NPSQ
    assert e16 % eb16 == 0, (e16, eb16)
    nblocks = e16 // eb16
    f = jnp.float32

    fld = lambda r: pl.BlockSpec((r, eb16), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = partial(
        _caar_kernel_t, not interpret, moist, CONSTANTS.Rgas,
        CONSTANTS.kappa, CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth,
        False, True, False, 0, False,
    )
    flops_per_block = 13 * 2 * eb16 * eb16 * k + 3 * 2 * eb16 * k * k
    out_shape = [jax.ShapeDtypeStruct((4 * k, e16), f),
                 jax.ShapeDtypeStruct((k, e16), f)] + [
        jax.ShapeDtypeStruct((k, e16), f) for _ in range(3)]
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rep((eb16, eb16)), rep((eb16, eb16)),
            rep((k, k)), rep((k, k)), rep((k, k)),
            pl.BlockSpec((len(META_COLS), eb16), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            fld(4 * k), fld(4 * k),              # s0, sm1 (stacked)
            fld(k), fld(k),                      # qdp, pecnd
            fld(k), fld(k), fld(k),              # accumulators
        ],
        out_specs=[fld(4 * k), fld(k), fld(k), fld(k), fld(k)],
        out_shape=out_shape,
        input_output_aliases={11: 2, 12: 3, 13: 4},
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=(14 + 8) * e16 * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
      s0, sm1, qdp, pecnd, vn0u, vn0v, omg)


def _caar_kernel_t4_lg(split, moist, rgas, kappa, rv_factor, rrearth,
                       single, lg, ext, cM, *refs):
    """Lane-grouped stacked kernel body: ``lg`` independent 128-lane
    groups per grid step. Each group runs the exact `_caar_physics`
    128-lane math (same MXU shapes, same fp-op order as the eb=8 kernel);
    only the grid length shrinks by lg. Built for the ne120 kernel-at-
    scale A/B (VERDICT r3 item 1): at 86,400 elements the eb=8 grid is
    10,800 steps, and per-grid-step fixed costs that are invisible at
    1,024 elements (128 steps) become measurable. With ``ext`` the
    kernel also emits the compact DSS slab per affected GROUP at static
    g*cM row offsets of its super-block slot (dss_pallas.cext_tables_lg)."""
    sf_ref = cq_ref = ext_ref = None
    refs = list(refs)
    if ext:
        sf_ref = refs.pop(0)
        cq_ref = refs.pop(0)
        ext_ref = refs.pop()
    refs = tuple(refs)
    if single:
        (scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref, bstrt_ref,
         meta_ref, s0_ref, qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref,
         s1_ref, phi_ref, vn0u_out, vn0v_out, omg_out) = refs
        sm1_ref = None
    else:
        (scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref, bstrt_ref,
         meta_ref, s0_ref, sm1_ref, qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref,
         s1_ref, phi_ref, vn0u_out, vn0v_out, omg_out) = refs
    f32 = jnp.float32
    eta = scal_ref[0, 1]
    k_ = s0_ref.shape[0] // 4
    dxbt = dxbt_ref[:]
    dybt = dybt_ref[:]
    ainct = ainct_ref[:]
    astrt = astrt_ref[:]
    bstrt = bstrt_ref[:]
    for g in range(lg):
        sl = slice(g * 128, (g + 1) * 128)

        def row(name, sl=sl):
            i = _MC[name]
            return meta_ref[i:i + 1, sl]

        u, v = s0_ref[0:k_, sl], s0_ref[k_:2 * k_, sl]
        t, dp = s0_ref[2 * k_:3 * k_, sl], s0_ref[3 * k_:4 * k_, sl]
        if single:
            um1x, vm1x, tm1x, dpm1x = u, v, t, dp
        else:
            um1x = sm1_ref[0:k_, sl].astype(f32)
            vm1x = sm1_ref[k_:2 * k_, sl].astype(f32)
            tm1x = sm1_ref[2 * k_:3 * k_, sl].astype(f32)
            dpm1x = sm1_ref[3 * k_:4 * k_, sl].astype(f32)
        (u1v, v1v, t1v, dp1v, phi, vdp1, vdp2,
         omega_p) = _caar_physics(
            split, moist, rgas, kappa, rv_factor, rrearth,
            scal_ref, dxbt, dybt, ainct, astrt, bstrt,
            row, u, v, t, dp, um1x, vm1x, tm1x, dpm1x,
            qdp_ref[:, sl], pecnd_ref[:, sl])
        s1_ref[0:k_, sl] = u1v
        s1_ref[k_:2 * k_, sl] = v1v
        s1_ref[2 * k_:3 * k_, sl] = t1v
        s1_ref[3 * k_:4 * k_, sl] = dp1v
        phi_ref[:, sl] = phi
        vn0u_out[:, sl] = vn0u_ref[:, sl] + eta * vdp1
        vn0v_out[:, sl] = vn0v_ref[:, sl] + eta * vdp2
        omg_out[:, sl] = omg_ref[:, sl] + eta * omega_p
        if ext:
            @pl.when(sf_ref[1 + g, pl.program_id(0)] == 1)
            def _write_slab(g=g, u1v=u1v, v1v=v1v, t1v=t1v, dp1v=dp1v):
                sel_l, _ = make_sel(split)
                q = cq_ref[g * cM:(g + 1) * cM]
                rsl = slice(g * cM, (g + 1) * cM)
                ext_ref[rsl, 0:k_] = sel_l(q, u1v.T)
                ext_ref[rsl, k_:2 * k_] = sel_l(q, v1v.T)
                ext_ref[rsl, 2 * k_:3 * k_] = sel_l(q, t1v.T)
                ext_ref[rsl, 3 * k_:4 * k_] = sel_l(q, dp1v.T)


@partial(jax.jit, static_argnames=("nlev", "moist", "lg", "single",
                                   "emit_phi", "nslots", "cM", "interpret"))
def caar_pallas_packed_t4_lg(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                             s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                             nlev: int, moist: bool = True, lg: int = 4,
                             single: bool = False, emit_phi: bool = True,
                             sf=None, cq=None, nslots: int = 0,
                             cM: int = 0, interpret: bool = False):
    """Lane-grouped `caar_pallas_packed_t4`: BlockSpec lane width
    128*lg, grid length e16/(128*lg). ``single=True`` is the RK-stage
    mode (sm1 ignored; pass s0 twice); ``emit_phi=False`` coalesces the
    phi output into one revisited block (RK stages 1-2 never read phi).
    With ``sf``/``cq``/``nslots``/``cM`` (dss_pallas.cext_tables_lg) the
    kernel also emits the COMPACT DSS slab [nslots*lg*cM, 4*nlev] as a
    super-block-slot-mapped extra output (per-group pl.when writes at
    static g*cM offsets) — consumed by dss_structured_t_pallas_cpre with
    lg=lg. Requires e16 % (128*lg) == 0."""
    k4, e16 = s0.shape
    k = nlev
    assert k4 == 4 * k, (k4, k)
    w = 128 * lg
    assert e16 % w == 0, (e16, w)
    nblocks = e16 // w
    f = jnp.float32
    ext = sf is not None
    if ext:
        assert sf.shape == (1 + lg, nblocks), (sf.shape, lg, nblocks)
        fld = lambda r: pl.BlockSpec((r, w), lambda i, sf: (0, i),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), w), lambda i, sf: (0, i),
                                 memory_space=pltpu.VMEM)
    else:
        fld = lambda r: pl.BlockSpec((r, w), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), w), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    kernel = partial(
        _caar_kernel_t4_lg, not interpret, moist, CONSTANTS.Rgas,
        CONSTANTS.kappa, CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth,
        single, lg, ext, cM if ext else 0,
    )
    flops_per_block = lg * (13 * 2 * 128 * 128 * k + 3 * 2 * 128 * k * k)
    if emit_phi:
        phi_spec = fld(k)
        phi_shape = jax.ShapeDtypeStruct((k, e16), f)
    else:
        # all grid steps revisit block (0, 0): one flush of w lanes
        phi_spec = rep((k, w))
        phi_shape = jax.ShapeDtypeStruct((k, w), f)
    out_shape = [jax.ShapeDtypeStruct((4 * k, e16), f), phi_shape] + [
        jax.ShapeDtypeStruct((k, e16), f) for _ in range(3)]
    out_specs = [fld(4 * k), phi_spec, fld(k), fld(k), fld(k)]
    in_specs = [
        smem,
        rep((128, 128)), rep((128, 128)),
        rep((k, k)), rep((k, k)), rep((k, k)),
        meta_spec,
        fld(4 * k),                          # s0
        fld(k), fld(k),                      # qdp, pecnd
        fld(k), fld(k), fld(k),              # accumulators
    ]
    operands = [scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, qdp, pecnd, vn0u, vn0v, omg]
    aliases = {10: 2, 11: 3, 12: 4}
    nbytes = (10 + 8) * e16 * k * 4
    if not single:
        in_specs.insert(8, fld(4 * k))       # sm1
        operands.insert(8, sm1)
        aliases = {11: 2, 12: 3, 13: 4}
        nbytes = (14 + 8) * e16 * k * 4
    if ext:
        in_specs.insert(0, pl.BlockSpec(
            (lg * cM, 128), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        operands = [sf, cq] + operands
        out_specs.append(pl.BlockSpec(
            (lg * cM, 4 * k), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((nslots * lg * cM, 4 * k), f))
        # sf + cq prepend two flat operands before the aliased ones
        aliases = {ix + 2: o for ix, o in aliases.items()}
        nbytes += nslots * lg * cM * 4 * k * 4
        grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblocks,),
            in_specs=in_specs, out_specs=out_specs))
    else:
        grid_kw = dict(grid=(nblocks,), in_specs=in_specs,
                       out_specs=out_specs)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
        **grid_kw,
    )(*operands)


@partial(jax.jit, static_argnames=("nt", "nlev", "moist", "cM", "interpret"))
def caar_pallas_packed_t4_ext(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                              s0, sm1, qdp, pecnd, vn0u, vn0v, omg, sf,
                              nt: int, nlev: int, moist: bool = True,
                              cq=None, cM: int = 0,
                              interpret: bool = False):
    """`caar_pallas_packed_t4` with PRODUCER-FUSED tile extraction for the
    structured-DSS epilogue: ``sf`` is the [2, nblocks] slot/flag table
    from kernels.dss_pallas.ext_slot_arrays (scalar prefetch) and the
    kernel emits a sixth output — the affected 128-lane tiles of s1,
    transposed, in gtiles order ([nt*128, 4*nlev]) — which feeds
    dss_structured_t_pallas_pre directly. Saves the separate
    extract_tiles_t dispatch and its read pass of ~38% of the field.
    With ``cq``/``cM`` (from kernels.dss_pallas.cext_tables) the slab is
    COMPACT [nt*cM, 4*nlev]: only each tile's fix lanes, selected with an
    exact one-hot contraction — feeds dss_structured_t_pallas_cpre.
    The lane grid is fixed at 128-lane blocks (elem_block == 8); requires
    e16 % 128 == 0 (even cubed-sphere ne). Returns
    (s1, phi, vn0u', vn0v', omega_p', xd_t)."""
    k4, e16 = s0.shape
    k = nlev
    assert k4 == 4 * k, (k4, k)
    assert e16 % 128 == 0, e16
    nblocks = e16 // 128
    assert sf.shape == (2, nblocks), (sf.shape, nblocks)
    f = jnp.float32
    eb16 = 128
    srows = cM if cM else 128

    fld = lambda r: pl.BlockSpec((r, eb16), lambda i, sf: (0, i),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = partial(
        _caar_kernel_t, not interpret, moist, CONSTANTS.Rgas,
        CONSTANTS.kappa, CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth,
        False, True, True, cM, False,
    )
    flops_per_block = 13 * 2 * eb16 * eb16 * k + 3 * 2 * eb16 * k * k
    out_shape = [jax.ShapeDtypeStruct((4 * k, e16), f),
                 jax.ShapeDtypeStruct((k, e16), f)] + [
        jax.ShapeDtypeStruct((k, e16), f) for _ in range(3)] + [
        jax.ShapeDtypeStruct((nt * srows, 4 * k), f)]
    in_specs = [
        pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                     memory_space=pltpu.SMEM),
        rep((eb16, eb16)), rep((eb16, eb16)),
        rep((k, k)), rep((k, k)), rep((k, k)),
        pl.BlockSpec((len(META_COLS), eb16), lambda i, sf: (0, i),
                     memory_space=pltpu.VMEM),
        fld(4 * k), fld(4 * k),              # s0, sm1 (stacked)
        fld(k), fld(k),                      # qdp, pecnd
        fld(k), fld(k), fld(k),              # accumulators
    ]
    operands = [sf, scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg]
    # operand indices in aliases include the scalar-prefetch arg
    # (pallas_call validates against the FLAT input list)
    aliases = {12: 2, 13: 3, 14: 4}
    if cM:
        in_specs.insert(0, pl.BlockSpec(
            (cM, 128), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        operands.insert(1, cq)
        aliases = {13: 2, 14: 3, 15: 4}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[fld(4 * k), fld(k), fld(k), fld(k), fld(k),
                   pl.BlockSpec((srows, 4 * k), lambda i, sf: (sf[0, i], 0),
                                memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=(14 + 8) * e16 * k * 4 + nt * srows * 4 * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@partial(jax.jit, static_argnames=("nt", "eb", "nlev", "moist", "emit_phi",
                                   "cM", "interpret"))
def caar_pallas_packed_t4_rk(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                             s, qdp, pecnd, vn0u, vn0v, omg, sf=None,
                             nt: int = 0, eb: int = 8, nlev: int = 72,
                             moist: bool = True, emit_phi: bool = True,
                             cq=None, cM: int = 0,
                             interpret: bool = False):
    """RK-stage variant of `caar_pallas_packed_t4`: the evaluation and
    base states are the SAME array in every SSPRK3 stage (U + dt L(U)), so
    this kernel takes ONE stacked state operand — the generic pair kernel
    fetches the identical 4*nlev-row buffer twice from HBM per block.
    With ``sf`` (slot/flag table from kernels.dss_pallas.ext_slot_arrays)
    it also emits the producer-fused extraction slab (requires
    e16 % 128 == 0; the lane grid is then fixed at 128-lane blocks and
    ``eb`` is ignored). ``emit_phi=False`` coalesces the phi output into
    one revisited 128-lane block (the RK stages 1-2 never read phi — only
    the last stage's survives, timeloop/rk.py semantics), saving a full
    field write. ``cq``/``cM`` (kernels.dss_pallas.cext_tables) switch
    the slab to the COMPACT fix-lane layout [nt*cM, 4*nlev] for
    dss_structured_t_pallas_cpre. Returns
    (s1, phi, vn0u', vn0v', omega_p'[, xd_t])."""
    k4, e16 = s.shape
    k = nlev
    assert k4 == 4 * k, (k4, k)
    ext = sf is not None
    eb16 = 128 if ext else eb * NPSQ
    assert e16 % eb16 == 0, (e16, eb16)
    nblocks = e16 // eb16
    if ext:
        assert sf.shape == (2, nblocks), (sf.shape, nblocks)
    f = jnp.float32

    if ext:
        fld = lambda r: pl.BlockSpec((r, eb16), lambda i, sf: (0, i),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), eb16),
                                 lambda i, sf: (0, i),
                                 memory_space=pltpu.VMEM)
    else:
        fld = lambda r: pl.BlockSpec((r, eb16), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), eb16), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)

    kernel = partial(
        _caar_kernel_t, not interpret, moist, CONSTANTS.Rgas,
        CONSTANTS.kappa, CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth,
        False, True, ext, cM if ext else 0, True,
    )
    flops_per_block = 13 * 2 * eb16 * eb16 * k + 3 * 2 * eb16 * k * k
    in_specs = [
        smem,
        rep((eb16, eb16)), rep((eb16, eb16)),
        rep((k, k)), rep((k, k)), rep((k, k)),
        meta_spec,
        fld(4 * k),                          # s (single state)
        fld(k), fld(k),                      # qdp, pecnd
        fld(k), fld(k), fld(k),              # accumulators
    ]
    if emit_phi:
        phi_spec = fld(k)
        phi_shape = jax.ShapeDtypeStruct((k, e16), f)
    else:
        # all grid steps revisit block (0, 0): one flush of 128 lanes
        phi_spec = rep((k, eb16))
        phi_shape = jax.ShapeDtypeStruct((k, eb16), f)
    out_specs = [fld(4 * k), phi_spec, fld(k), fld(k), fld(k)]
    out_shape = [jax.ShapeDtypeStruct((4 * k, e16), f), phi_shape] + [
        jax.ShapeDtypeStruct((k, e16), f) for _ in range(3)]
    operands = [scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s, qdp, pecnd, vn0u, vn0v, omg]
    bytes_accessed = (10 + 8) * e16 * k * 4
    if ext:
        srows = cM if cM else 128
        out_specs.append(
            pl.BlockSpec((srows, 4 * k), lambda i, sf: (sf[0, i], 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nt * srows, 4 * k), f))
        bytes_accessed += nt * srows * 4 * k * 4
        operands = [sf] + operands
        aliases = {11: 2, 12: 3, 13: 4}
        if cM:
            in_specs.insert(0, pl.BlockSpec(
                (cM, 128), lambda i, sf: (sf[0, i], 0),
                memory_space=pltpu.VMEM))
            operands.insert(1, cq)
            aliases = {12: 2, 13: 3, 14: 4}
        grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblocks,),
            in_specs=in_specs, out_specs=out_specs))
    else:
        grid_kw = dict(grid=(nblocks,), in_specs=in_specs,
                       out_specs=out_specs)
        aliases = {10: 2, 11: 3, 12: 4}
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        interpret=interpret,
        **grid_kw,
    )(*operands)


@partial(jax.jit, static_argnames=("eb", "nlev", "moist", "interpret"))
def caar_pallas_packed_rsplit0_t(scal, dxbt, dybt, ainct, astrt, bstrt,
                                 hyb, meta,
                                 u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
                                 qdp, pecnd, vn0u, vn0v, omg, etaacc,
                                 eb: int, nlev: int, moist: bool = True,
                                 interpret: bool = False):
    """rsplit=0 (full eta-coordinate) transposed variant. ``hyb`` is
    [nlev, 2] with column 0 = hybi[k], column 1 = hybi[k+1]."""
    k, e16 = u0.shape
    eb16 = eb * NPSQ
    assert e16 % eb16 == 0, (e16, eb16)
    nblocks = e16 // eb16
    f = jnp.float32

    fld = lambda: pl.BlockSpec((k, eb16), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = partial(
        _caar_kernel_t, not interpret, moist, CONSTANTS.Rgas, CONSTANTS.kappa,
        CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth, True, False, False,
        0, False,
    )
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rep((eb16, eb16)), rep((eb16, eb16)),
            rep((k, k)), rep((k, k)), rep((k, k)),
            rep((k, 2)),                         # hybi columns
            pl.BlockSpec((len(META_COLS), eb16), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            fld(), fld(), fld(), fld(),          # n0
            fld(), fld(), fld(), fld(),          # nm1
            fld(), fld(),                        # qdp, pecnd
            fld(), fld(), fld(), fld(),          # accumulators (+etaacc)
        ],
        out_specs=[fld() for _ in range(9)],
        out_shape=[jax.ShapeDtypeStruct((k, e16), f) for _ in range(9)],
        input_output_aliases={18: 5, 19: 6, 20: 7, 21: 8},
        interpret=interpret,
    )(scal, dxbt, dybt, ainct, astrt, bstrt, hyb, meta,
      u0, v0, t0, dp0, um1, vm1, tm1, dpm1, qdp, pecnd,
      vn0u, vn0v, omg, etaacc)


def pack_problem_t(state: State, derived: Derived, geom: Geometry,
                   hv: HybridVCoord, cfg: Config, dtype=jnp.float32,
                   storage: str = "f32"):
    """Pack into the transposed kernel layout (same contract/storage options
    as caar_pallas.pack_problem; see that docstring for the bf16 modes)."""
    assert storage in ("f32", "bf16_aux", "bf16_ro"), storage
    eb = cfg.elem_block
    f = lambda x: jnp.asarray(x, dtype)
    aux = (lambda x: jnp.asarray(x, jnp.bfloat16)) if storage != "f32" else f
    ro = (lambda x: jnp.asarray(x, jnp.bfloat16)) if storage == "bf16_ro" \
        else f
    dxb, dyb = block_derivative_ops(eb, geom.dvv, np.float32)
    ainc, astr, bstr = scan_matrices(cfg.nlev, np.float32)
    meta = pack_meta_t(geom, state.phis, dtype)
    n0, nm1, qn0 = cfg.n0, cfg.nm1, cfg.qn0
    return dict(
        dxbt=f(dxb).T, dybt=f(dyb).T,
        ainct=f(ainc.T), astrt=f(astr.T), bstrt=f(bstr.T),
        meta=f(meta),
        u0=pack_field_t(f(state.u[n0])), v0=pack_field_t(f(state.v[n0])),
        t0=pack_field_t(f(state.t[n0])), dp0=pack_field_t(f(state.dp3d[n0])),
        um1=pack_field_t(ro(state.u[nm1])),
        vm1=pack_field_t(ro(state.v[nm1])),
        tm1=pack_field_t(ro(state.t[nm1])),
        dpm1=pack_field_t(ro(state.dp3d[nm1])),
        qdp=pack_field_t(aux(state.qdp[qn0, :, 0])),
        pecnd=pack_field_t(aux(derived.pecnd)),
        vn0u=pack_field_t(f(derived.vn0_u)),
        vn0v=pack_field_t(f(derived.vn0_v)),
        omg=pack_field_t(f(derived.omega_p)),
    )


def _scalars(dt2, eta_ave_w, hv, dtype=jnp.float32):
    return jnp.stack([
        jnp.asarray(dt2, dtype), jnp.asarray(eta_ave_w, dtype),
        jnp.asarray(hv.hyai[0] * hv.ps0, dtype), jnp.zeros((), dtype),
    ]).reshape(1, 4)


def caar_pallas_t(state: State, derived: Derived, geom: Geometry,
                  hv: HybridVCoord, cfg: Config, dt2, eta_ave_w,
                  moist: bool = True, interpret: bool = False,
                  storage: str = "f32"):
    """Full-state wrapper with the same contract as kernels.caar_xla /
    kernels.caar_pallas, on the transposed layout. cfg.rsplit=0 dispatches
    the full eta-coordinate kernel variant."""
    p = pack_problem_t(state, derived, geom, hv, cfg, storage=storage)
    scal = _scalars(dt2, eta_ave_w, hv)
    common = (scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"])
    fields = (p["u0"], p["v0"], p["t0"], p["dp0"],
              p["um1"], p["vm1"], p["tm1"], p["dpm1"],
              p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])
    eta_new = None
    if cfg.rsplit > 0:
        u1, v1, t1, dp1, phi, vn0u, vn0v, omg = caar_pallas_packed_t(
            *common, p["meta"], *fields,
            eb=cfg.elem_block, nlev=cfg.nlev, moist=moist,
            interpret=interpret,
        )
    else:
        hyb = jnp.stack([
            jnp.asarray(hv.hybi[: cfg.nlev], jnp.float32),
            jnp.asarray(hv.hybi[1: cfg.nlev + 1], jnp.float32),
        ], axis=1)
        etaacc = pack_field_t(
            jnp.asarray(derived.eta_dot_dpdn, jnp.float32)[:, 1:]
        )
        (u1, v1, t1, dp1, phi, vn0u, vn0v, omg,
         eta_new) = caar_pallas_packed_rsplit0_t(
            *common, hyb, p["meta"], *fields, etaacc,
            eb=cfg.elem_block, nlev=cfg.nlev, moist=moist,
            interpret=interpret,
        )
    ne = cfg.nelem
    np1 = cfg.np1
    f = lambda x: jnp.asarray(x, u1.dtype)
    new_state = dataclasses.replace(
        state,
        u=f(state.u).at[np1].set(unpack_field_t(u1, ne)),
        v=f(state.v).at[np1].set(unpack_field_t(v1, ne)),
        t=f(state.t).at[np1].set(unpack_field_t(t1, ne)),
        dp3d=f(state.dp3d).at[np1].set(unpack_field_t(dp1, ne)),
    )
    new_derived = dataclasses.replace(
        derived,
        vn0_u=unpack_field_t(vn0u, ne), vn0_v=unpack_field_t(vn0v, ne),
        phi=unpack_field_t(phi, ne), omega_p=unpack_field_t(omg, ne),
    )
    if eta_new is not None:
        old = jnp.asarray(derived.eta_dot_dpdn, u1.dtype)
        new_derived = dataclasses.replace(
            new_derived,
            eta_dot_dpdn=jnp.concatenate(
                [old[:, :1], unpack_field_t(eta_new, ne)], axis=1
            ),
        )
    return new_state, new_derived


def random_packed_problem_t(cfg: Config, seed: int = 1,
                            geom: Geometry | None = None):
    """Benchmark-only: generate the packed transposed problem dict DIRECTLY
    on device at [nlev, E16] — never materializes the unpacked [tl, nelem,
    nlev, 4, 4] state. This is what makes the ne120-class grid (86,400
    elements, BASELINE.md) fit one chip: the padded row layout costs 1.78x
    HBM on every field, and skipping the unpacked state saves another ~8 GB.
    Distributions mirror state.random_state_device (positive dp3d, O(1)
    metric terms). Pass ``geom`` (e.g. a real cubed sphere) to use its
    metric terms instead of random ones — required for an assembled
    (DSS) benchmark, where rspheremp/spheremp must be consistent."""
    e16 = cfg.nelem * NPSQ
    k = cfg.nlev
    ks = jax.random.split(jax.random.PRNGKey(seed), 16)
    u = lambda key, lo, hi, sh: jax.random.uniform(
        key, sh, jnp.float32, minval=lo, maxval=hi)
    fld = lambda key, lo, hi: u(key, lo, hi, (k, e16))

    dxb, dyb = block_derivative_ops(cfg.elem_block, _dvv_f32(), np.float32)
    ainc, astr, bstr = scan_matrices(k, np.float32)

    if geom is not None:
        met = jnp.asarray(pack_meta_t(
            geom, np.zeros((cfg.nelem, 4, 4), np.float32), np.float32))
    else:
        # meta: O(1) well-conditioned metric terms (throughput benchmarking)
        met = u(ks[0], 0.5, 1.5, (len(META_COLS), e16))
        met = met.at[_MC["rmetdet"]].set(1.0 / met[_MC["metdet"]])
        met = met.at[_MC["pad1"]:].set(0.0)

    return dict(
        dxbt=jnp.asarray(dxb).T, dybt=jnp.asarray(dyb).T,
        ainct=jnp.asarray(ainc.T), astrt=jnp.asarray(astr.T),
        bstrt=jnp.asarray(bstr.T),
        meta=met,
        u0=fld(ks[1], -1, 1), v0=fld(ks[2], -1, 1),
        t0=fld(ks[3], 250, 300), dp0=fld(ks[4], 10, 20),
        um1=fld(ks[5], -1, 1), vm1=fld(ks[6], -1, 1),
        tm1=fld(ks[7], 250, 300), dpm1=fld(ks[8], 10, 20),
        qdp=fld(ks[9], 0, 1), pecnd=fld(ks[10], 0, 1),
        vn0u=jnp.zeros((k, e16), jnp.float32),
        vn0v=jnp.zeros((k, e16), jnp.float32),
        omg=jnp.zeros((k, e16), jnp.float32),
    )


def _dvv_f32():
    from ..grid import dvv_matrix

    return dvv_matrix(np.float32)


# -- production leapfrog loop on the transposed layout ------------------------

_LF_NAMES = ("u", "v", "t", "dp3d")


@jax.jit
def _pack_state_bufs_t(u, v, t, dp3d):
    """All 12 time-level packs in ONE dispatch (eager ops through the
    remote-TPU tunnel cost ~30 ms latency each)."""
    pk = lambda x: pack_field_t(jnp.asarray(x, jnp.float32))
    return {
        n: tuple(pk(arr[tl]) for tl in range(3))
        for n, arr in zip(_LF_NAMES, (u, v, t, dp3d))
    }


@partial(jax.jit, static_argnames=("nelem",))
def _unpack_all_t(bufs, acc, phi, nelem):
    un = lambda x: unpack_field_t(x, nelem)
    stacked = {
        n: jnp.stack([un(bufs[n][tl]) for tl in range(3)]) for n in _LF_NAMES
    }
    return stacked, (un(acc[0]), un(acc[1]), un(acc[2]), un(phi))


def _leapfrog_step_t(scal, const, fixed, carry, c, moist, interpret=False):
    """One transposed packed CAAR call at time-level phase ``c``."""
    bufs, acc, _ = carry
    out = caar_pallas_packed_t(
        scal, *const,
        *(bufs[n][c.n0] for n in _LF_NAMES),
        *(bufs[n][c.nm1] for n in _LF_NAMES),
        *fixed, *acc,
        eb=c.elem_block, nlev=c.nlev, moist=moist, interpret=interpret,
    )
    bufs = {
        n: tuple(out[i] if tl == c.np1 else bufs[n][tl] for tl in range(3))
        for i, n in enumerate(_LF_NAMES)
    }
    return bufs, (out[5], out[6], out[7]), out[4]


from functools import lru_cache


@lru_cache(maxsize=None)
def _leapfrog_cycle_t(cycle: int, phase, eb: int, nlev: int, moist: bool):
    from ..timeloop.driver import rotated

    c0 = Config(n0=phase[0], np1=phase[1], nm1=phase[2],
                elem_block=eb, nlev=nlev)

    @jax.jit
    def multi(scal, const, fixed, carry):
        c = c0
        for _ in range(cycle):
            carry = _leapfrog_step_t(scal, const, fixed, carry, c, moist)
            c = rotated(c)
        return carry

    return multi


_pack_problem_t_jit = partial(jax.jit,
                              static_argnames=("cfg", "dtype", "storage"))(
    pack_problem_t
)


def run_leapfrog_pallas_t(state: State, derived: Derived, geom: Geometry,
                          hv: HybridVCoord, cfg: Config, nsteps: int,
                          moist: bool = True, interpret: bool = False,
                          chunk: int = 6):
    """Transposed-layout production leapfrog loop — the contract of
    kernels.caar_pallas.run_leapfrog_pallas (pack once, rotate packed buffer
    triples, unpack once) on the padding-free [nlev, E16] layout."""
    from ..timeloop.driver import rotated

    if cfg.rsplit <= 0:
        raise NotImplementedError(
            "the packed leapfrog loop supports only rsplit > 0; call "
            "caar_pallas_t/caar_xla for the rsplit=0 path"
        )
    dt2 = jnp.float32(2.0 * cfg.dt)
    eta = jnp.float32(1.0 / max(nsteps, 1))
    p = _pack_problem_t_jit(state, derived, geom, hv, cfg)
    scal = _scalars(dt2, eta, hv)
    const = (p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
             p["meta"])
    fixed = (p["qdp"], p["pecnd"])
    acc = (p["vn0u"], p["vn0v"], p["omg"])

    c = cfg
    bufs = _pack_state_bufs_t(state.u, state.v, state.t, state.dp3d)
    phi = p["vn0u"]  # placeholder, overwritten by the first step

    cycle = 3 * max(1, chunk // 3)
    carry = (bufs, acc, phi)
    if interpret or nsteps < cycle:
        for _ in range(nsteps):
            carry = _leapfrog_step_t(scal, const, fixed, carry, c, moist,
                                     interpret)
            c = rotated(c)
    else:
        multi = _leapfrog_cycle_t(cycle, (c.n0, c.np1, c.nm1), c.elem_block,
                                  c.nlev, moist)
        done = 0
        while done + cycle <= nsteps:
            carry = multi(scal, const, fixed, carry)
            done += cycle
        for _ in range(nsteps - done):
            carry = _leapfrog_step_t(scal, const, fixed, carry, c, moist,
                                     interpret)
            c = rotated(c)
    bufs, acc, phi = carry

    stacked, (vn0u, vn0v, omg, phi_u) = _unpack_all_t(bufs, acc, phi,
                                                      nelem=cfg.nelem)
    new_state = dataclasses.replace(
        state,
        u=stacked["u"], v=stacked["v"], t=stacked["t"], dp3d=stacked["dp3d"],
    )
    new_derived = dataclasses.replace(
        derived, vn0_u=vn0u, vn0_v=vn0v, omega_p=omg, phi=phi_u,
    )
    return new_state, new_derived, c
