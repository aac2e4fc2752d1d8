"""Fused-kernel distributed step: Pallas CAAR + DSS on the packed layout.

The packed layout ([e*16 + gll, k], kernels/layout.py) is exactly dof-major,
so DSS composes with the fused kernel without any unpacking: a segment-sum
over rows with the flattened gdof map, then a row gather — the np1 fields
never leave the packed layout. This is the fast path for the ne30-class
"CAAR + halo exchange" configuration (BASELINE.md).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..grid import Geometry, HybridVCoord
from ..kernels.caar_pallas import _scalars, caar_pallas_packed, pack_problem
from ..state import Derived, State

__all__ = ["dss_scaled_packed", "caar_dss_pallas_packed", "make_packed_dss",
           "caar_dss_structured_packed", "caar_dss_structured_packed_t",
           "caar_dss_structured_packed_t4", "ssprk3_packed_t4",
           "apply_hypervis_packed_t", "ssprk3_tracer_packed_t",
           "prim_step_packed_t4", "caar_dss_ring_t4", "ssprk3_ring_t4",
           "ssprk3_tracer_ring_t"]


def make_packed_dss(gdof, rspheremp):
    """Precompute the packed-layout DSS operands: an alias table
    [e*16, 4] (rows sharing each dof; GLL dofs have at most 4 aliases —
    in-face element corners; pad = e*16, a zero row) and rspheremp rows.

    TPU scatters (segment_sum) are ~13x slower than row gathers at ne30
    scale, so single-chip DSS is formulated gather-only:
        DSS(x)[r] = sum_m x_ext[alias[r, m]].
    """
    from collections import defaultdict

    import numpy as np

    rows = np.asarray(gdof).reshape(-1)
    e16 = rows.size
    rows_of = defaultdict(list)
    for r, d in enumerate(rows):
        rows_of[d].append(r)
    alias = np.empty((e16, 4), np.int32)
    overcount = np.empty((e16, 1), np.float32)
    for r, d in enumerate(rows):
        rs = rows_of[d]
        alias[r, : len(rs)] = rs
        alias[r, len(rs):] = r          # pad with own row, corrected below
        overcount[r] = 4 - len(rs)
    rsp = np.asarray(rspheremp).reshape(-1, 1)
    # fold the overcount correction into precomputed per-row coefficients:
    # DSS(x)[r] = sum_m x[alias[r, m]] - overcount[r] * x[r]
    return jnp.asarray(alias), (jnp.asarray(rsp, jnp.float32),
                                jnp.asarray(overcount))


@partial(jax.jit, static_argnames=("ndof",))
def dss_scaled_packed(x, alias, rsp_rows, ndof: int):
    """rspheremp * DSS(x) for packed [e*16, k] arrays (gather-only; TPU
    scatters are ~13x slower than row gathers at ne30 scale)."""
    rsp, overcount = rsp_rows
    summed = (jnp.take(x, alias[:, 0], axis=0)
              + jnp.take(x, alias[:, 1], axis=0)
              + jnp.take(x, alias[:, 2], axis=0)
              + jnp.take(x, alias[:, 3], axis=0)
              - overcount * x)
    return rsp * summed


@partial(jax.jit,
         static_argnames=("eb", "nlev", "ndof", "moist", "interpret"))
def caar_dss_pallas_packed(scal, dxb, dyb, ainc, astr, bstr, meta,
                           u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
                           qdp, pecnd, vn0u, vn0v, omg,
                           gdof_rows, rsp_rows,
                           eb: int, nlev: int, ndof: int,
                           moist: bool = True, interpret: bool = False):
    """Fused CAAR kernel + packed DSS assembly of the np1 fields.

    Same signature/returns as caar_pallas_packed plus the DSS operands."""
    o = caar_pallas_packed(scal, dxb, dyb, ainc, astr, bstr, meta,
                           u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
                           qdp, pecnd, vn0u, vn0v, omg,
                           eb=eb, nlev=nlev, moist=moist,
                           interpret=interpret)
    assembled = tuple(
        dss_scaled_packed(o[i], gdof_rows, rsp_rows, ndof) for i in range(4)
    )
    return assembled + o[4:]


@partial(jax.jit, static_argnames=("eb", "nlev", "plan", "moist",
                                   "interpret", "chunks", "stack_dss"))
def caar_dss_structured_packed(scal, dxb, dyb, ainc, astr, bstr, meta,
                               u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
                               qdp, pecnd, vn0u, vn0v, omg,
                               plan, rsp_rows,
                               eb: int, nlev: int,
                               moist: bool = True, interpret: bool = False,
                               chunks: int = 1, stack_dss: bool = True):
    """Fused CAAR kernel + STRUCTURED (gather-free) DSS epilogue — the
    headline assembled-step fast path (see dist/structured_dss.py).

    ``chunks`` > 1 pre-slices the element grid into that many row groups and
    dispatches one pallas_call per group (the long-grid pipeline pathology:
    5x1080-element calls measured ~30% faster than 1x5400 at ne30).
    ``stack_dss`` runs one DSS over the four np1 fields concatenated on the
    lane axis instead of four separate sweeps."""
    from .structured_dss import dss_structured, dss_structured_scaled

    e16 = u0.shape[0]
    assert e16 % (chunks * eb * 16) == 0, (e16, chunks, eb)
    rows = e16 // chunks

    def run(sl):
        return caar_pallas_packed(
            scal, dxb, dyb, ainc, astr, bstr, meta[sl],
            u0[sl], v0[sl], t0[sl], dp0[sl],
            um1[sl], vm1[sl], tm1[sl], dpm1[sl],
            qdp[sl], pecnd[sl], vn0u[sl], vn0v[sl], omg[sl],
            eb=eb, nlev=nlev, moist=moist, interpret=interpret)

    if chunks == 1:
        o = run(slice(None))
    else:
        parts = [run(slice(c * rows, (c + 1) * rows)) for c in range(chunks)]
        o = tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                  for i in range(8))

    if stack_dss:
        stacked = jnp.concatenate(o[:4], axis=1)            # [E16, 4*nlev]
        assembled_all = rsp_rows * dss_structured(stacked, plan)
        assembled = tuple(assembled_all[:, i * nlev:(i + 1) * nlev]
                          for i in range(4))
    else:
        assembled = tuple(
            dss_structured_scaled(o[i], plan, rsp_rows) for i in range(4)
        )
    return assembled + o[4:]


@partial(jax.jit, static_argnames=("eb", "nlev", "plan", "moist",
                                   "interpret", "stack_dss", "impl"))
def caar_dss_structured_packed_t(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                                 u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
                                 qdp, pecnd, vn0u, vn0v, omg,
                                 plan, rsp_lanes,
                                 eb: int, nlev: int,
                                 moist: bool = True, interpret: bool = False,
                                 stack_dss: bool | None = None,
                                 impl: str = "pallas"):
    """Transposed-layout assembled step: padding-free fused kernel
    (kernels/caar_pallas_t.py) + structured DSS on [nlev, E16] arrays.
    No grid chunking — the transposed kernel has no long-grid pathology.
    ``stack_dss`` concatenates the four np1 fields on the SUBLANE axis so
    one sweep pass assembles all four — a win for the XLA engines (fewer
    launches) but a LOSS for "pallas" (the concat+split cost two full
    passes; measured 3897 vs 3306 us/step at ne30); default is per-impl.
    ``impl`` selects the DSS engine: "pallas" (sweep kernel +
    one-gather/one-scatter fixup, the fast path), "slice" (XLA strided
    slice-updates), "roll" (XLA masked lane rolls)."""
    from ..kernels.caar_pallas_t import caar_pallas_packed_t
    from ..kernels.dss_pallas import dss_structured_t_pallas
    from .structured_dss import (
        apply_rsp_t, dss_structured_t, dss_structured_t_roll,
    )

    o = caar_pallas_packed_t(
        scal, dxbt, dybt, ainct, astrt, bstrt, meta,
        u0, v0, t0, dp0, um1, vm1, tm1, dpm1,
        qdp, pecnd, vn0u, vn0v, omg,
        eb=eb, nlev=nlev, moist=moist, interpret=interpret)

    assert impl in ("pallas", "slice", "roll"), impl
    if stack_dss is None:
        stack_dss = impl != "pallas"
    if impl == "pallas":
        dss = lambda x, p: dss_structured_t_pallas(x, p, rsp_lanes,
                                                   interpret=interpret)
    elif impl == "roll":
        dss = lambda x, p: apply_rsp_t(rsp_lanes, dss_structured_t_roll(x, p))
    else:
        dss = lambda x, p: apply_rsp_t(rsp_lanes, dss_structured_t(x, p))
    if stack_dss:
        stacked = jnp.concatenate(o[:4], axis=0)            # [4*nlev, E16]
        assembled_all = dss(stacked, plan)
        assembled = tuple(assembled_all[i * nlev:(i + 1) * nlev]
                          for i in range(4))
    else:
        assembled = tuple(dss(o[i], plan) for i in range(4))
    return assembled + o[4:]


@partial(jax.jit, static_argnames=("eb", "nlev", "plan", "moist", "vdt",
                                   "fuse_extract", "compact", "lg",
                                   "interpret"))
def caar_dss_structured_packed_t4(scal, dxbt, dybt, ainct, astrt, bstrt,
                                  meta, s0, sm1, qdp, pecnd,
                                  vn0u, vn0v, omg, plan, rsp_lanes,
                                  eb: int, nlev: int, moist: bool = True,
                                  vdt: bool = False,
                                  fuse_extract: bool = True,
                                  compact: bool = True,
                                  lg: int = 0,
                                  interpret: bool = False):
    """Stacked-state assembled step: the four prognostics ride in ONE
    [4*nlev, E16] buffer per time level (kernels.caar_pallas_t.
    caar_pallas_packed_t4), so the Pallas DSS runs ONCE over the stacked
    kernel output with no concat/split passes. With ``fuse_extract``
    (default, requires elem_block == 8 and e16 % 128 == 0 — even ne) the
    CAAR kernel itself emits the DSS fixup's transposed affected-tile slab
    as a slot-mapped extra output, eliminating the separate extract_tiles_t
    dispatch; ``compact`` (default) additionally switches the slab and the
    fixup vals buffer to the COMPACT fix-lane layout (~3.2x less epilogue
    side-traffic; kernels/dss_pallas.py::_compact_arrays). Returns
    (s1_assembled, phi, vn0u', vn0v', omega_p')."""
    from ..kernels.caar_pallas_t import (
        caar_pallas_packed_t4, caar_pallas_packed_t4_ext,
    )
    from ..kernels.dss_pallas import (
        cext_tables, dss_structured_t_pallas, dss_structured_t_pallas_cpre,
        dss_structured_t_pallas_pre, ext_slot_arrays,
    )

    from ..fastpath import fused_admissible, note_compact

    e16 = s0.shape[1]
    if lg > 1:
        # LANE-GROUPED kernel: at ne120 the eb=8 grid's 10,800 steps cost
        # ~0.42 us each in per-step overhead (measured: 17.7 -> 12.9
        # ms/step at lg=8, BENCH_LOCAL ne120_kernel_ab_r4_c10)
        from ..fastpath import last_path
        from ..kernels.caar_pallas_t import caar_pallas_packed_t4_lg
        from ..kernels.dss_pallas import (
            cext_tables_lg, dss_structured_t_pallas_cpre,
        )

        last_path["caar_dss_structured_packed_t4"] = f"fused-lg{lg}-compact"
        assert e16 % (128 * lg) == 0, (e16, lg)
        # producer-fused super-block slab (cext_tables_lg): the kernel
        # emits the compact fixup slab itself — no separate extraction
        # dispatch and no re-read of the affected tiles
        sf_np, nslots, cM, cq_np = cext_tables_lg(plan, e16 // 128, lg)
        s1, phi, vn0u1, vn0v1, omg1, xs = caar_pallas_packed_t4_lg(
            scal, dxbt, dybt, ainct, astrt, bstrt, meta,
            s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
            nlev=nlev, moist=moist, lg=lg, sf=jnp.asarray(sf_np),
            cq=jnp.asarray(cq_np), nslots=nslots, cM=cM,
            interpret=interpret)
        assembled = dss_structured_t_pallas_cpre(
            s1, xs, plan, rsp_lanes, lg=lg, interpret=interpret)
        return assembled, phi, vn0u1, vn0v1, omg1

    if fuse_extract and fused_admissible(
            eb, e16, "caar_dss_structured_packed_t4"):
        note_compact("caar_dss_structured_packed_t4", compact)
        if compact:
            sf, nt, cM, cq_np = cext_tables(plan, e16 // 128)
            cq = jnp.asarray(cq_np)
        else:
            sf, nt = ext_slot_arrays(plan, e16 // 128)
            cM, cq = 0, None
        s1, phi, vn0u1, vn0v1, omg1, xd_t = caar_pallas_packed_t4_ext(
            scal, dxbt, dybt, ainct, astrt, bstrt, meta,
            s0, sm1, qdp, pecnd, vn0u, vn0v, omg, jnp.asarray(sf),
            nt=nt, nlev=nlev, moist=moist, cq=cq, cM=cM,
            interpret=interpret)
        if compact:
            assembled = dss_structured_t_pallas_cpre(
                s1, xd_t, plan, rsp_lanes, interpret=interpret)
        else:
            assembled = dss_structured_t_pallas_pre(
                s1, xd_t, plan, rsp_lanes, vdt=vdt, interpret=interpret)
        return assembled, phi, vn0u1, vn0v1, omg1

    s1, phi, vn0u1, vn0v1, omg1 = caar_pallas_packed_t4(
        scal, dxbt, dybt, ainct, astrt, bstrt, meta,
        s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
        eb=eb, nlev=nlev, moist=moist, interpret=interpret)
    assembled = dss_structured_t_pallas(s1, plan, rsp_lanes, vdt=vdt,
                                        interpret=interpret)
    return assembled, phi, vn0u1, vn0v1, omg1


@partial(jax.jit, static_argnames=("eb", "nlev", "plan", "moist",
                                   "compact", "lg", "interpret"))
def ssprk3_packed_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                     s0, qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes,
                     eb: int, nlev: int, moist: bool = True,
                     compact: bool = True, lg: int = 0,
                     interpret: bool = False):
    """SSPRK3 dynamics entirely on the packed transposed Pallas path:

        U1 = P(U0 + dt L(U0))
        U2 = 3/4 U0 + 1/4 P(U1 + dt L(U1))
        U3 = 1/3 U0 + 2/3 P(U2 + dt L(U2))

    This pulls the projection P inside the convex combinations, which is
    exact when ``s0`` is CONTINUOUS (P U0 = U0) — true for any state
    produced by an assembled step. Each stage is one single-state RK CAAR
    kernel (`caar_pallas_packed_t4_rk` — the evaluation and base states
    coincide, so the pair kernel's duplicate state fetch is dropped) + one
    structured Pallas DSS, with the Shu-Osher combinations FOLDED into the
    sweep kernel's affine output (``mix``) — no standalone XLA combination
    passes. The mean-flux accumulators are advanced with the scheme's
    quadrature b = (1/6, 1/6, 2/3), composed onto scal's eta_ave_w; phi is
    the last stage's (timeloop/rk.py semantics, reference analog
    kokkos_init.cpp:97-99 which only repeats the raw call).

    ``scal`` must carry dt (NOT the leapfrog 2*dt) in its dt2 slot.
    Returns (s_np1 [4*nlev, E16], phi, vn0u', vn0v', omega_p')."""
    from ..kernels.caar_pallas_t import (
        caar_pallas_packed_t4_lg, caar_pallas_packed_t4_rk,
    )
    from ..kernels.dss_pallas import (
        _fixup_arrays_t, cext_tables, dss_structured_t_pallas,
        dss_structured_t_pallas_cpre, dss_structured_t_pallas_pre,
        ext_slot_arrays, extract_tiles_ct,
    )

    from ..fastpath import fused_admissible, note_compact

    B = (1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0)
    f = s0.dtype
    e16 = s0.shape[1]
    use_lg = lg > 1 and e16 % (128 * lg) == 0
    if use_lg:
        # lane-grouped RK stages + standalone compact extraction (the r4
        # grid-overhead fix: ~0.2-0.3 ms/call at ne30-class 675-block
        # grids); the sweep/mix epilogue is unchanged
        from ..fastpath import last_path

        last_path["ssprk3_packed_t4"] = f"fused-lg{lg}-compact"
        from ..kernels.dss_pallas import cext_tables_lg

        sf_np, nslots, cM, cq_np = cext_tables_lg(plan, e16 // 128, lg)
        sfj, cqj = jnp.asarray(sf_np), jnp.asarray(cq_np)

        def kstage(u, b, acc, emit_phi=False):
            sc = scal.at[0, 1].set(scal[0, 1] * f.type(b))
            out = caar_pallas_packed_t4_lg(
                sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, u, qdp,
                pecnd, *acc, nlev=nlev, moist=moist, lg=lg, single=True,
                emit_phi=emit_phi, sf=sfj, cq=cqj, nslots=nslots, cM=cM,
                interpret=interpret)
            return out[0], out[1], out[2:5], out[5]

        def proj(s1, xd_t, mix=None):
            return dss_structured_t_pallas_cpre(
                s1, xd_t, plan, rsp_lanes, mix=mix, lg=lg,
                interpret=interpret)

        s1k, _, acc, xd = kstage(s0, B[0], (vn0u, vn0v, omg))
        u1 = proj(s1k, xd)
        s2k, _, acc, xd = kstage(u1, B[1], acc)
        u2 = proj(s2k, xd, mix=(s0, f.type(0.75), f.type(0.25)))
        s3k, phi, acc, xd = kstage(u2, B[2], acc, emit_phi=True)
        u3 = proj(s3k, xd, mix=(s0, f.type(1.0 / 3.0), f.type(2.0 / 3.0)))
        return (u3, phi, *acc)

    fuse = fused_admissible(eb, e16, "ssprk3_packed_t4")
    if fuse:
        note_compact("ssprk3_packed_t4", compact)
    cM, cqj = 0, None
    if fuse and compact:
        sf_np, nt_ext, cM, cq_np = cext_tables(plan, e16 // 128)
        sfj, cqj = jnp.asarray(sf_np), jnp.asarray(cq_np)
    elif fuse:
        sf_np, nt_ext = ext_slot_arrays(plan, e16 // 128)
        sfj = jnp.asarray(sf_np)
    else:
        sfj, nt_ext = None, 0

    def kstage(u, b, acc, emit_phi=False):
        sc = scal.at[0, 1].set(scal[0, 1] * f.type(b))
        out = caar_pallas_packed_t4_rk(
            sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, qdp, pecnd,
            *acc, sf=sfj, nt=nt_ext, eb=eb, nlev=nlev, moist=moist,
            emit_phi=emit_phi, cq=cqj, cM=cM, interpret=interpret)
        s1, phi = out[0], out[1]
        xd_t = out[5] if fuse else None
        return s1, phi, out[2:5], xd_t

    def proj(s1, xd_t, mix=None):
        if fuse and cM:
            return dss_structured_t_pallas_cpre(
                s1, xd_t, plan, rsp_lanes, mix=mix, interpret=interpret)
        if fuse:
            return dss_structured_t_pallas_pre(
                s1, xd_t, plan, rsp_lanes, mix=mix, interpret=interpret)
        return dss_structured_t_pallas(s1, plan, rsp_lanes, mix=mix,
                                       interpret=interpret)

    s1k, _, acc, xd = kstage(s0, B[0], (vn0u, vn0v, omg))
    u1 = proj(s1k, xd)
    s2k, _, acc, xd = kstage(u1, B[1], acc)
    u2 = proj(s2k, xd, mix=(s0, f.type(0.75), f.type(0.25)))
    s3k, phi, acc, xd = kstage(u2, B[2], acc, emit_phi=True)
    u3 = proj(s3k, xd, mix=(s0, f.type(1.0 / 3.0), f.type(2.0 / 3.0)))
    return (u3, phi, *acc)


@partial(jax.jit, static_argnames=("eb", "nlev", "plan", "subcycle",
                                   "fuse_extract", "compact", "hv_fast_dots",
                                   "lg", "interpret"))
def apply_hypervis_packed_t(dxbt, dybt, meta, uvt, plan, rsp_lanes,
                            nu, dt, eb: int, nlev: int, nu_ratio=1.0,
                            subcycle: int = 1, fuse_extract: bool = True,
                            compact: bool = True,
                            hv_fast_dots: bool = False, lg: int = 0,
                            interpret: bool = False):
    """Biharmonic hyperviscosity on the (u, v, T) rows of ``uvt``: per
    subcycle, two (packed weak-Laplacian Pallas kernel -> structured
    Pallas DSS) passes, then X -= (dt/subcycle)*nu*grad^4(X)
    (timeloop/hyperviscosity.py math on the fused fast path). With
    ``fuse_extract`` (default; elem_block == 8 and 128-aligned e16) the
    Laplacian kernel emits the DSS fixup slab itself. ``uvt`` may be
    either the [3*nlev, E16] (u, v, T) stack (returned as such) or the
    FULL [4*nlev, E16] prognostic buffer — then the update is applied
    IN PLACE via the sweep's aliased affine output and the dp rows ride
    through untouched (no slice/concat passes)."""
    from ..kernels.dss_pallas import (
        cext_tables, dss_structured_t_pallas, dss_structured_t_pallas_cpre,
        dss_structured_t_pallas_pre, ext_slot_arrays,
    )
    from ..kernels.hypervis_pallas_t import (
        vlap_pallas_packed_t, vlap_pallas_packed_t_ext,
    )

    f = uvt.dtype
    e16 = uvt.shape[1]
    sc = jnp.asarray(nu_ratio, jnp.float32).reshape(1, 1) * jnp.ones(
        (1, 4), jnp.float32)
    step = jnp.asarray(dt, f) / subcycle * jnp.asarray(nu, f)

    from ..fastpath import fused_admissible, note_compact

    if lg > 1 and e16 % (128 * lg) == 0:
        # lane-grouped vlap + standalone compact extraction (r4 grid-
        # overhead fix); sweep/mix epilogue unchanged
        from ..fastpath import last_path
        from ..kernels.dss_pallas import cext_tables_lg
        from ..kernels.hypervis_pallas_t import vlap_pallas_packed_t_lg

        last_path["apply_hypervis_packed_t"] = f"fused-lg{lg}-compact"
        sf_np, nslots, cM, cq_np = cext_tables_lg(plan, e16 // 128, lg)
        sfj, cqj = jnp.asarray(sf_np), jnp.asarray(cq_np)

        def lap_dss(x, mix=None):
            l, xd_t = vlap_pallas_packed_t_lg(
                sc, dxbt, dybt, meta, x, nlev=nlev, lg=lg,
                fast_dots=hv_fast_dots, sf=sfj, cq=cqj, nslots=nslots,
                cM=cM, interpret=interpret)
            return dss_structured_t_pallas_cpre(
                l, xd_t, plan, rsp_lanes, mix=mix, lg=lg,
                interpret=interpret)
    elif fuse_extract and fused_admissible(
            eb, e16, "apply_hypervis_packed_t"):
        note_compact("apply_hypervis_packed_t", compact)
        if compact:
            sf, nt, cM, cq_np = cext_tables(plan, e16 // 128)
            cqj = jnp.asarray(cq_np)
        else:
            sf, nt = ext_slot_arrays(plan, e16 // 128)
            cM, cqj = 0, None
        sfj = jnp.asarray(sf)

        def lap_dss(x, mix=None):
            l, xd_t = vlap_pallas_packed_t_ext(
                sc, dxbt, dybt, meta, x, sfj,
                nt=nt, nlev=nlev, cq=cqj, cM=cM,
                fast_dots=hv_fast_dots, interpret=interpret)
            if cM:
                return dss_structured_t_pallas_cpre(
                    l, xd_t, plan, rsp_lanes, mix=mix, interpret=interpret)
            return dss_structured_t_pallas_pre(l, xd_t, plan, rsp_lanes,
                                               mix=mix, interpret=interpret)
    else:
        def lap_dss(x, mix=None):
            l = vlap_pallas_packed_t(sc, dxbt, dybt, meta, x,
                                     eb=eb, nlev=nlev,
                                     fast_dots=hv_fast_dots,
                                     interpret=interpret)
            return dss_structured_t_pallas(l, plan, rsp_lanes, mix=mix,
                                           interpret=interpret)

    one = jnp.ones((), f)
    x = uvt
    for _ in range(subcycle):
        # x - step*grad^4: the update is the second sweep's affine output;
        # with the 4*nlev input the taller mix aliases the state buffer
        # and the dp rows are preserved through it
        x = lap_dss(lap_dss(x), mix=(x, one, -step))
    return x


@partial(jax.jit, static_argnames=("eb", "nlev", "plan", "limit",
                                   "fuse_extract", "compact", "wind_rows",
                                   "lg", "limit_iters", "limit_strategy",
                                   "interpret"))
def ssprk3_tracer_packed_t(dxbt, dybt, meta, vu, vv, qdp, plan, rsp_lanes,
                           dt, eb: int, nlev: int, limit: bool = False,
                           fuse_extract: bool = True,
                           compact: bool = True,
                           wind_rows: tuple = (0, 0), lg: int = 0,
                           limit_iters: int = 2,
                           limit_strategy: str = "transpose",
                           interpret: bool = False):
    """SSPRK3 tracer transport on the packed path: each stage is the fused
    Euler kernel (kernels/tracer_pallas_t.py, spheremp folded in) closed by
    the structured Pallas DSS — together the continuous projection
    P = rsp*DSS(sph*.) of timeloop/tracer.py::ssprk3_tracer_step. The
    convex combinations assume a CONTINUOUS qdp (P q = q, true after any
    projected step). ``limit`` applies the monotone mass-conserving
    limiter (ops/limiter.py) per stage: the packed lane axis reshapes to
    [.., e, np, np] for free, spheremp is applied after the clip."""
    from ..kernels.dss_pallas import (
        cext_tables, dss_structured_t_pallas, dss_structured_t_pallas_cpre,
        dss_structured_t_pallas_pre, ext_slot_arrays,
    )
    from ..kernels.tracer_pallas_t import (
        tracer_euler_pallas_packed_t, tracer_euler_pallas_packed_t_ext,
    )

    f = qdp.dtype
    e16 = qdp.shape[1]
    scal = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(
        jnp.asarray(dt, jnp.float32))

    if not limit:
        # P is linear and P(qdp) = qdp, so it pulls inside the convex
        # combinations and each stage is one fused kernel + one DSS, with
        # the Shu-Osher combinations folded into the sweep (mix)
        from ..fastpath import fused_admissible, note_compact

        # the lane-grouped tracer kernel's block is [qk, 128*lg]: at
        # QSIZE_D=35 (qk=2520) its ~4.8 live buffers overflow scoped VMEM
        # (measured 30.7M vs 21.3M at lg=5). MEASURED round 5 (ne30 q35,
        # BYTES_MODEL.md "q35 lane-grouping ledger"): every lg form of
        # the tall stage LOSES vs the dense 128-lane path (25.8 ms) —
        # row-chunked lg5/qc7 32.0 ms (+24%: the 2D grid keeps the step
        # count, forfeiting the lane-group win, and re-fetches winds per
        # chunk), unchunked lg5 at a raised 40/64 MB scoped cap
        # 31.0/29.7 ms (+15-20%: the [2520, 640] working set cuts
        # Mosaic's DMA/compute double-buffering — the r3 tall-dot
        # mechanism). So tall stacks that over-budget the plain-lg
        # estimate run the DENSE fused path; qc stays a kernel-level
        # option for explicit A/Bs.
        qk = qdp.shape[0]
        nq_ = qk // nlev
        cap_b = 16 * 2 ** 20
        lg_t = next((g for g in range(lg, 1, -1)
                     if e16 % (128 * g) == 0), 0)
        qc = 0
        if lg_t > 1 and 4.5 * qk * 128 * lg_t * 4 > cap_b:
            lg_t = 0
        if lg_t > 1:
            lg = lg_t
            from ..fastpath import last_path
            from ..kernels.dss_pallas import cext_tables_lg
            from ..kernels.tracer_pallas_t import (
                reassemble_chunked_slab, tracer_euler_pallas_packed_t_lg,
            )

            last_path["ssprk3_tracer_packed_t"] = (
                f"fused-lg{lg}-qc{qc}-compact" if qc
                else f"fused-lg{lg}-compact")
            sf_np, nslots, cM, cq_np = cext_tables_lg(plan, e16 // 128, lg)
            sfj, cqj = jnp.asarray(sf_np), jnp.asarray(cq_np)

            def stage(q, mix=None):
                e, xd_t = tracer_euler_pallas_packed_t_lg(
                    scal, dxbt, dybt, meta, vu, vv, q, nlev=nlev, lg=lg,
                    qc=qc, wind_rows=wind_rows, sf=sfj, cq=cqj,
                    nslots=nslots, cM=cM, interpret=interpret)
                if qc:
                    xd_t = reassemble_chunked_slab(xd_t, nq_ // qc,
                                                   qc * nlev)
                return dss_structured_t_pallas_cpre(
                    e, xd_t, plan, rsp_lanes, mix=mix, lg=lg,
                    interpret=interpret)
        elif fuse_extract and fused_admissible(
                eb, e16, "ssprk3_tracer_packed_t"):
            note_compact("ssprk3_tracer_packed_t", compact)
            if compact:
                sf, nt, cM, cq_np = cext_tables(plan, e16 // 128)
                cqj = jnp.asarray(cq_np)
            else:
                sf, nt = ext_slot_arrays(plan, e16 // 128)
                cM, cqj = 0, None
            sfj = jnp.asarray(sf)

            def stage(q, mix=None):
                e, xd_t = tracer_euler_pallas_packed_t_ext(
                    scal, dxbt, dybt, meta, vu, vv, q, sfj,
                    nt=nt, nlev=nlev, wind_rows=wind_rows,
                    cq=cqj, cM=cM, interpret=interpret)
                if cM:
                    return dss_structured_t_pallas_cpre(
                        e, xd_t, plan, rsp_lanes, mix=mix,
                        interpret=interpret)
                return dss_structured_t_pallas_pre(
                    e, xd_t, plan, rsp_lanes, mix=mix, interpret=interpret)
        else:
            def stage(q, mix=None):
                e = tracer_euler_pallas_packed_t(
                    scal, dxbt, dybt, meta, vu, vv, q,
                    eb=eb, nlev=nlev, wind_rows=wind_rows,
                    interpret=interpret)
                return dss_structured_t_pallas(e, plan, rsp_lanes, mix=mix,
                                               interpret=interpret)

        q1 = stage(qdp)
        q2 = stage(q1, mix=(qdp, f.type(0.75), f.type(0.25)))
        return stage(q2, mix=(qdp, f.type(1.0 / 3.0), f.type(2.0 / 3.0)))

    # the limiter is NONLINEAR: follow the field path's exact order
    # P(L(combo, bounds(q_in))). On the fused fast path (eb=8, 128-aligned
    # lanes) the WHOLE stage — advection, Shu-Osher combination, limiter,
    # spheremp weighting, DSS-slab extraction — is ONE Pallas kernel
    # (kernels/tracer_pallas_t.py::tracer_limit_pallas_packed_t_ext):
    # the limiter's group reductions are 16-lane-group one-hot MXU dots
    # and lane shuffles, so the packed layout is never reshaped (the old
    # path transposed the full tracer state 3x per step).
    from ..fastpath import fused_admissible, note_compact

    if fuse_extract and fused_admissible(
            eb, e16, "ssprk3_tracer_packed_t(limit)"):
        from ..kernels.tracer_pallas_t import (
            tracer_limit_pallas_packed_t_ext,
        )

        note_compact("ssprk3_tracer_packed_t(limit)", compact)
        if compact:
            sf, nt, cM, cq_np = cext_tables(plan, e16 // 128)
            cqj = jnp.asarray(cq_np)
        else:
            sf, nt = ext_slot_arrays(plan, e16 // 128)
            cM, cqj = 0, None
        sfj = jnp.asarray(sf)

        def lstage(q, ca=None, cb=None, mx=None):
            sc = scal if ca is None else \
                scal.at[0, 1].set(jnp.float32(ca)).at[0, 2].set(
                    jnp.float32(cb))
            e, xd_t = tracer_limit_pallas_packed_t_ext(
                sc, dxbt, dybt, meta, vu, vv, q, mx, sfj,
                nt=nt, nlev=nlev, has_mix=mx is not None,
                strategy=limit_strategy,
                wind_rows=wind_rows, cq=cqj, cM=cM, iters=limit_iters,
                interpret=interpret)
            if cM:
                return dss_structured_t_pallas_cpre(
                    e, xd_t, plan, rsp_lanes, interpret=interpret)
            return dss_structured_t_pallas_pre(
                e, xd_t, plan, rsp_lanes, interpret=interpret)

        q1 = lstage(qdp)
        q2 = lstage(q1, 0.75, 0.25, qdp)
        return lstage(q2, 1.0 / 3.0, 2.0 / 3.0, qdp)

    from ..config import NP
    from ..kernels.layout import META_COLS
    from ..ops.limiter import element_bounds, limit_tracer

    qk, e16 = qdp.shape
    nel = e16 // 16
    sph4 = meta[META_COLS.index("spheremp")].reshape(1, nel, NP, NP)

    def adv(q):
        return tracer_euler_pallas_packed_t(
            scal, dxbt, dybt, meta, vu, vv, q,
            eb=eb, nlev=nlev, fold_sph=False, wind_rows=wind_rows,
            interpret=interpret)

    def PL(x, q_in):
        qmin, qmax = element_bounds(q_in.reshape(qk, nel, NP, NP))
        lim = limit_tracer(x.reshape(qk, nel, NP, NP), sph4, qmin, qmax)
        return dss_structured_t_pallas((sph4 * lim).reshape(qk, e16),
                                       plan, rsp_lanes, interpret=interpret)

    q1 = PL(adv(qdp), qdp)
    q2 = PL(f.type(0.75) * qdp + f.type(0.25) * adv(q1), q1)
    return PL(f.type(1.0 / 3.0) * qdp + f.type(2.0 / 3.0) * adv(q2), q2)


@partial(jax.jit, static_argnames=("nelem", "nlev", "qsize", "scheme"))
def remap_packed_t4(s, qdp, hv, nelem: int, nlev: int, qsize: int,
                    scheme: str = "plm", sph_lanes=None, mass_target=None):
    """Conservative vertical remap of the packed stacked state + tracers
    back to the reference hybrid levels (ops/remap.py::vertical_remap on
    the packed layout; call every rsplit-th step). Returns (s', qdp').

    ``sph_lanes`` [1, e16] + ``mass_target`` (scalar) enable the global
    dry-mass fixer (the CAM/HOMME production discipline): dp and qdp are
    rescaled by mass_target / sum(sph*dp). Both masses must be measured
    with the SAME f32 summation (``packed_air_mass``) so the measurement
    bias cancels in the ratio; the f32 flux-form dynamics otherwise leaks
    ~2e-8 relative mass per step (dt-proportional, from element edge
    fluxes rounded separately on each side — the f64 oracle holds 1e-6
    over 5 days, ENERGY_DRIFT.json)."""
    from ..kernels.layout import pack_field_t, unpack_field_t
    from ..ops.remap import (
        _match_column_total, comp_sum, reference_dp, remap_column,
    )

    k = nlev
    unp = lambda x: unpack_field_t(x, nelem)
    u, v, t, dp_src = (unp(s[i * k:(i + 1) * k]) for i in range(4))
    # compensated level sum + column-total renormalization: the f32
    # hybrid reconstruction's bias was the cadence's linear air-mass
    # drift (ENERGY_DRIFT_PACKED.json, VERDICT r2 weak #6)
    ptop = hv.hyai[0] * hv.ps0
    ps = ptop + comp_sum(dp_src, -3)
    dp_tgt = _match_column_total(
        reference_dp(hv, ps), dp_src).astype(s.dtype)
    rmp = lambda x: remap_column(x, dp_src, dp_tgt, scheme=scheme)
    s_new = jnp.concatenate(
        [pack_field_t(rmp(x).astype(s.dtype)) for x in (u, v, t)]
        + [pack_field_t(dp_tgt)], axis=0)
    q_new = jnp.concatenate(
        [pack_field_t((rmp(unp(qdp[q * k:(q + 1) * k]) / dp_src)
                       * dp_tgt).astype(s.dtype))
         for q in range(qsize)], axis=0)
    if sph_lanes is not None and mass_target is not None:
        r = mass_target / packed_air_mass(s_new, sph_lanes, nlev)
        s_new = jnp.concatenate([s_new[:3 * k], r * s_new[3 * k:]], axis=0)
        q_new = r * q_new
    return s_new, q_new


@partial(jax.jit, static_argnames=("nlev",))
def packed_air_mass(s, sph_lanes, nlev: int):
    """f32 spheremp-weighted air mass of the packed stacked state's dp
    rows — the mass-fixer's measurement functional (fixed summation
    order; use for both the target and the current mass so the f32
    measurement bias cancels in the ratio)."""
    return jnp.sum(sph_lanes * s[3 * nlev:4 * nlev])




def _ring_tables(plan, e16, ne):
    from ..kernels.dss_pallas import _sweep_masks_np, cext_tables

    sf, nt, cM, cq = cext_tables(plan, e16 // 128)
    masks = jnp.asarray(_sweep_masks_np(ne, 6))
    return jnp.asarray(sf), nt, cM, jnp.asarray(cq), masks


@partial(jax.jit, static_argnames=("ne", "nlev", "plan", "moist",
                                   "interpret"))
def caar_dss_ring_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                     s0, sm1, qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes,
                     ne: int, nlev: int, moist: bool = True,
                     interpret: bool = False):
    """RING-FUSED assembled step: ONE Pallas dispatch computes the CAAR
    update and emits the rsp-scaled DSS sweeps through a VMEM ring buffer
    (kernels/ring_fused.py) — s1 never round-trips HBM (was 2 extra
    full-field passes; 3.2 GB/step at ne120). The cube-edge tiles are then
    rewritten in place by the compact fixup + merge_patch_pallas. Output
    is bitwise equal to caar_dss_structured_packed_t4 (compact=True).
    Requires elem_block == 8 semantics (e16 % 128 == 0, even ne)."""
    from ..kernels.dss_pallas import fix_vals3, merge_patch_pallas
    from ..kernels.ring_fused import caar_ring_packed_t4

    e16 = s0.shape[1]
    sfj, nt, cM, cqj, masks = _ring_tables(plan, e16, ne)
    w, phi, a1, b1, c1, xs = caar_ring_packed_t4(
        scal, dxbt, dybt, ainct, astrt, bstrt, meta,
        s0, sm1, qdp, pecnd, vn0u, vn0v, omg, masks, rsp_lanes, sfj, cqj,
        nt=nt, cM=cM, ne=ne, nlev=nlev, moist=moist, single=False,
        interpret=interpret)
    vals3 = fix_vals3(xs, rsp_lanes, plan)
    out = merge_patch_pallas(w, vals3, plan, interpret=interpret)
    return out, phi, a1, b1, c1


@partial(jax.jit, static_argnames=("ne", "nlev", "plan", "moist",
                                   "interpret"))
def ssprk3_ring_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                   s0, qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes,
                   ne: int, nlev: int, moist: bool = True,
                   interpret: bool = False):
    """`ssprk3_packed_t4` on the RING-FUSED path: each stage is ONE
    kernel+sweep dispatch (Shu-Osher mix folded into the emission) + the
    compact fixup + an in-place edge-tile patch. Bitwise equal to the
    compact ssprk3_packed_t4."""
    from ..kernels.dss_pallas import fix_vals3, merge_patch_pallas
    from ..kernels.ring_fused import caar_ring_packed_t4

    B = (1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0)
    f = s0.dtype
    e16 = s0.shape[1]
    sfj, nt, cM, cqj, masks = _ring_tables(plan, e16, ne)

    def stage(u, b, acc, emit_phi=False, mix=None):
        sc = scal.at[0, 1].set(scal[0, 1] * f.type(b))
        w, phi, a1, b1, c1, xs = caar_ring_packed_t4(
            sc, dxbt, dybt, ainct, astrt, bstrt, meta,
            u, None, qdp, pecnd, *acc, masks, rsp_lanes, sfj, cqj,
            nt=nt, cM=cM, ne=ne, nlev=nlev, moist=moist, single=True,
            emit_phi=emit_phi, mix=mix, interpret=interpret)
        vals3 = fix_vals3(xs, rsp_lanes, plan)
        pmix = None if mix is None else (mix[0], mix[1], mix[2])
        out = merge_patch_pallas(w, vals3, plan, mix=pmix,
                                 interpret=interpret)
        return out, phi, (a1, b1, c1)

    u1, _, acc = stage(s0, B[0], (vn0u, vn0v, omg))
    u2, _, acc = stage(u1, B[1], acc,
                       mix=(s0, f.type(0.75), f.type(0.25)))
    u3, phi, acc = stage(u2, B[2], acc, emit_phi=True,
                         mix=(s0, f.type(1.0 / 3.0), f.type(2.0 / 3.0)))
    return (u3, phi, *acc)


@partial(jax.jit, static_argnames=("ne", "nlev", "plan", "wind_rows",
                                   "interpret"))
def ssprk3_tracer_ring_t(dxbt, dybt, meta, vu, vv, qdp, plan, rsp_lanes,
                         dt, ne: int, nlev: int,
                         wind_rows: tuple = (0, 0),
                         interpret: bool = False):
    """`ssprk3_tracer_packed_t` (limit=False) on the RING-FUSED path —
    the dominant QSIZE_D=35 cost: each stage drops the qdp round-trip
    (2 x 868 MB/stage at ne30 q35). Bitwise equal to the compact path."""
    from ..kernels.dss_pallas import fix_vals3, merge_patch_pallas
    from ..kernels.ring_fused import tracer_ring_packed_t

    f = qdp.dtype
    e16 = qdp.shape[1]
    sfj, nt, cM, cqj, masks = _ring_tables(plan, e16, ne)
    scal = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(
        jnp.asarray(dt, jnp.float32))

    def stage(q, mix=None):
        w, xs = tracer_ring_packed_t(
            scal, dxbt, dybt, meta, vu, vv, q, masks, rsp_lanes, sfj, cqj,
            nt=nt, cM=cM, ne=ne, nlev=nlev, wind_rows=wind_rows, mix=mix,
            interpret=interpret)
        vals3 = fix_vals3(xs, rsp_lanes, plan)
        return merge_patch_pallas(w, vals3, plan, mix=mix,
                                  interpret=interpret)

    q1 = stage(qdp)
    q2 = stage(q1, mix=(qdp, f.type(0.75), f.type(0.25)))
    return stage(q2, mix=(qdp, f.type(1.0 / 3.0), f.type(2.0 / 3.0)))


@partial(jax.jit, static_argnames=("nu", "eb", "nlev", "plan", "qsplit",
                                   "moist", "subcycle", "limit_tracers",
                                   "hv_fast_dots", "lg", "limit_iters",
                                   "limit_strategy", "interpret"))
def prim_step_packed_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                        s0, qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes,
                        nu, eb: int, nlev: int, qsplit: int = 1,
                        nu_ratio=1.0, moist: bool = True,
                        subcycle: int = 1, limit_tracers: bool = False,
                        hv_fast_dots: bool = False, lg: int = 0,
                        limit_iters: int = 2,
                        limit_strategy: str = "transpose",
                        interpret: bool = False):
    """FULL prim cadence on the packed transposed Pallas path (the fused
    fast-path analog of timeloop/prim.py::prim_run_step):

      1. SSPRK3 dynamics (`ssprk3_packed_t4`) on the stacked prognostics;
      2. biharmonic hyperviscosity on the updated (u, v, T) rows
         (`apply_hypervis_packed_t`);
      3. SSPRK3 tracer transport riding the updated winds, ``qsplit``
         substeps (`ssprk3_tracer_packed_t`), tracers stacked
         [qsize*nlev, E16].

    ``scal`` carries dt in its dt2 slot; ``qdp`` rows [0:nlev] are the
    moisture tracer read by the dynamics. Everything stays in the packed
    layout across steps (chain s_np1 -> s0, qdp' -> qdp). Returns
    (s_np1, qdp', phi, vn0u', vn0v', omega_p')."""
    dt = scal[0, 0]

    # the RK kernel reads only the first nlev tracer rows via its block
    # spec — pass the full stacked qdp, no slice copy
    s1, phi, vn0u1, vn0v1, omg1 = ssprk3_packed_t4(
        scal, dxbt, dybt, ainct, astrt, bstrt, meta, s0,
        qdp, pecnd, vn0u, vn0v, omg,
        plan, rsp_lanes, eb=eb, nlev=nlev, moist=moist, lg=lg,
        interpret=interpret)

    if nu:
        # full 4*nlev buffer: the final sweep applies the update in place
        # via the aliased affine output (dp rows ride through) — no slice
        # or concat passes
        s1 = apply_hypervis_packed_t(
            dxbt, dybt, meta, s1, plan, rsp_lanes, nu, dt,
            eb=eb, nlev=nlev, nu_ratio=nu_ratio, subcycle=subcycle,
            hv_fast_dots=hv_fast_dots, lg=lg, interpret=interpret)

    # winds read from s1's row blocks 0 (u) and 1 (v) in place
    dt_q = dt / max(qsplit, 1)
    for _ in range(max(qsplit, 1)):
        qdp = ssprk3_tracer_packed_t(dxbt, dybt, meta, s1, s1, qdp,
                                     plan, rsp_lanes, dt_q,
                                     eb=eb, nlev=nlev, limit=limit_tracers,
                                     wind_rows=(0, 1), lg=lg,
                                     limit_iters=limit_iters,
                                     limit_strategy=limit_strategy,
                                     interpret=interpret)
    return s1, qdp, phi, vn0u1, vn0v1, omg1


def caar_dss_pallas(state: State, derived: Derived, geom: Geometry,
                    hv: HybridVCoord, gdof, ndof: int, cfg: Config,
                    dt2, eta_ave_w, moist: bool = True,
                    interpret: bool = False, dss: str = "gather",
                    ne: int | None = None, chunks: int = 1):
    """Full-state wrapper: pack -> fused kernel + packed DSS -> unpack.
    Contract of dist.step.caar_dss_step on the Pallas fast path (f32).
    ``dss="structured"`` (requires ``ne``) uses the gather-free sweeps;
    ``dss="structured_t"`` runs kernel + sweeps on the transposed
    padding-free [nlev, E16] layout — the fastest single-chip assembly."""
    import dataclasses

    from ..kernels.layout import pack_field, unpack_field

    if dss == "structured_t":
        return _caar_dss_pallas_t(state, derived, geom, hv, gdof, cfg,
                                  dt2, eta_ave_w, moist=moist,
                                  interpret=interpret, ne=ne)
    p = pack_problem(state, derived, geom, hv, cfg)
    scal = _scalars(dt2, eta_ave_w, hv)
    common = (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
              p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
              p["um1"], p["vm1"], p["tm1"], p["dpm1"],
              p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])
    if dss == "structured":
        from .structured_dss import make_structured_plan

        assert ne is not None, "structured DSS needs the cubed-sphere ne"
        plan = make_structured_plan(np.asarray(gdof), ne)
        rsp = pack_field(jnp.broadcast_to(
            jnp.asarray(geom.rspheremp, jnp.float32)[:, None],
            (cfg.nelem, 1, 4, 4)))
        u1, v1, t1, dp1, phi, vn0u, vn0v, omg = caar_dss_structured_packed(
            *common, plan, rsp, eb=cfg.elem_block, nlev=cfg.nlev,
            moist=moist, interpret=interpret, chunks=chunks,
        )
    else:
        gdof_rows, rsp_rows = make_packed_dss(gdof, geom.rspheremp)
        u1, v1, t1, dp1, phi, vn0u, vn0v, omg = caar_dss_pallas_packed(
            *common, gdof_rows, rsp_rows,
            eb=cfg.elem_block, nlev=cfg.nlev, ndof=ndof, moist=moist,
            interpret=interpret,
        )
    ne, np1 = cfg.nelem, cfg.np1
    f = lambda x: jnp.asarray(x, u1.dtype)
    new_state = dataclasses.replace(
        state,
        u=f(state.u).at[np1].set(unpack_field(u1, ne)),
        v=f(state.v).at[np1].set(unpack_field(v1, ne)),
        t=f(state.t).at[np1].set(unpack_field(t1, ne)),
        dp3d=f(state.dp3d).at[np1].set(unpack_field(dp1, ne)),
    )
    new_derived = dataclasses.replace(
        derived,
        vn0_u=unpack_field(vn0u, ne), vn0_v=unpack_field(vn0v, ne),
        phi=unpack_field(phi, ne), omega_p=unpack_field(omg, ne),
    )
    return new_state, new_derived


def _caar_dss_pallas_t(state: State, derived: Derived, geom: Geometry,
                       hv: HybridVCoord, gdof, cfg: Config, dt2, eta_ave_w,
                       moist: bool = True, interpret: bool = False,
                       ne: int | None = None):
    """Full-state transposed assembled step (pack_t -> kernel_t + DSS_t ->
    unpack_t); dispatched from caar_dss_pallas(dss="structured_t")."""
    import dataclasses

    from ..kernels.caar_pallas_t import pack_problem_t
    from ..kernels.layout import unpack_field_t
    from .structured_dss import make_structured_plan

    assert ne is not None, "structured DSS needs the cubed-sphere ne"
    p = pack_problem_t(state, derived, geom, hv, cfg)
    scal = _scalars(dt2, eta_ave_w, hv)
    plan = make_structured_plan(np.asarray(gdof), ne)
    # packed row order is e*16 + i*4 + j == rspheremp[e, i, j] flattened
    rsp = jnp.asarray(geom.rspheremp, jnp.float32).reshape(1, cfg.nelem * 16)
    u1, v1, t1, dp1, phi, vn0u, vn0v, omg = caar_dss_structured_packed_t(
        scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
        p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
        p["um1"], p["vm1"], p["tm1"], p["dpm1"],
        p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"],
        plan, rsp, eb=cfg.elem_block, nlev=cfg.nlev,
        moist=moist, interpret=interpret,
    )
    nelem, np1 = cfg.nelem, cfg.np1
    f = lambda x: jnp.asarray(x, u1.dtype)
    new_state = dataclasses.replace(
        state,
        u=f(state.u).at[np1].set(unpack_field_t(u1, nelem)),
        v=f(state.v).at[np1].set(unpack_field_t(v1, nelem)),
        t=f(state.t).at[np1].set(unpack_field_t(t1, nelem)),
        dp3d=f(state.dp3d).at[np1].set(unpack_field_t(dp1, nelem)),
    )
    new_derived = dataclasses.replace(
        derived,
        vn0_u=unpack_field_t(vn0u, nelem), vn0_v=unpack_field_t(vn0v, nelem),
        phi=unpack_field_t(phi, nelem), omega_p=unpack_field_t(omg, nelem),
    )
    return new_state, new_derived
