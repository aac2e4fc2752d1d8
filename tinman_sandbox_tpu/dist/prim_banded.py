"""Band-sharded FULL prim cadence: the multi-chip fast path for the whole
model step.

Composes the band-sharded building blocks (dist/banded_t4.py) into the
same cadence as dist/step_pallas.py::prim_step_packed_t4 — SSPRK3
dynamics, biharmonic hyperviscosity, SSPRK3 tracer transport — with every
hot kernel running per-shard (shard_map) and only the perimeter-minimal
exchanges (single-row halo ppermutes + compact line all_gathers) crossing
chips. The Shu-Osher convex combinations and the X -= dt*nu*grad^4
updates are elementwise on lane-sharded arrays, so they stay sharded
under plain jit with no collectives.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh

from ..config import NPSQ
from .banded_t4 import _REP, _SPEC_L, _banded_dss_builder

__all__ = ["ssprk3_banded_t4", "hypervis_banded_t", "tracer_banded_t",
           "prim_step_banded_t4"]


def _fused_ext_tables(plan, m, mesh, eb, lanes_global, interpret,
                      lg: int = 0, overlap: bool = False):
    """(dss_local, dm_g, masks_g, cext, lg) for a producer+DSS fused
    shard_map body; ``cext`` is None when the slot-mapped extraction is
    inadmissible (elem_block != 8 or a non-128-aligned shard lane axis),
    else the producer-side table dict from `_banded_dss_builder` (dense
    or lane-grouped slab). Fused implies the COMPACT fix-lane slab
    (round-3 port): the producers select only each tile's Mc fix lanes
    (cq/cM) and the banded sweep re-expands them with exact placement
    dots. The resolved per-shard ``lg`` (0 = dense) is returned — the
    round-4 lane-grouping win ported to the multi-chip shard bodies."""
    from ..fastpath import fused_admissible
    from .banded_t4 import _resolve_lg

    N = mesh.shape["e"]
    local_lanes = lanes_global // N
    fuse = fused_admissible(eb, local_lanes, "prim_banded_t4")
    lg = _resolve_lg(lg, fuse, local_lanes, "prim_banded_t4")
    dss_local, dm_g, masks_g, _, cext = _banded_dss_builder(
        plan, m, N, interpret, compact=fuse, lg=lg,
        overlap=overlap and fuse)
    return dss_local, dm_g, masks_g, cext, lg


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "moist", "lg", "overlap", "interpret"))
def ssprk3_banded_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                     s0, qdp, pecnd, vn0u, vn0v, omg,
                     plan, rsp_lanes, mesh: Mesh, m: int,
                     eb: int, nlev: int, moist: bool = True,
                     lg: int = 0, overlap: bool = False,
                     interpret: bool = False):
    """Band-sharded SSPRK3 dynamics (step_pallas.ssprk3_packed_t4 over a
    mesh). Requires a CONTINUOUS s0. Mirrors the single-chip fused RK
    path: single-state RK kernel per stage (no duplicate state fetch),
    Shu-Osher combinations folded into the banded sweep's affine output,
    producer-fused tile extraction when admissible — LANE-GROUPED per
    shard when ``lg`` admits (0 = auto, the round-4 grid-overhead fix)."""
    from ..kernels.caar_pallas_t import (
        caar_pallas_packed_t4_lg, caar_pallas_packed_t4_rk,
    )

    B = (1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0)
    f = s0.dtype
    dss_local, dm_g, masks_g, cext, lg = _fused_ext_tables(
        plan, m, mesh, eb, s0.shape[1], interpret, lg, overlap)

    def kern(sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, qdp, pecnd,
             a1, a2, a3, emit_phi):
        if lg > 1:
            out = caar_pallas_packed_t4_lg(
                sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, u, qdp,
                pecnd, a1, a2, a3, nlev=nlev, moist=moist, lg=lg,
                single=True, emit_phi=emit_phi,
                sf=jnp.asarray(cext["sf"]), cq=jnp.asarray(cext["cq"]),
                nslots=cext["nslots"], cM=cext["cM"], interpret=interpret)
            return out[0], out[1], out[2:5], out[5]
        out = caar_pallas_packed_t4_rk(
            sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, qdp, pecnd,
            a1, a2, a3,
            sf=None if cext is None else jnp.asarray(cext["sf"]),
            nt=0 if cext is None else cext["nt"], eb=eb, nlev=nlev,
            moist=moist, emit_phi=emit_phi,
            cq=None if cext is None else jnp.asarray(cext["cq"]),
            cM=0 if cext is None else cext["cM"], interpret=interpret)
        xd_t = out[5] if cext is not None else None
        return out[0], out[1], out[2:5], xd_t

    def make_plain():
        def body(sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, qdp,
                 pecnd, a1, a2, a3, rsp, dm_l, masks_l):
            s1k, phi, acc, xd_t = kern(sc, dxbt, dybt, ainct, astrt, bstrt,
                                       meta, u, qdp, pecnd, a1, a2, a3,
                                       False)
            return dss_local(s1k, rsp, dm_l, masks_l, xd_t), phi, *acc

        return shard_map(body, mesh=mesh,
                         in_specs=(_REP,) * 6 + (_SPEC_L,) * 10,
                         out_specs=(_SPEC_L,) * 5, check_vma=False)

    def make_mix(emit_phi):
        def body(sc, coef, dxbt, dybt, ainct, astrt, bstrt, meta, u, mx,
                 qdp, pecnd, a1, a2, a3, rsp, dm_l, masks_l):
            s1k, phi, acc, xd_t = kern(sc, dxbt, dybt, ainct, astrt, bstrt,
                                       meta, u, qdp, pecnd, a1, a2, a3,
                                       emit_phi)
            mix = (mx, coef[0, 0], coef[0, 1])
            return dss_local(s1k, rsp, dm_l, masks_l, xd_t, mix), phi, *acc

        return shard_map(body, mesh=mesh,
                         in_specs=(_REP,) * 7 + (_SPEC_L,) * 11,
                         out_specs=(_SPEC_L,) * 5, check_vma=False)

    consts = (dxbt, dybt, ainct, astrt, bstrt)
    cf = lambda a, b: jnp.asarray([a, b], jnp.float32).reshape(1, 2)
    sc1 = scal.at[0, 1].set(scal[0, 1] * f.type(B[0]))
    u1, _, *acc = make_plain()(sc1, *consts, meta, s0, qdp, pecnd,
                               vn0u, vn0v, omg, rsp_lanes, dm_g, masks_g)
    sc2 = scal.at[0, 1].set(scal[0, 1] * f.type(B[1]))
    u2, _, *acc = make_mix(False)(sc2, cf(0.75, 0.25), *consts, meta, u1,
                                  s0, qdp, pecnd, *acc, rsp_lanes, dm_g,
                                  masks_g)
    sc3 = scal.at[0, 1].set(scal[0, 1] * f.type(B[2]))
    u3, phi, *acc = make_mix(True)(sc3, cf(1.0 / 3.0, 2.0 / 3.0), *consts,
                                   meta, u2, s0, qdp, pecnd, *acc,
                                   rsp_lanes, dm_g, masks_g)
    return (u3, phi, *acc)


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "subcycle", "lg", "overlap",
                                   "interpret"))
def hypervis_banded_t(dxbt, dybt, meta, uvt, plan, rsp_lanes, mesh: Mesh,
                      m: int, nu, dt, eb: int, nlev: int, nu_ratio=1.0,
                      subcycle: int = 1, lg: int = 0,
                      overlap: bool = False,
                      interpret: bool = False):
    """Band-sharded biharmonic hyperviscosity (apply_hypervis_packed_t
    over a mesh): per subcycle, two (local weak-Laplacian kernel ->
    sharded banded DSS) passes, FUSED into one shard_map body per pass —
    with the producer-fused tile extraction when admissible (elem_block=8,
    128-aligned shard lanes), lane-grouped per shard when ``lg`` admits
    (0 = auto)."""
    from ..kernels.hypervis_pallas_t import (
        vlap_pallas_packed_t, vlap_pallas_packed_t_ext,
        vlap_pallas_packed_t_lg,
    )

    f = uvt.dtype
    sc = jnp.asarray(nu_ratio, jnp.float32).reshape(1, 1) * jnp.ones(
        (1, 4), jnp.float32)
    step = jnp.asarray(dt, f) / subcycle * jnp.asarray(nu, f)
    dss_local, dm_g, masks_g, cext, lg = _fused_ext_tables(
        plan, m, mesh, eb, uvt.shape[1], interpret, lg, overlap)

    def lap(sc, dxbt, dybt, meta, x):
        if lg > 1:
            return vlap_pallas_packed_t_lg(
                sc, dxbt, dybt, meta, x, nlev=nlev, lg=lg,
                sf=jnp.asarray(cext["sf"]), cq=jnp.asarray(cext["cq"]),
                nslots=cext["nslots"], cM=cext["cM"], interpret=interpret)
        if cext is not None:
            return vlap_pallas_packed_t_ext(
                sc, dxbt, dybt, meta, x, jnp.asarray(cext["sf"]),
                nt=cext["nt"], nlev=nlev, cq=jnp.asarray(cext["cq"]),
                cM=cext["cM"], interpret=interpret)
        return vlap_pallas_packed_t(
            sc, dxbt, dybt, meta, x,
            eb=eb, nlev=nlev, interpret=interpret), None

    def body(sc, dxbt, dybt, meta, x, rsp, dm_l, masks_l):
        l, xd_t = lap(sc, dxbt, dybt, meta, x)
        return dss_local(l, rsp, dm_l, masks_l, xd_t)

    def body_mix(sc, coef, dxbt, dybt, meta, x, mx, rsp, dm_l, masks_l):
        # x - step*grad^4: the update is the sweep's affine output
        l, xd_t = lap(sc, dxbt, dybt, meta, x)
        return dss_local(l, rsp, dm_l, masks_l, xd_t,
                         (mx, coef[0, 0], coef[0, 1]))

    lap_dss = shard_map(
        body, mesh=mesh,
        in_specs=(_REP,) * 3 + (_SPEC_L,) * 5,
        out_specs=_SPEC_L, check_vma=False)
    lap_dss_mix = shard_map(
        body_mix, mesh=mesh,
        in_specs=(_REP,) * 4 + (_SPEC_L,) * 6,
        out_specs=_SPEC_L, check_vma=False)

    x = uvt
    for _ in range(subcycle):
        coef = jnp.stack([jnp.ones((), jnp.float32),
                          (-step).astype(jnp.float32)]).reshape(1, 2)
        a1 = lap_dss(sc, dxbt, dybt, meta, x, rsp_lanes, dm_g, masks_g)
        x = lap_dss_mix(sc, coef, dxbt, dybt, meta, a1, x, rsp_lanes,
                        dm_g, masks_g)
    return x


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "wind_rows", "lg", "overlap",
                                   "interpret"))
def tracer_banded_t(dxbt, dybt, meta, vu, vv, qdp, plan, rsp_lanes,
                    mesh: Mesh, m: int, dt, eb: int, nlev: int,
                    wind_rows: tuple = (0, 0), lg: int = 0,
                    overlap: bool = False,
                    interpret: bool = False):
    """Band-sharded SSPRK3 tracer transport (ssprk3_tracer_packed_t over
    a mesh, no limiter). Requires a CONTINUOUS qdp. Each stage is one
    shard_map body (local Euler kernel + banded DSS, with producer-fused
    tile extraction when admissible, lane-grouped per shard when ``lg``
    admits). The tracer block is [qk, 128*lg]: tall stacked-tracer qk
    shrinks lg to the scoped-VMEM fit (the same guard as the single-chip
    path, step_pallas.ssprk3_tracer_packed_t)."""
    from ..kernels.tracer_pallas_t import (
        tracer_euler_pallas_packed_t, tracer_euler_pallas_packed_t_ext,
        tracer_euler_pallas_packed_t_lg,
    )

    scal = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(
        jnp.asarray(dt, jnp.float32))
    # tall-stack rule (round-5 measured ledger, BYTES_MODEL "q35
    # lane-grouping"): stacks whose lg blocks over-budget the ~4.5-live-
    # buffer scoped-VMEM estimate run DENSE — shrinking lg (or row-
    # chunking) measured slower than the 128-lane path on chip; mirror
    # of the single-chip guard in step_pallas.ssprk3_tracer_packed_t
    from .banded_t4 import pick_lg

    qk = qdp.shape[0]
    nblocks = qdp.shape[1] // mesh.shape["e"] // 128
    if lg == 0:
        lg = pick_lg(nblocks) or 1
    else:
        lg = next((g for g in range(lg, 1, -1) if nblocks % g == 0), 1)
    if lg > 1 and 4.5 * qk * 128 * lg * 4 > 16 * 2 ** 20:
        lg = 1
    dss_local, dm_g, masks_g, cext, lg = _fused_ext_tables(
        plan, m, mesh, eb, qdp.shape[1], interpret, lg, overlap)

    def adv(scal, dxbt, dybt, meta, vu, vv, q):
        if lg > 1:
            return tracer_euler_pallas_packed_t_lg(
                scal, dxbt, dybt, meta, vu, vv, q, nlev=nlev, lg=lg,
                wind_rows=wind_rows, sf=jnp.asarray(cext["sf"]),
                cq=jnp.asarray(cext["cq"]), nslots=cext["nslots"],
                cM=cext["cM"], interpret=interpret)
        if cext is not None:
            return tracer_euler_pallas_packed_t_ext(
                scal, dxbt, dybt, meta, vu, vv, q, jnp.asarray(cext["sf"]),
                nt=cext["nt"], nlev=nlev, wind_rows=wind_rows,
                cq=jnp.asarray(cext["cq"]), cM=cext["cM"],
                interpret=interpret)
        return tracer_euler_pallas_packed_t(
            scal, dxbt, dybt, meta, vu, vv, q, eb=eb, nlev=nlev,
            wind_rows=wind_rows, interpret=interpret), None

    def body(scal, dxbt, dybt, meta, vu, vv, q, rsp, dm_l, masks_l):
        e, xd_t = adv(scal, dxbt, dybt, meta, vu, vv, q)
        return dss_local(e, rsp, dm_l, masks_l, xd_t)

    def body_mix(scal, coef, dxbt, dybt, meta, vu, vv, q, mx, rsp, dm_l,
                 masks_l):
        # Shu-Osher combination folded into the banded sweep
        e, xd_t = adv(scal, dxbt, dybt, meta, vu, vv, q)
        return dss_local(e, rsp, dm_l, masks_l, xd_t,
                         (mx, coef[0, 0], coef[0, 1]))

    euler_dss = shard_map(
        body, mesh=mesh,
        in_specs=(_REP,) * 3 + (_SPEC_L,) * 7,
        out_specs=_SPEC_L, check_vma=False)
    euler_dss_mix = shard_map(
        body_mix, mesh=mesh,
        in_specs=(_REP,) * 4 + (_SPEC_L,) * 8,
        out_specs=_SPEC_L, check_vma=False)

    cf = lambda a, b: jnp.asarray([a, b], jnp.float32).reshape(1, 2)
    q1 = euler_dss(scal, dxbt, dybt, meta, vu, vv, qdp, rsp_lanes,
                   dm_g, masks_g)
    q2 = euler_dss_mix(scal, cf(0.75, 0.25), dxbt, dybt, meta, vu, vv,
                       q1, qdp, rsp_lanes, dm_g, masks_g)
    return euler_dss_mix(scal, cf(1.0 / 3.0, 2.0 / 3.0), dxbt, dybt, meta,
                         vu, vv, q2, qdp, rsp_lanes, dm_g, masks_g)


@partial(jax.jit, static_argnames=("nu", "plan", "mesh", "m", "eb", "nlev",
                                   "qsplit", "moist", "subcycle", "lg",
                                   "overlap", "interpret"))
def prim_step_banded_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                        s0, qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes,
                        mesh: Mesh, m: int, nu, eb: int, nlev: int,
                        qsplit: int = 1, nu_ratio=1.0, moist: bool = True,
                        subcycle: int = 1, lg: int = 0,
                        overlap: bool = False,
                        interpret: bool = False):
    """FULL prim cadence, band-sharded (the multi-chip analog of
    step_pallas.prim_step_packed_t4). ``lg=0`` auto-picks the per-shard
    lane-group width on the fused path (bitwise-equal to the eb=8
    kernels; ``lg=1`` disables). Returns
    (s_np1, qdp', phi, vn0u', vn0v', omega_p')."""
    dt = scal[0, 0]

    # the RK kernel reads only the first nlev tracer rows via its block
    # spec — pass the full stacked qdp, no slice copy
    s1, phi, vn0u1, vn0v1, omg1 = ssprk3_banded_t4(
        scal, dxbt, dybt, ainct, astrt, bstrt, meta, s0,
        qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes, mesh, m,
        eb=eb, nlev=nlev, moist=moist, lg=lg, overlap=overlap,
        interpret=interpret)

    if nu:
        # full 4*nlev buffer: the final banded sweep applies the update in
        # place via the aliased affine output (dp rows ride through)
        s1 = hypervis_banded_t(
            dxbt, dybt, meta, s1, plan, rsp_lanes, mesh, m, nu, dt,
            eb=eb, nlev=nlev, nu_ratio=nu_ratio, subcycle=subcycle,
            lg=lg, overlap=overlap, interpret=interpret)

    # winds read from s1's row blocks 0 (u) and 1 (v) in place
    dt_q = dt / max(qsplit, 1)
    for _ in range(max(qsplit, 1)):
        qdp = tracer_banded_t(dxbt, dybt, meta, s1, s1, qdp, plan,
                              rsp_lanes, mesh, m, dt_q, eb=eb, nlev=nlev,
                              wind_rows=(0, 1), lg=lg, overlap=overlap,
                              interpret=interpret)
    return s1, qdp, phi, vn0u1, vn0v1, omg1
