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

from .banded_t4 import _REP, _SPEC_L, caar_dss_banded_t4, dss_banded_t

__all__ = ["ssprk3_banded_t4", "hypervis_banded_t", "tracer_banded_t",
           "prim_step_banded_t4"]


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "moist", "interpret"))
def ssprk3_banded_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                     s0, qdp, pecnd, vn0u, vn0v, omg,
                     plan, rsp_lanes, mesh: Mesh, m: int,
                     eb: int, nlev: int, moist: bool = True,
                     interpret: bool = False):
    """Band-sharded SSPRK3 dynamics (step_pallas.ssprk3_packed_t4 over a
    mesh). Requires a CONTINUOUS s0."""
    B = (1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0)
    f = s0.dtype

    def stage(u, b, acc):
        sc = scal.at[0, 1].set(scal[0, 1] * f.type(b))
        return caar_dss_banded_t4(
            sc, dxbt, dybt, ainct, astrt, bstrt, meta, u, u, qdp, pecnd,
            *acc, plan, rsp_lanes, mesh, m, eb=eb, nlev=nlev, moist=moist,
            interpret=interpret)

    u1, _, *acc = stage(s0, B[0], (vn0u, vn0v, omg))
    u2x, _, *acc = stage(u1, B[1], acc)
    u2 = f.type(0.75) * s0 + f.type(0.25) * u2x
    u3x, phi, *acc = stage(u2, B[2], acc)
    u3 = f.type(1.0 / 3.0) * s0 + f.type(2.0 / 3.0) * u3x
    return (u3, phi, *acc)


def _lanewise_vlap(mesh, scal, dxbt, dybt, meta, x, eb, nlev, interpret):
    from ..kernels.hypervis_pallas_t import vlap_pallas_packed_t

    def body(scal, dxbt, dybt, meta, x):
        return vlap_pallas_packed_t(scal, dxbt, dybt, meta, x,
                                    eb=eb, nlev=nlev, interpret=interpret)

    return shard_map(body, mesh=mesh,
                     in_specs=(_REP, _REP, _REP, _SPEC_L, _SPEC_L),
                     out_specs=_SPEC_L, check_vma=False)(
        scal, dxbt, dybt, meta, x)


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "subcycle", "interpret"))
def hypervis_banded_t(dxbt, dybt, meta, uvt, plan, rsp_lanes, mesh: Mesh,
                      m: int, nu, dt, eb: int, nlev: int, nu_ratio=1.0,
                      subcycle: int = 1, interpret: bool = False):
    """Band-sharded biharmonic hyperviscosity (apply_hypervis_packed_t
    over a mesh): per subcycle, two (local weak-Laplacian kernel ->
    sharded banded DSS) passes."""
    f = uvt.dtype
    sc = jnp.asarray(nu_ratio, jnp.float32).reshape(1, 1) * jnp.ones(
        (1, 4), jnp.float32)
    step = jnp.asarray(dt, f) / subcycle * jnp.asarray(nu, f)
    x = uvt
    for _ in range(subcycle):
        l1 = _lanewise_vlap(mesh, sc, dxbt, dybt, meta, x, eb, nlev,
                            interpret)
        a1 = dss_banded_t(l1, plan, rsp_lanes, mesh, m,
                          interpret=interpret)
        l2 = _lanewise_vlap(mesh, sc, dxbt, dybt, meta, a1, eb, nlev,
                            interpret)
        a2 = dss_banded_t(l2, plan, rsp_lanes, mesh, m,
                          interpret=interpret)
        x = x - step * a2
    return x


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "interpret"))
def tracer_banded_t(dxbt, dybt, meta, vu, vv, qdp, plan, rsp_lanes,
                    mesh: Mesh, m: int, dt, eb: int, nlev: int,
                    interpret: bool = False):
    """Band-sharded SSPRK3 tracer transport (ssprk3_tracer_packed_t over
    a mesh, no limiter). Requires a CONTINUOUS qdp."""
    from ..kernels.tracer_pallas_t import tracer_euler_pallas_packed_t

    f = qdp.dtype
    scal = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(
        jnp.asarray(dt, jnp.float32))

    def euler_body(scal, dxbt, dybt, meta, vu, vv, q):
        return tracer_euler_pallas_packed_t(
            scal, dxbt, dybt, meta, vu, vv, q, eb=eb, nlev=nlev,
            interpret=interpret)

    euler = shard_map(euler_body, mesh=mesh,
                      in_specs=(_REP, _REP, _REP, _SPEC_L, _SPEC_L,
                                _SPEC_L, _SPEC_L),
                      out_specs=_SPEC_L, check_vma=False)

    def stage(q):
        e = euler(scal, dxbt, dybt, meta, vu, vv, q)
        return dss_banded_t(e, plan, rsp_lanes, mesh, m,
                            interpret=interpret)

    q1 = stage(qdp)
    q2 = f.type(0.75) * qdp + f.type(0.25) * stage(q1)
    return f.type(1.0 / 3.0) * qdp + f.type(2.0 / 3.0) * stage(q2)


@partial(jax.jit, static_argnames=("nu", "plan", "mesh", "m", "eb", "nlev",
                                   "qsplit", "moist", "subcycle",
                                   "interpret"))
def prim_step_banded_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                        s0, qdp, pecnd, vn0u, vn0v, omg, plan, rsp_lanes,
                        mesh: Mesh, m: int, nu, eb: int, nlev: int,
                        qsplit: int = 1, nu_ratio=1.0, moist: bool = True,
                        subcycle: int = 1, interpret: bool = False):
    """FULL prim cadence, band-sharded (the multi-chip analog of
    step_pallas.prim_step_packed_t4). Returns
    (s_np1, qdp', phi, vn0u', vn0v', omega_p')."""
    k = nlev
    dt = scal[0, 0]

    s1, phi, vn0u1, vn0v1, omg1 = ssprk3_banded_t4(
        scal, dxbt, dybt, ainct, astrt, bstrt, meta, s0,
        qdp[:k], pecnd, vn0u, vn0v, omg, plan, rsp_lanes, mesh, m,
        eb=eb, nlev=nlev, moist=moist, interpret=interpret)

    if nu:
        uvt = hypervis_banded_t(
            dxbt, dybt, meta, s1[:3 * k], plan, rsp_lanes, mesh, m, nu, dt,
            eb=eb, nlev=nlev, nu_ratio=nu_ratio, subcycle=subcycle,
            interpret=interpret)
        s1 = jnp.concatenate([uvt, s1[3 * k:]], axis=0)

    vu, vv = s1[0:k], s1[k:2 * k]
    dt_q = dt / max(qsplit, 1)
    for _ in range(max(qsplit, 1)):
        qdp = tracer_banded_t(dxbt, dybt, meta, vu, vv, qdp, plan,
                              rsp_lanes, mesh, m, dt_q, eb=eb, nlev=nlev,
                              interpret=interpret)
    return s1, qdp, phi, vn0u1, vn0v1, omg1
