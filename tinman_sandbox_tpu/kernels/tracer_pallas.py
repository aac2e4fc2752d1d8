"""Fused Pallas tracer-advection kernel (EulerStepFunctor fast path).

The reference's second compute functor (level_vectorized_ppscan/
EulerStepFunctor.hpp:33-69, built with the tracer-heavy QSIZE_D=35 config of
level_vectorized_ppscan/config.h.in): for every tracer
    qdp' = qdp - dt * div(vstar * qdp).

TPU-native layout: tracers x levels ride the lane axis — the block is
``[eb*16, qsize*nlev]``, so the two Dvv contractions are the same
block-diagonal MXU matmuls as the CAAR kernel but with a qsize-times wider
RHS (q=35, nlev=72 -> 2520 lanes per matmul).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NPSQ, Config
from .caar_pallas import _MC
from .fdot import make_dots
from .layout import META_COLS, block_derivative_ops, pack_field

__all__ = ["euler_step_pallas", "euler_step_pallas_packed"]


def _tracer_kernel(split, rrearth, scal_ref, dxb_ref, dyb_ref, meta_ref,
                   vu_ref, vv_ref, qdp_ref, out_ref):
    f32 = jnp.float32
    dt = scal_ref[0, 0]
    qk = qdp_ref.shape[1]
    k = vu_ref.shape[1]
    nq = qk // k

    def col(name):
        return meta_ref[:, _MC[name]][:, None]

    dot, _, _ = make_dots(split)

    # broadcast the advective velocity over tracers along lanes
    vu = jnp.concatenate([vu_ref[:]] * nq, axis=1) if nq > 1 else vu_ref[:]
    vv = jnp.concatenate([vv_ref[:]] * nq, axis=1) if nq > 1 else vv_ref[:]
    qdp = qdp_ref[:]
    vq1, vq2 = vu * qdp, vv * qdp

    dinv00, dinv01 = col("dinv00"), col("dinv01")
    dinv10, dinv11 = col("dinv10"), col("dinv11")
    metdet, rmetdet = col("metdet"), col("rmetdet")
    gv1 = metdet * (dinv00 * vq1 + dinv01 * vq2)
    gv2 = metdet * (dinv10 * vq1 + dinv11 * vq2)
    div = (dot(dxb_ref[:], gv1) + dot(dyb_ref[:], gv2)) * (
        rmetdet * f32(rrearth)
    )
    out_ref[:] = qdp - dt * div


@partial(jax.jit, static_argnames=("eb", "nlev", "qsize", "interpret"))
def euler_step_pallas_packed(scal, dxb, dyb, meta, vu, vv, qdp,
                             eb: int, nlev: int, qsize: int,
                             interpret: bool = False):
    """qdp' on packed arrays: vu/vv [E16, nlev], qdp [E16, qsize*nlev]."""
    from ..constants import CONSTANTS

    e16 = vu.shape[0]
    eb16 = eb * NPSQ
    assert e16 % eb16 == 0
    nblocks = e16 // eb16
    qk = qsize * nlev

    fld = lambda w: pl.BlockSpec((eb16, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_tracer_kernel, not interpret, CONSTANTS.rrearth),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rep((eb16, eb16)), rep((eb16, eb16)),
            pl.BlockSpec((eb16, len(META_COLS)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            fld(nlev), fld(nlev), fld(qk),
        ],
        out_specs=fld(qk),
        out_shape=jax.ShapeDtypeStruct((e16, qk), jnp.float32),
        interpret=interpret,
    )(scal, dxb, dyb, meta, vu, vv, qdp)


def euler_step_pallas(qdp, vstar_u, vstar_v, geom, cfg: Config, dt,
                      interpret: bool = False):
    """Full-state wrapper matching timeloop.tracer.euler_step's contract:
    qdp [nelem, qsize, nlev, np, np] -> same shape advanced by -dt*div."""
    from .layout import pack_meta

    eb = cfg.elem_block
    nelem, qsize = qdp.shape[0], qdp.shape[1]
    dxb, dyb = block_derivative_ops(eb, geom.dvv, jnp.float32)
    meta = pack_meta(geom, jnp.zeros((nelem, 4, 4), jnp.float32))
    # pack tracers along lanes: [e, q, k, i, j] -> [e, i, j, q, k] -> [e*16, q*k]
    qt = jnp.transpose(jnp.asarray(qdp, jnp.float32), (0, 3, 4, 1, 2))
    qp = qt.reshape(nelem * NPSQ, qsize * cfg.nlev)
    vu = pack_field(jnp.asarray(vstar_u, jnp.float32))
    vv = pack_field(jnp.asarray(vstar_v, jnp.float32))
    scal = jnp.stack([jnp.asarray(dt, jnp.float32)] + [jnp.zeros((), jnp.float32)] * 3).reshape(1, 4)
    out = euler_step_pallas_packed(scal, dxb, dyb, meta, vu, vv, qp,
                                   eb=eb, nlev=cfg.nlev, qsize=qsize,
                                   interpret=interpret)
    out = out.reshape(nelem, 4, 4, qsize, cfg.nlev)
    return jnp.transpose(out, (0, 3, 4, 1, 2))
