"""Packed-transposed Pallas tracer advection (EulerStepFunctor analog).

Reference parity: EulerStepFunctor.hpp:33-69 — qdp_out = qdp - dt *
div(vstar * qdp) per tracer, via the fused alpha/beta divergence update
(SphereOperators.hpp:362-403). Here the tracers ride the SUBLANE axis of
the transposed packed layout ([qsize*nlev, E16]), so one kernel advects
every tracer with the same block-diagonal MXU derivative matmuls as the
CAAR kernel; spheremp is folded into the output so the structured Pallas
DSS (kernels/dss_pallas.py) completes the continuous projection
rsp * DSS(sph * x) without an extra pass.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NPSQ
from ..constants import CONSTANTS
from .fdot import make_dots, make_sel
from .layout import META_COLS

__all__ = ["tracer_euler_pallas_packed_t", "tracer_euler_pallas_packed_t_ext"]

_MC = {name: i for i, name in enumerate(META_COLS)}


def _tracer_kernel_t(split, rrearth, nq, fold_sph, ext, cM, *refs):
    cq_ref = None
    if ext and cM:
        (sf_ref, cq_ref, scal_ref, dxbt_ref, dybt_ref, meta_ref,
         vu_ref, vv_ref, q_ref, o_ref, ext_ref) = refs
    elif ext:
        (sf_ref, scal_ref, dxbt_ref, dybt_ref, meta_ref,
         vu_ref, vv_ref, q_ref, o_ref, ext_ref) = refs
    else:
        (scal_ref, dxbt_ref, dybt_ref, meta_ref,
         vu_ref, vv_ref, q_ref, o_ref) = refs
    f32 = jnp.float32
    dt = scal_ref[0, 0]
    dot, _, _ = make_dots(split)

    def row(name):
        i = _MC[name]
        return meta_ref[i:i + 1, :]

    dxbt, dybt = dxbt_ref[:], dybt_ref[:]
    dinv00, dinv01 = row("dinv00"), row("dinv01")
    dinv10, dinv11 = row("dinv10"), row("dinv11")
    metdet, rmetdet = row("metdet"), row("rmetdet")
    sph = row("spheremp")
    rr = f32(rrearth)
    vu, vv = vu_ref[:], vv_ref[:]
    k = vu.shape[0]
    lanes = vu.shape[1]

    # ALL tracers ride one tall [nq*k, lanes] contraction: per-tracer
    # [k, 128] dots leave the MXU's M dimension mostly idle (measured
    # 8.7 ms/stage at q35 ne30 vs ~2.6 ms bytes-roofline); the winds
    # broadcast over the tracer axis, then ONE derivative dot per
    # direction covers every tracer at full MXU occupancy.
    q = q_ref[:]
    if nq > 1:
        q3 = q.reshape(nq, k, lanes)
        vq1 = (q3 * vu).reshape(nq * k, lanes)
        vq2 = (q3 * vv).reshape(nq * k, lanes)
    else:
        vq1, vq2 = vu * q, vv * q
    gv1 = metdet * (dinv00 * vq1 + dinv01 * vq2)
    gv2 = metdet * (dinv10 * vq1 + dinv11 * vq2)
    div = (dot(gv1, dxbt) + dot(gv2, dybt)) * (rmetdet * rr)
    adv = q - dt * div
    out = sph * adv if fold_sph else adv
    o_ref[:] = out
    if ext:
        # producer-fused tile extraction for the DSS fixup (see
        # kernels/dss_pallas.py::ext_slot_arrays)
        @pl.when(sf_ref[1, pl.program_id(0)] == 1)
        def _write_slab():
            if cM:
                sel_l, _ = make_sel(split)
                ext_ref[:] = sel_l(cq_ref[:], out.T)
            else:
                ext_ref[:] = out.T


@partial(jax.jit, static_argnames=("eb", "nlev", "fold_sph", "wind_rows",
                                   "interpret"))
def tracer_euler_pallas_packed_t(scal, dxbt, dybt, meta, vu, vv, qdp,
                                 eb: int, nlev: int, fold_sph: bool = True,
                                 wind_rows: tuple = (0, 0),
                                 interpret: bool = False):
    """spheremp * (qdp - dt*div(vstar*qdp)) for the stacked
    [qsize*nlev, E16] tracer block; ``scal[0, 0]`` carries dt.
    ``fold_sph=False`` returns the plain advected value (the limiter path
    applies spheremp after clipping). ``wind_rows`` are the nlev-row BLOCK
    indices of the u/v winds inside ``vu``/``vv`` — pass the stacked
    prognostic state as both with wind_rows=(0, 1) to read the winds
    in place (no slice copies)."""
    qk, e16 = qdp.shape
    k = nlev
    assert qk % k == 0, (qk, k)
    nq = qk // k
    eb16 = eb * NPSQ
    assert e16 % eb16 == 0, (e16, eb16)
    nblocks = e16 // eb16
    wu, wv = wind_rows
    assert vu.shape[0] >= (wu + 1) * k and vv.shape[0] >= (wv + 1) * k

    fld = lambda r: pl.BlockSpec((r, eb16), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    row = lambda r: pl.BlockSpec((k, eb16), lambda i, r=r: (r, i),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = partial(_tracer_kernel_t, not interpret, CONSTANTS.rrearth, nq,
                     fold_sph, False, 0)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rep((eb16, eb16)), rep((eb16, eb16)),
            pl.BlockSpec((len(META_COLS), eb16), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            row(wu), row(wv), fld(qk),
        ],
        out_specs=fld(qk),
        out_shape=jax.ShapeDtypeStruct((qk, e16), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nblocks * nq * 2 * 2 * eb16 * eb16 * k,
            bytes_accessed=2 * (qk + k) * e16 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, dxbt, dybt, meta, vu, vv, qdp)


@partial(jax.jit, static_argnames=("nt", "nlev", "fold_sph", "wind_rows",
                                   "cM", "interpret"))
def tracer_euler_pallas_packed_t_ext(scal, dxbt, dybt, meta, vu, vv, qdp,
                                     sf, nt: int, nlev: int,
                                     fold_sph: bool = True,
                                     wind_rows: tuple = (0, 0),
                                     cq=None, cM: int = 0,
                                     interpret: bool = False):
    """`tracer_euler_pallas_packed_t` with producer-fused tile extraction:
    second output is the transposed affected-tile slab [nt*128, qk] for
    dss_structured_t_pallas_pre (see kernels.dss_pallas.ext_slot_arrays).
    Lane grid fixed at 128-lane blocks; requires e16 % 128 == 0.
    ``wind_rows`` as in the unfused variant. ``cq``/``cM``
    (kernels.dss_pallas.cext_tables) switch the slab to the COMPACT
    fix-lane layout [nt*cM, qk] for dss_structured_t_pallas_cpre."""
    qk, e16 = qdp.shape
    k = nlev
    assert qk % k == 0, (qk, k)
    nq = qk // k
    assert e16 % 128 == 0, e16
    nblocks = e16 // 128
    assert sf.shape == (2, nblocks), (sf.shape, nblocks)
    eb16 = 128
    wu, wv = wind_rows
    assert vu.shape[0] >= (wu + 1) * k and vv.shape[0] >= (wv + 1) * k

    fld = lambda r: pl.BlockSpec((r, eb16), lambda i, sf: (0, i),
                                 memory_space=pltpu.VMEM)
    row = lambda r: pl.BlockSpec((k, eb16), lambda i, sf, r=r: (r, i),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                     memory_space=pltpu.VMEM)
    srows = cM if cM else 128
    kernel = partial(_tracer_kernel_t, not interpret, CONSTANTS.rrearth, nq,
                     fold_sph, True, cM)
    in_specs = [
        pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                     memory_space=pltpu.SMEM),
        rep((eb16, eb16)), rep((eb16, eb16)),
        pl.BlockSpec((len(META_COLS), eb16), lambda i, sf: (0, i),
                     memory_space=pltpu.VMEM),
        row(wu), row(wv), fld(qk),
    ]
    operands = [sf, scal, dxbt, dybt, meta, vu, vv, qdp]
    if cM:
        in_specs.insert(0, pl.BlockSpec(
            (cM, 128), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        operands.insert(1, cq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[fld(qk),
                   pl.BlockSpec((srows, qk), lambda i, sf: (sf[0, i], 0),
                                memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((qk, e16), jnp.float32),
                   jax.ShapeDtypeStruct((nt * srows, qk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=nblocks * nq * 2 * 2 * eb16 * eb16 * k,
            bytes_accessed=2 * (qk + k) * e16 * 4 + nt * srows * qk * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
