"""Packed-transposed Pallas kernel for the hyperviscosity Laplacians.

One pass over the stacked [3*nlev, E16] (u, v, T) layout computes

* the weak VECTOR Laplacian of (u, v) in the contravariant formulation
  grad_wk(nu_ratio * div) - curl_wk(vort) + undamped rigid rotation
  (ops/sphere.py::vlaplace_sphere_wk_contra; reference
  SphereOperators.hpp:938-994), and
* the weak SCALAR Laplacian of T, div_wk(grad(T))
  (ops/sphere.py::laplace_simple; hpp:537-550),

using the same block-diagonal MXU derivative matmuls as the CAAR kernel
(kernels/layout.py::block_derivative_ops). The weak (adjoint)
contractions `_ax`/`_ay` are the TRANSPOSES of the strong ones, so the
kernel takes both orientations of the derivative blocks as operands.
metinv is reconstructed in-kernel from Dinv (metinv = (D^T D)^-1 =
Dinv Dinv^T — exact because Dinv is stored as the exact 2x2 inverse).

This is the hot half of `timeloop/hyperviscosity.py::biharmonic_wk`:
two (this kernel -> structured Pallas DSS) passes per subcycle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NPSQ
from ..constants import CONSTANTS
from .fdot import make_dots, make_sel
from .layout import META_COLS

__all__ = ["vlap_pallas_packed_t", "vlap_pallas_packed_t_ext"]

_MC = {name: i for i, name in enumerate(META_COLS)}


def _vlap_kernel_t(split, rrearth, ext, cM, fast, *refs):
    # u/v/t arrive as separate k-row refs so callers can alias them into a
    # TALLER stacked state (e.g. the [4*nlev] prognostic buffer) via
    # row-block index maps — no XLA slice copy feeding the kernel
    cq_ref = None
    if ext and cM:
        (sf_ref, cq_ref, scal_ref, dxbt_ref, dybt_ref, dxb_ref, dyb_ref,
         meta_ref, u_ref, v_ref, t_ref, o_ref, ext_ref) = refs
    elif ext:
        (sf_ref, scal_ref, dxbt_ref, dybt_ref, dxb_ref, dyb_ref, meta_ref,
         u_ref, v_ref, t_ref, o_ref, ext_ref) = refs
    else:
        (scal_ref, dxbt_ref, dybt_ref, dxb_ref, dyb_ref, meta_ref,
         u_ref, v_ref, t_ref, o_ref) = refs
    f32 = jnp.float32
    nu_ratio = scal_ref[0, 0]
    # fast=True: 1-pass MXU dots (operands truncated to bf16, ~4e-3 rel)
    # for the DAMPING operator only — hyperviscosity is an empirically
    # tuned dissipation term with no mass coupling (u, v, T only), so the
    # 3-pass f32-split precision is negotiable here in a way it is not in
    # the dynamics; measured A/B in BENCH_LOCAL (hv_dots).
    dot, _, _ = make_dots(split and not fast)

    def row(name):
        i = _MC[name]
        return meta_ref[i:i + 1, :]

    dxbt, dybt = dxbt_ref[:], dybt_ref[:]
    dxb, dyb = dxb_ref[:], dyb_ref[:]
    dinv00, dinv01 = row("dinv00"), row("dinv01")
    dinv10, dinv11 = row("dinv10"), row("dinv11")
    d00, d01, d10, d11 = row("d00"), row("d01"), row("d10"), row("d11")
    metdet, rmetdet = row("metdet"), row("rmetdet")
    sph, mp = row("spheremp"), row("mp")
    rr = f32(rrearth)

    # metinv = Dinv Dinv^T (the [2,2] contravariant metric)
    mi00 = dinv00 * dinv00 + dinv01 * dinv01
    mi01 = dinv00 * dinv10 + dinv01 * dinv11
    mi11 = dinv10 * dinv10 + dinv11 * dinv11

    k = u_ref.shape[0]
    u, v, t = u_ref[:], v_ref[:], t_ref[:]

    # -- scalar: laplace_simple(T) = div_wk(grad(T)) --------------------------
    v1 = dot(t, dxbt) * rr
    v2 = dot(t, dybt) * rr
    g1 = dinv00 * v1 + dinv10 * v2
    g2 = dinv01 * v1 + dinv11 * v2
    c1 = dinv00 * g1 + dinv01 * g2
    c2 = dinv10 * g1 + dinv11 * g2
    lap_t = -rr * (dot(sph * c1, dxb) + dot(sph * c2, dyb))

    # -- vector: vlaplace_sphere_wk_contra(u, v) ------------------------------
    gv1 = metdet * (dinv00 * u + dinv01 * v)
    gv2 = metdet * (dinv10 * u + dinv11 * v)
    div = (dot(gv1, dxbt) + dot(gv2, dybt)) * (rmetdet * rr)
    vco1 = d00 * u + d10 * v
    vco2 = d01 * u + d11 * v
    vort = (dot(vco2, dxbt) - dot(vco1, dybt)) * (rmetdet * rr)

    # grad_sphere_wk_testcov(nu_ratio * div)
    xg = mp * (nu_ratio * div)
    axg = dot(xg, dxb)
    ayg = dot(xg, dyb)
    b0 = -metdet * (mi00 * axg + mi01 * ayg)
    b1 = -metdet * (mi01 * axg + mi11 * ayg)
    gw1 = (d00 * b0 + d01 * b1) * rr
    gw2 = (d10 * b0 + d11 * b1) * rr

    # curl_sphere_wk_testcov(vort)
    xc = mp * vort
    c0 = -dot(xc, dyb)
    c1c = dot(xc, dxb)
    cw1 = (d00 * c0 + d01 * c1c) * rr
    cw2 = (d10 * c0 + d11 * c1c) * rr

    rigid = (2.0 * rr * rr) * sph
    lu = rigid * u + (gw1 - cw1)
    lv = rigid * v + (gw2 - cw2)
    o_ref[0:k] = lu
    o_ref[k:2 * k] = lv
    o_ref[2 * k:3 * k] = lap_t
    if ext:
        # producer-fused tile extraction for the DSS fixup (see
        # kernels/dss_pallas.py::ext_slot_arrays)
        @pl.when(sf_ref[1, pl.program_id(0)] == 1)
        def _write_slab():
            if cM:
                sel_l, _ = make_sel(split)
                cq = cq_ref[:]
                ext_ref[:, 0:k] = sel_l(cq, lu.T)
                ext_ref[:, k:2 * k] = sel_l(cq, lv.T)
                ext_ref[:, 2 * k:3 * k] = sel_l(cq, lap_t.T)
            else:
                ext_ref[:, 0:k] = lu.T
                ext_ref[:, k:2 * k] = lv.T
                ext_ref[:, 2 * k:3 * k] = lap_t.T


@partial(jax.jit, static_argnames=("eb", "nlev", "fast_dots",
                                   "interpret"))
def vlap_pallas_packed_t(scal, dxbt, dybt, meta, x,
                         eb: int, nlev: int, fast_dots: bool = False,
                         interpret: bool = False):
    """Weak (vlaplace_u, vlaplace_v, laplace_T) of the (u, v, T) rows of
    the stacked field ``x`` — spheremp-weighted residuals, to be closed by
    rspheremp * DSS. ``scal[0, 0]`` carries nu_ratio (hpp:938 nu_div/nu).
    ``x`` may be TALLER than [3*nlev, E16] (e.g. the full [4*nlev]
    prognostic buffer): only its first three nlev-row blocks are read,
    via row-block index maps — no slice copy. Output is [3*nlev, E16]."""
    kx, e16 = x.shape
    k = nlev
    assert kx >= 3 * k and kx % k == 0, (kx, k)
    eb16 = eb * NPSQ
    assert e16 % eb16 == 0, (e16, eb16)
    nblocks = e16 // eb16
    f = jnp.float32

    fld = lambda r: pl.BlockSpec((r, eb16), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    row = lambda r: pl.BlockSpec((k, eb16),
                                 lambda i, r=r: (r, i),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = partial(_vlap_kernel_t, not interpret, CONSTANTS.rrearth, False,
                     0, fast_dots)
    # 8 strong/adjoint derivative matmuls per block
    flops_per_block = 8 * 2 * eb16 * eb16 * k
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rep((eb16, eb16)), rep((eb16, eb16)),
            rep((eb16, eb16)), rep((eb16, eb16)),
            pl.BlockSpec((len(META_COLS), eb16), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            row(0), row(1), row(2),
        ],
        out_specs=fld(3 * k),
        out_shape=jax.ShapeDtypeStruct((3 * k, e16), f),
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=6 * e16 * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, dxbt, dybt,
      jnp.swapaxes(dxbt, 0, 1), jnp.swapaxes(dybt, 0, 1), meta, x, x, x)


def _vlap_kernel_t_lg(split, rrearth, fast, lg, ext, cM, *refs):
    """Lane-grouped vlap body: lg independent 128-lane groups per grid
    step (same MXU shapes/fp-op order as `_vlap_kernel_t`; grid / lg —
    the ne120/headline lane-grouping ledger applied to the
    hyperviscosity kernel). With ``ext``, each affected group also emits
    its compact DSS slab rows (cext_tables_lg super-block layout) by
    reading back its just-written output slice."""
    sf_ref = cq_ref = ext_ref = None
    refs = list(refs)
    if ext:
        sf_ref = refs.pop(0)
        cq_ref = refs.pop(0)
        ext_ref = refs.pop()
    (scal_ref, dxbt_ref, dybt_ref, dxb_ref, dyb_ref, meta_ref,
     u_ref, v_ref, t_ref, o_ref) = refs
    k = u_ref.shape[0]
    for g in range(lg):
        sl = slice(g * 128, (g + 1) * 128)

        class _V:                     # ref-like lane-slice views
            def __init__(self, ref):
                self.ref = ref

            def __getitem__(self, idx):
                if isinstance(idx, tuple):
                    rows = idx[0]
                else:
                    rows = idx
                return self.ref[rows, sl]

            @property
            def shape(self):
                return (self.ref.shape[0], 128)

        class _O:
            def __setitem__(self, idx, val):
                rows = idx[0] if isinstance(idx, tuple) else idx
                o_ref[rows, sl] = val

        _vlap_kernel_t(split, rrearth, False, 0, fast,
                       scal_ref, dxbt_ref, dybt_ref, dxb_ref, dyb_ref,
                       _V(meta_ref), _V(u_ref), _V(v_ref), _V(t_ref),
                       _O())
        if ext:
            @pl.when(sf_ref[1 + g, pl.program_id(0)] == 1)
            def _write_slab(g=g, sl=sl):
                sel_l, _ = make_sel(split)
                q = cq_ref[g * cM:(g + 1) * cM]
                rsl = slice(g * cM, (g + 1) * cM)
                ext_ref[rsl, 0:k] = sel_l(q, o_ref[0:k, sl].T)
                ext_ref[rsl, k:2 * k] = sel_l(q, o_ref[k:2 * k, sl].T)
                ext_ref[rsl, 2 * k:3 * k] = sel_l(
                    q, o_ref[2 * k:3 * k, sl].T)


@partial(jax.jit, static_argnames=("nlev", "lg", "fast_dots", "nslots",
                                   "cM", "interpret"))
def vlap_pallas_packed_t_lg(scal, dxbt, dybt, meta, x,
                            nlev: int, lg: int = 4,
                            fast_dots: bool = False,
                            sf=None, cq=None, nslots: int = 0,
                            cM: int = 0,
                            interpret: bool = False):
    """Lane-grouped `vlap_pallas_packed_t`: lane width 128*lg, grid
    length e16/(128*lg); with ``sf``/``cq`` (cext_tables_lg) also emits
    the compact DSS slab [nslots*lg*cM, 3*nlev]. Requires
    e16 % (128*lg) == 0."""
    kx, e16 = x.shape
    k = nlev
    assert kx >= 3 * k and kx % k == 0, (kx, k)
    w = 128 * lg
    assert e16 % w == 0, (e16, w)
    nblocks = e16 // w
    f = jnp.float32
    ext = sf is not None

    if ext:
        fld = lambda r: pl.BlockSpec((r, w), lambda i, sf: (0, i),
                                     memory_space=pltpu.VMEM)
        row = lambda r: pl.BlockSpec((k, w), lambda i, sf, r=r: (r, i),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), w),
                                 lambda i, sf: (0, i),
                                 memory_space=pltpu.VMEM)
    else:
        fld = lambda r: pl.BlockSpec((r, w), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
        row = lambda r: pl.BlockSpec((k, w), lambda i, r=r: (r, i),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), w), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    kernel = partial(_vlap_kernel_t_lg, not interpret, CONSTANTS.rrearth,
                     fast_dots, lg, ext, cM if ext else 0)
    in_specs = [
        smem,
        rep((128, 128)), rep((128, 128)),
        rep((128, 128)), rep((128, 128)),
        meta_spec,
        row(0), row(1), row(2),
    ]
    operands = [scal, dxbt, dybt,
                jnp.swapaxes(dxbt, 0, 1), jnp.swapaxes(dybt, 0, 1),
                meta, x, x, x]
    out_specs = [fld(3 * k)]
    out_shape = [jax.ShapeDtypeStruct((3 * k, e16), f)]
    nbytes = 6 * e16 * k * 4
    if ext:
        assert sf.shape == (1 + lg, nblocks), (sf.shape, lg, nblocks)
        in_specs.insert(0, pl.BlockSpec(
            (lg * cM, 128), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        operands = [sf, cq] + operands
        out_specs.append(pl.BlockSpec(
            (lg * cM, 3 * k), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((nslots * lg * cM, 3 * k), f))
        nbytes += nslots * lg * cM * 3 * k * 4
        grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nblocks,),
            in_specs=in_specs, out_specs=out_specs))
    else:
        grid_kw = dict(grid=(nblocks,), in_specs=in_specs,
                       out_specs=out_specs)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape if ext else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=nblocks * lg * 8 * 2 * 128 * 128 * k,
            bytes_accessed=nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
        **grid_kw,
    )(*operands)
    return out


@partial(jax.jit, static_argnames=("nt", "nlev", "cM", "fast_dots",
                                   "interpret"))
def vlap_pallas_packed_t_ext(scal, dxbt, dybt, meta, x, sf,
                             nt: int, nlev: int, cq=None, cM: int = 0,
                             fast_dots: bool = False,
                             interpret: bool = False):
    """`vlap_pallas_packed_t` with producer-fused tile extraction: ``sf``
    is the slot/flag table from kernels.dss_pallas.ext_slot_arrays and the
    second output is the transposed affected-tile slab [nt*128, 3*nlev]
    for dss_structured_t_pallas_pre. Lane grid fixed at 128-lane blocks
    (elem_block == 8); requires e16 % 128 == 0. ``x`` may be taller than
    [3*nlev] (only the first three nlev-row blocks are read). ``cq``/``cM``
    (kernels.dss_pallas.cext_tables) switch the slab to the COMPACT
    fix-lane layout [nt*cM, 3*nlev] for dss_structured_t_pallas_cpre."""
    kx, e16 = x.shape
    k = nlev
    assert kx >= 3 * k and kx % k == 0, (kx, k)
    assert e16 % 128 == 0, e16
    nblocks = e16 // 128
    assert sf.shape == (2, nblocks), (sf.shape, nblocks)
    eb16 = 128
    f = jnp.float32

    fld = lambda r: pl.BlockSpec((r, eb16), lambda i, sf: (0, i),
                                 memory_space=pltpu.VMEM)
    row = lambda r: pl.BlockSpec((k, eb16),
                                 lambda i, sf, r=r: (r, i),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                     memory_space=pltpu.VMEM)
    srows = cM if cM else 128
    kernel = partial(_vlap_kernel_t, not interpret, CONSTANTS.rrearth, True,
                     cM, fast_dots)
    flops_per_block = 8 * 2 * eb16 * eb16 * k
    in_specs = [
        pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                     memory_space=pltpu.SMEM),
        rep((eb16, eb16)), rep((eb16, eb16)),
        rep((eb16, eb16)), rep((eb16, eb16)),
        pl.BlockSpec((len(META_COLS), eb16), lambda i, sf: (0, i),
                     memory_space=pltpu.VMEM),
        row(0), row(1), row(2),
    ]
    operands = [sf, scal, dxbt, dybt,
                jnp.swapaxes(dxbt, 0, 1), jnp.swapaxes(dybt, 0, 1),
                meta, x, x, x]
    if cM:
        in_specs.insert(0, pl.BlockSpec(
            (cM, 128), lambda i, sf: (sf[0, i], 0),
            memory_space=pltpu.VMEM))
        operands.insert(1, cq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[fld(3 * k),
                   pl.BlockSpec((srows, 3 * k), lambda i, sf: (sf[0, i], 0),
                                memory_space=pltpu.VMEM)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((3 * k, e16), f),
                   jax.ShapeDtypeStruct((nt * srows, 3 * k), f)],
        cost_estimate=pl.CostEstimate(
            flops=nblocks * flops_per_block,
            bytes_accessed=6 * e16 * k * 4 + nt * srows * 3 * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
