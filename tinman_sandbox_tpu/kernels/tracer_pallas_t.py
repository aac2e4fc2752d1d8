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

__all__ = ["tracer_euler_pallas_packed_t", "tracer_euler_pallas_packed_t_ext",
           "tracer_limit_pallas_packed_t_ext"]

_MC = {name: i for i, name in enumerate(META_COLS)}


def _group_tables(dtype=jnp.bfloat16):
    """One-hot group-sum operators for 16-lane element groups in a
    128-lane block: Gd [128, 8] (down: lane -> its group's column) and
    Gu [8, 128] (up: group value -> all 16 of its lanes). Exact in bf16
    (0/1 entries)."""
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1)
    gd = (li // 16 == gi).astype(dtype)
    gj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    gu = (lj // 16 == gj).astype(dtype)
    return gd, gu


def _gsum8(x, gd, limbs: int):
    """Group sums [r, 128] -> [r, 8] via the one-hot down-dot.
    limbs=2 splits x into bf16 hi+lo (each product exact; ~1e-7 rel),
    limbs=1 truncates to bf16 (~4e-3 rel — enough for redistribution
    coefficients, whose error the final conservation pass absorbs)."""
    if gd is None:                          # interpret: plain f32 math
        r = x.shape[0]
        return x.reshape(r, 8, 16).sum(axis=2)
    hi = x.astype(jnp.bfloat16)
    out = jax.lax.dot(hi, gd, preferred_element_type=jnp.float32)
    if limbs == 2:
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jax.lax.dot(lo, gd, preferred_element_type=jnp.float32)
    return out


def _bcast8(s, gu):
    """[r, 8] group values -> [r, 128] lanes (bf16 one-limb: the
    broadcast feeds redistribution coefficients only)."""
    if gu is None:                          # interpret
        return jnp.repeat(s, 16, axis=1)
    return jax.lax.dot(s.astype(jnp.bfloat16), gu,
                       preferred_element_type=jnp.float32)


def _group_minmax(x, strategy: str):
    """Per-16-lane-group (min, max) of [r, 128], broadcast back to every
    lane of the group. ``strategy``:

    * "stride": 16 lane-strided slices + 15 min/max on [r, 8] + one-hot
      broadcast dots — cheapest, but Mosaic does NOT lower strided lane
      slices ("Shape mismatch" probe failure, r4) — interpret-only;
    * "roll": within-group cyclic butterfly (2 rolls + select + op per
      step, 4 steps) — guaranteed lowerable (the DSS sweeps are built on
      lane rolls), ~4x the VPU traffic;
    * "interp": plain reshape math for interpret mode.
    """
    r = x.shape[0]
    if strategy == "interp":
        x3 = x.reshape(r, 8, 16)
        mn = jnp.repeat(x3.min(axis=2), 16, axis=1)
        mx = jnp.repeat(x3.max(axis=2), 16, axis=1)
        return mn, mx
    if strategy == "stride":
        mn = mx = x[:, 0::16]
        for i in range(1, 16):
            sl = x[:, i::16]
            mn = jnp.minimum(mn, sl)
            mx = jnp.maximum(mx, sl)
        _, gu = _group_tables()
        # exact selection: min/max outputs are exact lane values, and a
        # one-hot bf16 dot of a bf16 pair reconstructs them... NOT exact
        # in one limb; bounds tolerate ~1e-3 (clip targets), but keep
        # them tight with a 2-limb broadcast (hi+lo both exact products)
        def b2(s):
            hi = s.astype(jnp.bfloat16)
            lo = (s - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jax.lax.dot(hi, gu, preferred_element_type=jnp.float32)
                    + jax.lax.dot(lo, gu,
                                  preferred_element_type=jnp.float32))
        return b2(mn), b2(mx)
    if strategy == "transpose":
        # in-VMEM transpose -> leading-axis reshape -> sublane-group
        # reduce -> broadcast -> transpose back. Measured 5.8 vs the roll
        # butterfly's 10.1 us/block at [2520, 128] (q35) — the butterfly
        # costs 32 VPU passes, this ~2 transposes + ~2 passes. Exact.
        r = x.shape[0]
        xt = x.T                                   # [128, r]
        x3 = xt.reshape(8, 16, r)
        mn3, mx3 = x3.min(axis=1), x3.max(axis=1)  # [8, r]
        b = lambda s: jax.lax.broadcast_in_dim(
            s, (8, 16, r), (0, 2)).reshape(128, r).T
        return b(mn3), b(mx3)
    if strategy == "transpose2":
        # the VERDICT r4 candidate: pack min AND max into ONE broadcast +
        # back-transpose ([256, r] -> [r, 256]) instead of two [128, r]
        # transposes — same element volume, half the transpose ops (each
        # Mosaic transpose carries fixed per-op relayout cost). Exact.
        r = x.shape[0]
        xt = x.T                                   # [128, r]
        x3 = xt.reshape(8, 16, r)
        mm = jnp.concatenate([x3.min(axis=1), x3.max(axis=1)], axis=0)
        bb = jax.lax.broadcast_in_dim(
            mm, (16, 16, r), (0, 2)).reshape(256, r).T   # [r, 256]
        return bb[:, :128], bb[:, 128:]
    assert strategy == "roll", strategy
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 16
    mn = mx = x
    for off in (1, 2, 4, 8):
        keep = lane < 16 - off
        rn = jnp.where(keep, jnp.roll(mn, -off, axis=1),
                       jnp.roll(mn, 16 - off, axis=1))
        rx = jnp.where(keep, jnp.roll(mx, -off, axis=1),
                       jnp.roll(mx, 16 - off, axis=1))
        mn = jnp.minimum(mn, rn)
        mx = jnp.maximum(mx, rx)
    return mn, mx


def _limit_lanes(y, q_in, w, split, strategy: str, iters: int = 2):
    """The monotone mass-conserving limiter (ops/limiter.py::limit_tracer
    math) on the packed lane layout inside a 128-lane kernel block:
    clamp ``y`` nodally into the per-(row, element) bounds of ``q_in``
    while conserving each group's sum(w*y). All group reductions are
    16-lane-group operations (one-hot MXU dots / lane shuffles) — no
    reshape of the packed layout. The final residual pass makes
    conservation exact with respect to the 2-limb group-sum functional
    regardless of the 1-limb redistribution coefficients."""
    f32 = jnp.float32
    tiny = jnp.finfo(f32).tiny
    if split:
        gd, gu = _group_tables()
    else:
        gd = gu = None
        strategy = "interp"
    qminb, qmaxb = _group_minmax(q_in, strategy)
    mass8 = _gsum8(w * y, gd, limbs=2)
    wsum8 = _gsum8(jnp.broadcast_to(w, (1, y.shape[1])).astype(f32), gd,
                   limbs=2)
    # deficit via the CANCELLATION-FREE clipped-off sum: mass - sum(w*yc)
    # as a 1-limb difference of two big numbers loses ~4e-3 of ITS OWN
    # size and the redistribution coefficients inherit an O(1) error
    # when the deficit is small (measured 8.9e-3 on-chip rel-max vs the
    # field path; 2.0e-6 with this formulation). gsum(w*(y - yc)) sums
    # the small clip amounts directly, and the room total is likewise a
    # direct small-quantity sum — both 4e-3 RELATIVE to themselves; the
    # carry tracks bound-infeasible leftovers across iterations. (The
    # identity-based variant — rooms from 2-limb bound sums — measured
    # ~4% slower at q35: the 'one-time' 2-limb sums run on every block.)
    carry8 = 0.0
    for _ in range(iters):
        yc = jnp.clip(y, qminb, qmaxb)
        d8 = _gsum8(w * (y - yc), gd, limbs=1) + carry8
        pos = d8 > 0
        db = _bcast8(jnp.where(pos, 1.0, -1.0), gu)
        room = jnp.where(db > 0, qmaxb - yc, yc - qminb)
        tot8 = _gsum8(w * room, gd, limbs=1)
        give8 = jnp.where(pos, jnp.minimum(d8, tot8),
                          jnp.maximum(d8, -tot8))
        carry8 = d8 - give8
        c8 = give8 / jnp.maximum(tot8, tiny)   # signed coefficient
        csb = _bcast8(c8, gu)
        bsel = jnp.where(db > 0, qmaxb, qminb)
        y = yc + jnp.abs(csb) * (bsel - yc)
    # exact-conservation fallback: spread the residual uniformly by weight
    s8 = _gsum8(w * y, gd, limbs=2)
    return y + _bcast8((mass8 - s8) / wsum8, gu)


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


def _tracer_limit_kernel_t(split, rrearth, nq, has_mix, strategy, cM,
                           iters, *refs):
    """Limited tracer stage kernel: e = q - dt*div(v*q);
    y = ca*mx + cb*e (the Shu-Osher combination, when has_mix);
    y = L(y, bounds(q)) (the monotone limiter, element-local);
    out = spheremp * y, plus the producer-fused DSS slab.

    This keeps the field path's exact nonlinear ordering P(L(combo))
    (dist/step_pallas.py limit branch) while eliminating its separate
    XLA combination passes and the 3x full-state reshape transposes —
    the VERDICT r3 item-2 fusion."""
    cq_ref = mx_ref = None
    refs = list(refs)
    sf_ref = refs.pop(0)
    if cM:
        cq_ref = refs.pop(0)
    (scal_ref, dxbt_ref, dybt_ref, meta_ref, vu_ref, vv_ref,
     q_ref) = refs[:7]
    refs = refs[7:]
    if has_mix:
        mx_ref = refs.pop(0)
    o_ref, ext_ref = refs
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
    y = q - dt * div
    if has_mix:
        y = scal_ref[0, 1] * mx_ref[:] + scal_ref[0, 2] * y
    y = _limit_lanes(y, q, sph, split, strategy, iters=iters)
    out = sph * y
    o_ref[:] = out

    @pl.when(sf_ref[1, pl.program_id(0)] == 1)
    def _write_slab():
        if cM:
            sel_l, _ = make_sel(split)
            ext_ref[:] = sel_l(cq_ref[:], out.T)
        else:
            ext_ref[:] = out.T


@partial(jax.jit, static_argnames=("nt", "nlev", "has_mix", "strategy",
                                   "wind_rows", "cM", "iters", "interpret"))
def tracer_limit_pallas_packed_t_ext(scal, dxbt, dybt, meta, vu, vv, qdp,
                                     mx, sf, nt: int, nlev: int,
                                     has_mix: bool = True,
                                     strategy: str = "transpose",
                                     wind_rows: tuple = (0, 0),
                                     cq=None, cM: int = 0, iters: int = 2,
                                     interpret: bool = False):
    """Fused LIMITED tracer stage with producer-fused slab extraction:
    sph * L(ca*mx + cb*(q - dt*div(v*q)), bounds(q)), slab second output.
    ``scal`` carries [dt, ca, cb, 0]. ``mx`` may be None (stage 1:
    y = advected value, no combination). Lane grid fixed at 128-lane
    blocks (e16 % 128 == 0). Returns (out, xd_t)."""
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
    kernel = partial(_tracer_limit_kernel_t, not interpret,
                     CONSTANTS.rrearth, nq, has_mix,
                     "interp" if interpret else strategy, cM, iters)
    in_specs = [
        pl.BlockSpec((1, 4), lambda i, sf: (0, 0),
                     memory_space=pltpu.SMEM),
        rep((eb16, eb16)), rep((eb16, eb16)),
        pl.BlockSpec((len(META_COLS), eb16), lambda i, sf: (0, i),
                     memory_space=pltpu.VMEM),
        row(wu), row(wv), fld(qk),
    ]
    operands = [sf, scal, dxbt, dybt, meta, vu, vv, qdp]
    if has_mix:
        in_specs.append(fld(qk))
        operands.append(mx)
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
            flops=nblocks * nq * (2 + 4) * 2 * eb16 * eb16 * k,
            bytes_accessed=(2 + (1 if has_mix else 0)) * (qk + k) * e16 * 4
            + nt * srows * qk * 4,
            transcendentals=0,
        ),
        # the limiter keeps several [qk, 128] intermediates live; at
        # QSIZE_D=35 (qk=2520) that overflows the default scoped VMEM
        # (measured 24.9M vs 21.3M limit) — raise the cap (v5e VMEM is
        # 128 MB; 40 MB scoped leaves pipelining headroom)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


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


def _tracer_kernel_t_lg(split, rrearth, nq, fold_sph, lg, ext, cM,
                        lane_axis, *refs):
    """Lane-grouped tracer Euler body: lg independent 128-lane groups
    per grid step (grid / lg; see the r4 lane-grouping ledger). With
    ``ext``, affected groups also emit their compact DSS slab rows
    (cext_tables_lg) by reading back the just-written output slice.
    ``lane_axis`` is the grid axis carrying the 128*lg lane super-blocks
    (1 in the row-chunked 2D grid, 0 otherwise); ``nq`` is the number of
    tracers IN THIS BLOCK (the per-chunk count when row-chunked)."""
    sf_ref = cq_ref = ext_ref = None
    refs = list(refs)
    if ext:
        sf_ref = refs.pop(0)
        cq_ref = refs.pop(0)
        ext_ref = refs.pop()
    (scal_ref, dxbt_ref, dybt_ref, meta_ref, vu_ref, vv_ref,
     q_ref, o_ref) = refs
    qk = q_ref.shape[0]
    for g in range(lg):
        sl = slice(g * 128, (g + 1) * 128)

        class _V:
            def __init__(self, ref):
                self.ref = ref

            def __getitem__(self, idx):
                rows = idx[0] if isinstance(idx, tuple) else idx
                return self.ref[rows, sl]

            @property
            def shape(self):
                return (self.ref.shape[0], 128)

        class _O:
            def __setitem__(self, idx, val):
                rows = idx[0] if isinstance(idx, tuple) else idx
                o_ref[rows, sl] = val

        _tracer_kernel_t(split, rrearth, nq, fold_sph, False, 0,
                         scal_ref, dxbt_ref, dybt_ref, _V(meta_ref),
                         _V(vu_ref), _V(vv_ref), _V(q_ref), _O())
        if ext:
            @pl.when(sf_ref[1 + g, pl.program_id(lane_axis)] == 1)
            def _write_slab(g=g, sl=sl):
                sel_l, _ = make_sel(split)
                q1h = cq_ref[g * cM:(g + 1) * cM]
                ext_ref[g * cM:(g + 1) * cM, :] = sel_l(
                    q1h, o_ref[0:qk, sl].T)


@partial(jax.jit, static_argnames=("nlev", "lg", "qc", "fold_sph",
                                   "wind_rows", "nslots", "cM", "vmem_mb",
                                   "interpret"))
def tracer_euler_pallas_packed_t_lg(scal, dxbt, dybt, meta, vu, vv, qdp,
                                    nlev: int, lg: int = 4, qc: int = 0,
                                    fold_sph: bool = True,
                                    wind_rows: tuple = (0, 0),
                                    sf=None, cq=None, nslots: int = 0,
                                    cM: int = 0, vmem_mb: int = 0,
                                    interpret: bool = False):
    """Lane-grouped `tracer_euler_pallas_packed_t` (lane width 128*lg,
    grid length e16/(128*lg); e16 % (128*lg) == 0); with ``sf``/``cq``
    (cext_tables_lg) also emits the compact DSS slab [nslots*lg*cM, qk].

    ``qc`` (0 < qc < nq, qc | nq) ROW-CHUNKS the tall stacked-tracer
    block: the grid becomes (nq/qc tracer chunks, lane super-blocks)
    with per-step blocks [qc*nlev, 128*lg], so QSIZE_D=35-class stacks
    (qk = 2520) can lane-group without overflowing scoped VMEM (the
    r4 guard measured ~4.8 live [qk, w] buffers; at lg=5 that is 30.7 MB
    vs the ~21 MB cap — commit a0100d1). The chunk axis is OUTER (lane
    blocks iterate fastest) so the slab's slot revisit-coalescing is
    preserved within each chunk; the slab is laid out chunk-major
    [(nq/qc)*nslots*lg*cM, qc*nlev] — the consumer reassembles the
    standard [nslots*lg*cM, qk] slab with one small transpose
    (dist/step_pallas.py). Winds/meta are re-fetched per grid step
    exactly as in the unchunked kernels (~(nchunks-1)*k/qk extra read
    traffic, ~11% at q35/qc=7)."""
    qk, e16 = qdp.shape
    k = nlev
    assert qk % k == 0, (qk, k)
    nq = qk // k
    w = 128 * lg
    assert e16 % w == 0, (e16, w)
    nblocks = e16 // w
    wu, wv = wind_rows
    assert vu.shape[0] >= (wu + 1) * k and vv.shape[0] >= (wv + 1) * k
    ext = sf is not None
    chunked = 0 < qc < nq
    if not chunked:
        qc = nq
    assert nq % qc == 0, (nq, qc)
    nchunks = nq // qc
    qck = qc * k

    if chunked:
        # 2D grid (chunk j OUTER, lane super-block i fastest): the slab
        # slot map stays monotone within each chunk sweep, so Pallas'
        # revisit coalescing carries exactly the affected groups' rows
        if ext:
            mk = lambda f: (lambda j, i, sf: f(j, i))
        else:
            mk = lambda f: (lambda j, i: f(j, i))
        fld = lambda r: pl.BlockSpec((r, w), mk(lambda j, i: (j, i)),
                                     memory_space=pltpu.VMEM)
        row = lambda r: pl.BlockSpec((k, w),
                                     mk(lambda j, i, r=r: (r, i)),
                                     memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(shape, mk(lambda j, i: (0, 0)),
                                         memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 4), mk(lambda j, i: (0, 0)),
                            memory_space=pltpu.SMEM)
        meta_spec = pl.BlockSpec((len(META_COLS), w),
                                 mk(lambda j, i: (0, i)),
                                 memory_space=pltpu.VMEM)
        grid = (nchunks, nblocks)
        lane_axis = 1
    else:
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
        grid = (nblocks,)
        lane_axis = 0
    kernel = partial(_tracer_kernel_t_lg, not interpret, CONSTANTS.rrearth,
                     qc, fold_sph, lg, ext, cM if ext else 0, lane_axis)
    in_specs = [
        smem,
        rep((128, 128)), rep((128, 128)),
        meta_spec,
        row(wu), row(wv), fld(qck),
    ]
    operands = [scal, dxbt, dybt, meta, vu, vv, qdp]
    out_specs = [fld(qck)]
    out_shape = [jax.ShapeDtypeStruct((qk, e16), jnp.float32)]
    nbytes = 2 * (qk + nchunks * k) * e16 * 4
    if ext:
        assert sf.shape == (1 + lg, nblocks), (sf.shape, lg, nblocks)
        if chunked:
            cq_spec = pl.BlockSpec((lg * cM, 128),
                                   lambda j, i, sf: (sf[0, i], 0),
                                   memory_space=pltpu.VMEM)
            slab_spec = pl.BlockSpec(
                (lg * cM, qck),
                lambda j, i, sf, ns=nslots: (j * ns + sf[0, i], 0),
                memory_space=pltpu.VMEM)
            slab_shape = jax.ShapeDtypeStruct(
                (nchunks * nslots * lg * cM, qck), jnp.float32)
        else:
            cq_spec = pl.BlockSpec((lg * cM, 128),
                                   lambda i, sf: (sf[0, i], 0),
                                   memory_space=pltpu.VMEM)
            slab_spec = pl.BlockSpec((lg * cM, qk),
                                     lambda i, sf: (sf[0, i], 0),
                                     memory_space=pltpu.VMEM)
            slab_shape = jax.ShapeDtypeStruct(
                (nslots * lg * cM, qk), jnp.float32)
        in_specs.insert(0, cq_spec)
        operands = [sf, cq] + operands
        out_specs.append(slab_spec)
        out_shape.append(slab_shape)
        nbytes += nslots * lg * cM * qk * 4
        grid_kw = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_specs))
    else:
        grid_kw = dict(grid=grid, in_specs=in_specs,
                       out_specs=out_specs)
    if vmem_mb:
        # the unchunked tall-stack variant over-budgets the default
        # scoped limit; a raised cap (like the fused limiter's 40 MB)
        # keeps the full lane-group step-count reduction
        grid_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape if ext else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=nblocks * lg * nq * 2 * 2 * 128 * 128 * k,
            bytes_accessed=nbytes,
            transcendentals=0,
        ),
        interpret=interpret,
        **grid_kw,
    )(*operands)
    return out


def reassemble_chunked_slab(xs, nchunks: int, qck: int):
    """[(nchunks)*R, qck] chunk-major slab (the row-chunked lg tracer
    kernel's second output) -> the standard [R, nchunks*qck] slab the
    compact fixup consumes: one small transpose (the slab is ~1e-2 of
    the field)."""
    cr, qck_ = xs.shape
    assert qck_ == qck and cr % nchunks == 0, (xs.shape, nchunks, qck)
    R = cr // nchunks
    return xs.reshape(nchunks, R, qck).transpose(1, 0, 2).reshape(
        R, nchunks * qck)


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
