"""Ring-fused producer + DSS sweep: one Pallas dispatch, no s1 round-trip.

The assembled step used to be two streaming passes: the producer kernel
writes the spheremp-weighted update s1 to HBM, then the sweep kernel reads
it back and writes the assembled state — 2 extra full-field passes per
kernel+DSS pair (8 pairs per prim step; 3.2 GB/step at ne120). Measured
with honest chunked dispatch at ne120: kernel-only 16.7 ms vs
kernel+sweep 23.3 ms.

Here the producer and the sweep share ONE kernel: the grid walks the
128-lane blocks in order, each step computes s1 for block ``i`` into a
VMEM ring buffer (the alpha partner is ±NP lanes away, the beta partner
±(NPSQ*ne - NP + 1) — at most ``b0+2`` blocks away), and once the ring
holds every block the sweep of block ``j = i - delay`` touches, the
kernel emits the rsp-scaled assembled value for block ``j`` via a LAGGED
output index map (``delay = b0 + 2``; the grid runs ``delay`` extra
steps with clamped inputs and predicated writes). s1 exists only in
VMEM; HBM sees just the producer's reads and the assembled write.

The sweep math here replicates kernels/dss_pallas.py::_sweep_kernel_t
expression-for-expression (window concatenations replace pltpu.roll —
no arithmetic, so the emitted values are BITWISE equal to the separate
sweep). Cube-edge/corner lanes still carry only partial sums — the
compact fix-lane slab is emitted as before (fdot.make_sel one-hot
selection) and a small aliased PATCH kernel
(kernels/dss_pallas.py::merge_patch_pallas) rewrites the ~38% affected
tiles afterwards.

Replaces the reference's stripped pack/exchange+assembly layer
(compute_and_apply_rhs_test/fortran/element_mod.F90:234-236) with a
single-pass TPU formulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NP, NPSQ
from ..constants import CONSTANTS
from .caar_pallas_t import _MC, _caar_physics
from .dss_pallas import _rsp_mul
from .fdot import make_dots, make_sel
from .layout import META_COLS

__all__ = ["caar_ring_packed_t4", "tracer_ring_packed_t", "ring_geometry"]


def ring_geometry(ne: int, nb: int):
    """(db, b0, delay, nslots, W) for the ring sweep at cubed-sphere ne:
    beta shift db = NPSQ*ne - (NP-1). The emission is GROUPED: every W
    grid steps the kernel emits W blocks at once with wide cyclic rolls
    over a ring window of W + 2*(b0+2) slots — per-128-lane emission via
    unaligned window slices measured ~690 us/call of VPU lane-rotates at
    ne30 vs ~80 us for the grouped rolls. W = the smallest divisor of nb
    with W*128 >= db + 136 (so one neighbor group covers the beta halo)
    and at least 4 (vectorization width)."""
    db = NPSQ * ne - (NP - 1)
    b0 = db // 128
    delay = b0 + 2
    W = next(w for w in range(1, nb + 1)
             if nb % w == 0 and (w * 128 >= db + 136 or w == nb)
             and (w >= 4 or w == nb))
    nslots = W + 2 * (b0 + 2)
    return db, b0, delay, nslots, W


def _emit_group(ring, m_ref, rsp_ref, g, k, S, b0, db, W, interpret,
                split):
    """Assembled (pre-fixup) GROUP g (blocks g*W .. g*W+W-1) from the
    ring: the W+2*(b0+2)-slot window rides one concatenation, the sweeps
    are wide cyclic rolls (the wrap never reaches the used middle lanes —
    the window extends db+8 lanes past the emitted group on both sides),
    and the expressions mirror `_sweep_kernel_t` exactly, so the emitted
    values are bitwise equal to the separate sweep kernel. ``m_ref`` is
    the ZERO-PADDED mask table ([4, (nb + 2*(b0+2))*128]): window slices
    stay in bounds and pad contributions vanish exactly like the
    cross-face masking."""
    hw = b0 + 2                       # halo width, blocks
    nwin = W + 2 * hw
    base = g * W - hw

    def xs(c):
        s = ((base + c) % S + S) % S
        return ring[pl.ds(s * k, k), :]

    w3 = jnp.concatenate([xs(c) for c in range(nwin)], axis=1)
    # padded-mask window: lane 0 of the pad table = block -(b0+2)
    m3 = m_ref[:, pl.ds((base + hw) * 128, nwin * 128)].astype(jnp.float32)
    if interpret:
        roll = lambda a, sh: jnp.roll(a, sh, axis=1)
    else:
        roll = lambda a, sh: pltpu.roll(a, shift=sh % (nwin * 128), axis=1)

    y = w3 + m3[0:1] * roll(w3, -NP) + m3[1:2] * roll(w3, NP)
    z = y + m3[2:3] * roll(y, -db) + m3[3:4] * roll(y, db)
    lo = hw * 128
    zmid = z[:, lo:lo + W * 128]
    return _rsp_mul(rsp_ref[:, pl.ds(g * W * 128, W * 128)], zmid)


def _caar_ring_kernel(split, moist, rgas, kappa, rv_factor, rrearth,
                      single, mix, emit_phi, cM, nb, S, b0, db, delay, W,
                      interpret, k, *refs):
    if single:
        (sf_ref, q_ref, scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref,
         bstrt_ref, meta_ref, s0_ref, qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref, masks_ref, rsp_ref,
         *rest) = refs
        sm1_ref = None
    else:
        (sf_ref, q_ref, scal_ref, dxbt_ref, dybt_ref, ainct_ref, astrt_ref,
         bstrt_ref, meta_ref, s0_ref, sm1_ref, qdp_ref, pecnd_ref,
         vn0u_ref, vn0v_ref, omg_ref, masks_ref, rsp_ref,
         *rest) = refs
    if mix:
        coef_ref, mx_ref, *rest = rest
    (out_ref, phi_ref, vn0u_out, vn0v_out, omg_out, ext_ref, ring) = rest

    i = pl.program_id(0)
    f32 = jnp.float32
    eta = scal_ref[0, 1]

    @pl.when(i == 0)
    def _zero_ring():
        ring[...] = jnp.zeros_like(ring)

    def row(name):
        return meta_ref[_MC[name]:_MC[name] + 1, :]

    k_ = k
    u, v = s0_ref[0:k_], s0_ref[k_:2 * k_]
    t, dp = s0_ref[2 * k_:3 * k_], s0_ref[3 * k_:4 * k_]
    if single:
        um1x, vm1x, tm1x, dpm1x = u, v, t, dp
    else:
        um1x = sm1_ref[0:k_].astype(f32)
        vm1x = sm1_ref[k_:2 * k_].astype(f32)
        tm1x = sm1_ref[2 * k_:3 * k_].astype(f32)
        dpm1x = sm1_ref[3 * k_:4 * k_].astype(f32)

    u1v, v1v, t1v, dp1v, phi, vdp1, vdp2, omega_p = _caar_physics(
        split, moist, rgas, kappa, rv_factor, rrearth,
        scal_ref, dxbt_ref[:], dybt_ref[:], ainct_ref, astrt_ref, bstrt_ref,
        row, u, v, t, dp, um1x, vm1x, tm1x, dpm1x, qdp_ref, pecnd_ref)

    slot = i % S
    ring[pl.ds((slot * 4 + 0) * k_, k_), :] = u1v
    ring[pl.ds((slot * 4 + 1) * k_, k_), :] = v1v
    ring[pl.ds((slot * 4 + 2) * k_, k_), :] = t1v
    ring[pl.ds((slot * 4 + 3) * k_, k_), :] = dp1v

    real = i < nb

    @pl.when(real)
    def _side_outputs():
        phi_ref[:] = phi
        vn0u_out[:] = vn0u_ref[:] + eta * vdp1
        vn0v_out[:] = vn0v_ref[:] + eta * vdp2
        omg_out[:] = omg_ref[:] + eta * omega_p

    @pl.when(real & (sf_ref[1, jnp.minimum(i, nb - 1)] == 1))
    def _write_slab():
        sel_l, _ = make_sel(split)
        q = q_ref[:]
        ext_ref[:, 0:k_] = sel_l(q, u1v.T)
        ext_ref[:, k_:2 * k_] = sel_l(q, v1v.T)
        ext_ref[:, 2 * k_:3 * k_] = sel_l(q, t1v.T)
        ext_ref[:, 3 * k_:4 * k_] = sel_l(q, dp1v.T)

    t = i - (W - 1) - delay
    @pl.when((t >= 0) & (t % W == 0))
    def _emit():
        g = t // W
        w = _emit_group(ring, masks_ref, rsp_ref, g, 4 * k_, S, b0, db, W,
                        interpret, split)
        if mix:
            out_ref[:] = coef_ref[0, 0] * mx_ref[:] + coef_ref[0, 1] * w
        else:
            out_ref[:] = w


@partial(jax.jit, static_argnames=("nt", "cM", "ne", "nlev", "moist",
                                   "single", "emit_phi", "interpret"))
def caar_ring_packed_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                        s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                        masks_full, rsp_lanes, sf, cq,
                        nt: int, cM: int, ne: int, nlev: int,
                        moist: bool = True, single: bool = False,
                        emit_phi: bool = True, mix=None,
                        interpret: bool = False):
    """Fused CAAR + DSS-sweep step on the stacked transposed layout:
    returns (assembled_prefix, phi, vn0u', vn0v', omega_p', xs_slab).
    ``assembled_prefix`` equals rsp * sweeps(s1) — the compact fixup +
    merge_patch_pallas must still rewrite the cube-edge tiles.
    ``single`` drops the sm1 operand (RK-stage mode); ``mix=(mx, ca, cb)``
    emits ca*mx + cb*assembled. ``masks_full`` is the full-axis [4, E16]
    bf16 mask table (_sweep_masks_np(ne, 6)); ``rsp_lanes`` [1|2, E16].
    Requires elem_block == 8 semantics: 128-lane blocks, e16 % 128 == 0."""
    k4, e16 = s0.shape
    k = nlev
    assert k4 == 4 * k and e16 % 128 == 0, (k4, k, e16)
    nb = e16 // 128
    assert sf.shape == (2, nb), (sf.shape, nb)
    db, b0, delay, S, W = ring_geometry(ne, nb)
    hw = b0 + 2
    # zero-pad the mask table by the window halo on both sides: window
    # slices stay in bounds and pad contributions vanish (cross-face
    # masking semantics)
    masks_full = jnp.pad(masks_full, ((0, 0), (hw * 128, hw * 128)))
    f = jnp.float32

    idx_i = lambda i, sf: (0, jnp.minimum(i, nb - 1))
    fld = lambda r: pl.BlockSpec((r, 128), idx_i, memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                     memory_space=pltpu.VMEM)
    ngroups = nb // W
    idx_j = lambda i, sf: (0, jnp.clip((i - (W - 1) - delay) // W, 0,
                                       ngroups - 1))

    in_specs = [
        pl.BlockSpec((cM, 128), lambda i, sf: (sf[0, jnp.minimum(i, nb - 1)],
                                               0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i, sf: (0, 0), memory_space=pltpu.SMEM),
        rep((128, 128)), rep((128, 128)),
        rep((k, k)), rep((k, k)), rep((k, k)),
        pl.BlockSpec((len(META_COLS), 128), idx_i,
                     memory_space=pltpu.VMEM),
        fld(4 * k),
    ]
    operands = [sf, cq, scal, dxbt, dybt, ainct, astrt, bstrt, meta, s0]
    if not single:
        in_specs.append(fld(4 * k))
        operands.append(sm1)
    in_specs += [fld(k), fld(k), fld(k), fld(k), fld(k),
                 rep((4, e16 + 2 * hw * 128)),
                 rep((rsp_lanes.shape[0], e16))]
    operands += [qdp, pecnd, vn0u, vn0v, omg, masks_full, rsp_lanes]
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape == (k4, e16)
        coef = jnp.stack([jnp.asarray(ca, f),
                          jnp.asarray(cb, f)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda i, sf: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((k4, W * 128), idx_j,
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]

    if emit_phi:
        phi_spec, phi_shape = fld(k), jax.ShapeDtypeStruct((k, e16), f)
    else:
        phi_spec = rep((k, 128))
        phi_shape = jax.ShapeDtypeStruct((k, 128), f)
    out_specs = [
        pl.BlockSpec((4 * k, W * 128), idx_j, memory_space=pltpu.VMEM),
        phi_spec, fld(k), fld(k), fld(k),
        pl.BlockSpec((cM, 4 * k),
                     lambda i, sf: (sf[0, jnp.minimum(i, nb - 1)], 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((4 * k, e16), f), phi_shape] + [
        jax.ShapeDtypeStruct((k, e16), f) for _ in range(3)] + [
        jax.ShapeDtypeStruct((nt * cM, 4 * k), f)]

    # accumulator aliases on the FLAT operand list (incl. prefetch arg)
    base = 12 if single else 13
    aliases = {base: 2, base + 1: 3, base + 2: 4}

    kernel = partial(
        _caar_ring_kernel, not interpret, moist, CONSTANTS.Rgas,
        CONSTANTS.kappa, CONSTANTS.rgas_over_rvap_m1, CONSTANTS.rrearth,
        single, mix is not None, emit_phi, cM, nb, S, b0, db, delay, W,
        interpret, k)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb + delay,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((S * 4 * k, 128), f)],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * (13 * 2 * 128 * 128 * k + 3 * 2 * 128 * k * k),
            bytes_accessed=(14 + 5) * e16 * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _tracer_ring_kernel(split, rrearth, nq, mix, cM, nb, S, b0, db, delay,
                        W, interpret, k, wu, wv, *refs):
    (sf_ref, q_ref, scal_ref, dxbt_ref, dybt_ref, meta_ref,
     vu_ref, vv_ref, qdp_ref, masks_ref, rsp_ref, *rest) = refs
    if mix:
        coef_ref, mx_ref, *rest = rest
    out_ref, ext_ref, ring = rest

    i = pl.program_id(0)
    f32 = jnp.float32
    dt = scal_ref[0, 0]
    dot, _, _ = make_dots(split)

    @pl.when(i == 0)
    def _zero_ring():
        ring[...] = jnp.zeros_like(ring)

    def row(name):
        return meta_ref[_MC[name]:_MC[name] + 1, :]

    dxbt, dybt = dxbt_ref[:], dybt_ref[:]
    dinv00, dinv01 = row("dinv00"), row("dinv01")
    dinv10, dinv11 = row("dinv10"), row("dinv11")
    metdet, rmetdet = row("metdet"), row("rmetdet")
    sph = row("spheremp")
    rr = f32(rrearth)
    vu, vv = vu_ref[:], vv_ref[:]
    lanes = vu.shape[1]

    q = qdp_ref[:]
    if nq > 1:
        q3 = q.reshape(nq, k, lanes)
        vq1 = (q3 * vu).reshape(nq * k, lanes)
        vq2 = (q3 * vv).reshape(nq * k, lanes)
    else:
        vq1, vq2 = vu * q, vv * q
    gv1 = metdet * (dinv00 * vq1 + dinv01 * vq2)
    gv2 = metdet * (dinv10 * vq1 + dinv11 * vq2)
    div = (dot(gv1, dxbt) + dot(gv2, dybt)) * (rmetdet * rr)
    out = sph * (q - dt * div)

    qk = nq * k
    slot = i % S
    ring[pl.ds(slot * qk, qk), :] = out

    real = i < nb

    @pl.when(real & (sf_ref[1, jnp.minimum(i, nb - 1)] == 1))
    def _write_slab():
        sel_l, _ = make_sel(split)
        ext_ref[:] = sel_l(q_ref[:], out.T)

    t = i - (W - 1) - delay
    @pl.when((t >= 0) & (t % W == 0))
    def _emit():
        g = t // W
        w = _emit_group(ring, masks_ref, rsp_ref, g, qk, S, b0, db, W,
                        interpret, split)
        if mix:
            out_ref[:] = coef_ref[0, 0] * mx_ref[:] + coef_ref[0, 1] * w
        else:
            out_ref[:] = w


@partial(jax.jit, static_argnames=("nt", "cM", "ne", "nlev", "wind_rows",
                                   "interpret"))
def tracer_ring_packed_t(scal, dxbt, dybt, meta, vu, vv, qdp,
                         masks_full, rsp_lanes, sf, cq,
                         nt: int, cM: int, ne: int, nlev: int,
                         wind_rows: tuple = (0, 0), mix=None,
                         interpret: bool = False):
    """Fused tracer Euler + DSS sweep (see `caar_ring_packed_t4`):
    returns (assembled_prefix [qk, E16], xs_slab [nt*cM, qk]). All nq
    tracers ride the sublane stack; ``wind_rows`` as in
    tracer_euler_pallas_packed_t."""
    qk, e16 = qdp.shape
    k = nlev
    assert qk % k == 0 and e16 % 128 == 0, (qk, k, e16)
    nq = qk // k
    nb = e16 // 128
    assert sf.shape == (2, nb), (sf.shape, nb)
    db, b0, delay, S, W = ring_geometry(ne, nb)
    hw = b0 + 2
    masks_full = jnp.pad(masks_full, ((0, 0), (hw * 128, hw * 128)))
    f = jnp.float32
    wu, wv = wind_rows
    ngroups = nb // W

    idx_i = lambda i, sf: (0, jnp.minimum(i, nb - 1))
    idx_j = lambda i, sf: (0, jnp.clip((i - (W - 1) - delay) // W, 0,
                                       ngroups - 1))
    rep = lambda shape: pl.BlockSpec(shape, lambda i, sf: (0, 0),
                                     memory_space=pltpu.VMEM)
    rowb = lambda r: pl.BlockSpec(
        (k, 128), lambda i, sf, r=r: (r, jnp.minimum(i, nb - 1)),
        memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((cM, 128),
                     lambda i, sf: (sf[0, jnp.minimum(i, nb - 1)], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda i, sf: (0, 0), memory_space=pltpu.SMEM),
        rep((128, 128)), rep((128, 128)),
        pl.BlockSpec((len(META_COLS), 128), idx_i,
                     memory_space=pltpu.VMEM),
        rowb(wu), rowb(wv),
        pl.BlockSpec((qk, 128), idx_i, memory_space=pltpu.VMEM),
        rep((4, e16 + 2 * hw * 128)), rep((rsp_lanes.shape[0], e16)),
    ]
    operands = [sf, cq, scal, dxbt, dybt, meta, vu, vv, qdp,
                masks_full, rsp_lanes]
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape == (qk, e16)
        coef = jnp.stack([jnp.asarray(ca, f),
                          jnp.asarray(cb, f)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda i, sf: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((qk, W * 128), idx_j,
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]

    out_specs = [
        pl.BlockSpec((qk, W * 128), idx_j, memory_space=pltpu.VMEM),
        pl.BlockSpec((cM, qk),
                     lambda i, sf: (sf[0, jnp.minimum(i, nb - 1)], 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = partial(
        _tracer_ring_kernel, not interpret, CONSTANTS.rrearth, nq,
        mix is not None, cM, nb, S, b0, db, delay, W, interpret, k, wu, wv)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb + delay,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((S * qk, 128), f)],
        ),
        out_shape=[jax.ShapeDtypeStruct((qk, e16), f),
                   jax.ShapeDtypeStruct((nt * cM, qk), f)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=nb * nq * 2 * 2 * 128 * 128 * k,
            bytes_accessed=(2 * qk + 2 * k) * e16 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
