"""Pallas DSS on the transposed [k, e16] layout — near-one-pass assembly.

The XLA structured DSS (dist/structured_dss.py) is algebraically minimal
but compiles to many full-array passes: each strided slice-update (or
lane roll) of a [k, e16] field re-materializes the array, and the 24
edge-line `.at[].set` updates each cost a full copy — measured ~4.5 ms
for the stacked ne30 epilogue vs a ~250 us roofline. This module
restructures it to ~2.5 passes:

* **sweep kernel** (`_sweep_kernel_t`): the in-face alpha partner of a
  lane is exactly NP lanes away and the beta partner NPSQ*ne-NP+1 lanes
  away (dist/structured_dss.py derivation), so both sweeps are masked
  in-VMEM lane rolls (`pltpu.roll`) — the whole lane axis rides in one
  block, levels on the grid, rspheremp scaling fused into the write.
  The four masks are PREcomputed host-side and passed as one [4, e16]
  operand: in-kernel i32 div/mod mask math measured +60% kernel time
  (no hardware integer division on the VPU).
* **edge/corner fixup** (`extract_tiles_t` + `dss_fixup_tiles_t`): a
  small Pallas kernel copies ONLY the affected 128-lane tiles out
  TRANSPOSED (line lanes only ever receive sweep contributions from
  within their own line, so their post-sweep values are reconstructable
  compactly from the pre-sweep field); the junction/pair/corner sums
  then run on that slab with MAJOR-axis row gathers — a lane-axis
  gather from the big field makes XLA transpose-copy the ENTIRE field
  first (361 us at ne30, ~5.8 ms at ne120). One duplicate-free scatter
  into a tile-dense zeros buffer feeds the sweep kernel's fused merge.
  rspheremp is constant across the aliases of a shared dof (the inverse
  of the globally assembled spheremp), so the pair sums commute with
  the fused scaling.

Replaces HOMME's edge-buffer pack/exchange (element_mod.F90:234-236,
the layer the reference stripped) for the single-chip assembled step.
Measured at ne30 (stacked [288, 86400]): ~0.65 ms vs ~4.5 ms for the
XLA slice formulation (saved in BENCH_LOCAL.json).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NP, NPSQ

__all__ = ["dss_sweeps_pallas_t", "dss_structured_t_pallas",
           "dss_structured_t_pallas_pre", "dss_structured_t_pallas_cpre",
           "dss_sweeps_banded_t", "dss_sweeps_banded_ct",
           "dss_sweeps_pallas_ct",
           "ext_slot_arrays", "cext_tables", "cext_tables_lg",
           "cext_tables_lg_for_gtiles", "fit_block_k",
           "SWEEP_VMEM_CAP"]


def _rsp_mul(rsp, v):
    """v * rspheremp, two-float aware.

    ``rsp`` may be [1, n] (plain f32) or [2, n] (hi + lo rows of a
    double-f32 1/spheremp_assembled). The f32-rounded product
    fl(rsp)*S_assembled deviates from 1 by a FIXED per-dof ~1e-8 — a
    systematic multiplicative bias applied at every DSS pass that showed
    up as the packed cadence's LINEAR air-mass drift
    (ENERGY_DRIFT_PACKED.json, ~2.9e-8/step). With hi+lo carrying
    1/S to ~2^-48, v*hi + v*lo leaves only unbiased storage rounding
    (random walk, orders slower). Cost: one extra VPU multiply-add in a
    bandwidth-bound pass."""
    if rsp.shape[0] == 2:
        return v * rsp[0:1] + v * rsp[1:2]
    return rsp * v

# sweep-kernel VMEM budget: ~12 live [bk, lanes] f32 buffers (x/out double-
# buffered + Mosaic temps) under the 100 MB vmem_limit_bytes cap, with ~3
# buffer-equivalents of fixed overhead (masks/rsp/vd/dm operands)
SWEEP_VMEM_CAP = 100 * 1024 * 1024


def fit_block_k(k: int, lanes: int, block_k: int) -> int:
    """Largest sublane block bk <= block_k such that ~(12*bk + 3) live
    [*, lanes] f32 rows fit SWEEP_VMEM_CAP, bk is a multiple of 8, and
    bk | k (falling back to bk = k, always a legal single block)."""
    bk_fit = max(8, 8 * int((SWEEP_VMEM_CAP / (lanes * 4) - 3) // 96))
    bk = min(block_k, bk_fit)
    while bk > 8 and k % bk:
        bk -= 8
    if k % bk:
        bk = k
    return bk


def sweep_vmem_bytes(bk: int, lanes: int) -> int:
    """Estimated peak sweep-kernel VMEM for a [bk, lanes] f32 block under
    the fit_block_k accounting model."""
    return (12 * bk + 3) * lanes * 4


@lru_cache(maxsize=None)
def _sweep_masks_np(ne: int, nf: int):
    """[4, nf*face] lane masks (alpha-hi/alpha-lo/beta-hi/beta-lo) for a
    block of ``nf`` whole faces — identical for every block (the masks
    depend only on the face-local lane position). bf16: 0/1 exact, half
    the VMEM of f32."""
    lanes = nf * ne * ne * NPSQ
    lane = np.arange(lanes)
    i = (lane // NP) % NP
    j = lane % NP
    ei = (lane // NPSQ) % ne
    ej = (lane // (NPSQ * ne)) % ne
    return np.stack([
        (i == NP - 1) & (ei < ne - 1), (i == 0) & (ei > 0),
        (j == NP - 1) & (ej < ne - 1), (j == 0) & (ej > 0),
    ]).astype(jnp.bfloat16)


def _sweep_kernel_t(db: int, tiles: tuple, lb: int, vdt: bool, mix: bool,
                    interpret: bool, *refs):
    # the block is an integral number of WHOLE faces, so the cyclic roll
    # wrap (and any roll across an interior face boundary) only pollutes
    # positions the masks zero out
    if mix:
        # affine epilogue: out = ca*mx + cb*assembled — folds the RK
        # convex combination / hyperviscosity update into the sweep pass
        # (saves the standalone XLA R+R+W combination pass)
        (x_ref, m_ref, rsp_ref, vd_ref, dm_ref, coef_ref, mx_ref,
         out_ref) = refs
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
    else:
        x_ref, m_ref, rsp_ref, vd_ref, dm_ref, out_ref = refs
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        # pltpu.roll wants non-negative shifts; cyclic -s == lb - s
        roll = lambda a, s: pltpu.roll(a, shift=s % lb, axis=1)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = _rsp_mul(rsp_ref[:], z)
    if mix:
        mx = mx_ref[:]
        out_ref[:] = ca * mx + cb * w
    else:
        out_ref[:] = w
    # fused edge/corner merge: rewrite only the statically-known 128-lane
    # tiles that contain fix lanes (the tile-dense vals/mask operands are
    # laid out one 128-lane slot per affected tile; the tile pattern is
    # face-local, hence identical for every block). With ``vdt`` the vals
    # buffer arrives TRANSPOSED [wd, bk] (a fast XLA row-scatter built it)
    # and is flipped in-VMEM here.
    vd = vd_ref[:].T if vdt else vd_ref[:]
    for n, t in enumerate(tiles):
        wdt = min(128, lb - t * 128)
        m = dm_ref[:, n * 128:n * 128 + wdt]
        merged = (w[:, t * 128:t * 128 + wdt] * (1.0 - m)
                  + vd[:, n * 128:n * 128 + wdt] * m)
        if mix:
            merged = ca * mx[:, t * 128:t * 128 + wdt] + cb * merged
        out_ref[:, t * 128:t * 128 + wdt] = merged


def _sweep_banded_nomerge_kernel(db: int, bl: int, ext: int,
                                 mix: bool, interpret: bool, *refs):
    """Banded sweep WITHOUT the edge/corner tile merge: the overlapped
    multi-chip path (dist/banded_t4.py overlap=True) runs this pass with
    NO dependence on the cross-chip line gathers — the fixup lands later
    via `merge_patch_tiles`, so the collectives hide behind this pass."""
    if mix:
        x_ref, m_ref, rsp_ref, coef_ref, mx_ref, out_ref = refs
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
    else:
        x_ref, m_ref, rsp_ref, out_ref = refs
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        roll = lambda a, s: pltpu.roll(a, shift=s % ext, axis=1)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = _rsp_mul(rsp_ref[:], z[:, :bl])
    if mix:
        out_ref[:] = ca * mx_ref[:] + cb * w
    else:
        out_ref[:] = w


@partial(jax.jit, static_argnames=("nchunks", "bl", "rl",
                                   "interpret", "block_k"))
def dss_sweeps_banded_nomerge(x_ext, rsp, masks, nchunks: int, bl: int,
                              rl: int, mix=None,
                              interpret: bool = False, block_k: int = 16):
    """`dss_sweeps_banded_t` minus the tile merge (and minus the vals/
    placement operands): the sweep+rsp(+mix) pass alone, consuming ONLY
    shard-local data. The cube-edge/corner fix lanes come out wrong and
    are rewritten in place by `merge_patch_tiles` once the line
    collectives land — the compute/communication-overlap decomposition
    of the banded DSS (SCALING_MODEL.md claim 2)."""
    k, _ = x_ext.shape
    ext = bl + 2 * rl
    assert x_ext.shape[1] == nchunks * ext, (x_ext.shape, nchunks, ext)
    bk = fit_block_k(k, ext, block_k)
    if mix is not None and mix[0].shape[0] != k and mix[0].shape[0] % bk:
        cands = [b for b in range(bk, 0, -1)
                 if k % b == 0 and mix[0].shape[0] % b == 0]
        bk = next((b for b in cands if b % 8 == 0), cands[0])
    db = rl - (NP - 1)
    in_specs = [
        pl.BlockSpec((bk, ext), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, ext), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rsp.shape[0], bl), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_ext, masks, rsp]
    out_rows = k
    aliases = {}
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape[1] == nchunks * bl and mx.shape[0] >= k, \
            (mx.shape, k, nchunks * bl)
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((bk, bl), lambda j, i: (i, j),
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]
        if mx.shape[0] > k:
            out_rows = mx.shape[0]
            aliases = {4: 0}
    return pl.pallas_call(
        partial(_sweep_banded_nomerge_kernel, db, bl, ext, mix is not None,
                interpret),
        grid=(nchunks, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bk, bl), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, nchunks * bl),
                                       jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SWEEP_VMEM_CAP,
        ),
        interpret=interpret,
    )(*operands)


@partial(jax.jit, static_argnames=("gtiles", "ntb", "m_rows", "interpret"))
def merge_patch_tiles(w, vals3, p_tbl, dm_lanes, gtiles: tuple, ntb: int,
                      m_rows: int, mix=None, interpret: bool = False):
    """Rewrite the fix TILES of ``w`` in place from per-tile compact
    value blocks — the shard-local generalization of `merge_patch_pallas`
    (explicit tables instead of the plan-global ones): ``gtiles`` are the
    128-lane tile indices into w's lane axis, ``vals3`` is
    [len(gtiles), m_rows, k] of (already rsp-scaled) fix values,
    ``p_tbl`` the per-chunk [ntb*m_rows, 128] placement table (tile n
    uses rows (n % ntb)*m_rows...), ``dm_lanes`` the [1, len(gtiles)*128]
    per-tile merge-lane masks (variant-dependent on the banded path).
    With ``mix=(mx, ca, cb)`` patched lanes get ca*mx + cb*vals (w's
    non-fix lanes must already carry the mixed value). ``w`` may be
    TALLER than vals3's k (the in-place hyperviscosity update): only the
    first k rows of each tile are rewritten."""
    k = vals3.shape[2]
    e16 = w.shape[1]
    nt = len(gtiles)
    assert vals3.shape == (nt, m_rows, k), (vals3.shape, nt, m_rows, k)
    assert dm_lanes.shape[1] == nt * 128, dm_lanes.shape
    gt = jnp.asarray(np.asarray(gtiles, np.int32))

    in_specs = [
        pl.BlockSpec((k, 128), lambda n, gt: (0, gt[n]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_rows, k), lambda n, gt: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_rows, 128), lambda n, gt, ntb=ntb: (n % ntb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda n, gt: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    operands = [gt, w, vals3, p_tbl, dm_lanes]
    if mix is not None:
        mx, ca, cb = mix
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda n, gt: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((k, 128), lambda n, gt: (0, gt[n]),
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]
    return pl.pallas_call(
        partial(_merge_patch_kernel, mix is not None, not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((k, 128), lambda n, gt: (0, gt[n]),
                                  memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(w.shape, jnp.float32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(*operands)


def _sweep_face_nomerge_kernel(db: int, lb: int, mix: bool,
                               interpret: bool, *refs):
    """Face-block sweep WITHOUT the edge/corner tile merge — the
    overlapped face-sharded path (dist/sharded_t4.py overlap=True): no
    dependence on the cross-chip line all_gather; the fixup lands later
    via `merge_patch_tiles`."""
    if mix:
        x_ref, m_ref, rsp_ref, coef_ref, mx_ref, out_ref = refs
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
    else:
        x_ref, m_ref, rsp_ref, out_ref = refs
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        roll = lambda a, s: pltpu.roll(a, shift=s % lb, axis=1)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = _rsp_mul(rsp_ref[:], z)
    if mix:
        out_ref[:] = ca * mx_ref[:] + cb * w
    else:
        out_ref[:] = w


@partial(jax.jit, static_argnames=("ne", "nf", "faces",
                                  "interpret", "block_k"))
def dss_sweeps_pallas_nomerge(x, rsp, ne: int, nf: int, faces: int = 6,
                              mix=None, interpret: bool = False,
                              block_k: int = 16):
    """`dss_sweeps_pallas_t` minus the tile merge (and the vals/mask
    operands): the in-face sweep+rsp(+mix) pass alone — shard-local, so
    the face-sharded overlap path can run it in the line-gather's
    shadow and patch the fix tiles afterward."""
    k, e16 = x.shape
    assert e16 == faces * ne * ne * NPSQ, (e16, ne, faces)
    lb = nf * ne * ne * NPSQ
    assert nf == faces or lb % 128 == 0, (lb, nf)
    bk = fit_block_k(k, lb, block_k)
    if mix is not None and mix[0].shape[0] != k and mix[0].shape[0] % bk:
        cands = [b for b in range(bk, 0, -1)
                 if k % b == 0 and mix[0].shape[0] % b == 0]
        bk = next((b for b in cands if b % 8 == 0), cands[0])
    masks = jnp.asarray(_sweep_masks_np(ne, nf))
    db = NPSQ * ne - (NP - 1)
    blk = lambda: pl.BlockSpec((bk, lb), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)
    in_specs = [
        blk(),
        pl.BlockSpec((4, lb), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rsp.shape[0], lb), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, masks, rsp]
    out_rows = k
    aliases = {}
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape[1] == e16 and mx.shape[0] >= k, (mx.shape, x.shape)
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM), blk()]
        operands += [coef, mx]
        if mx.shape[0] > k:
            out_rows = mx.shape[0]
            aliases = {4: 0}
    return pl.pallas_call(
        partial(_sweep_face_nomerge_kernel, db, lb, mix is not None,
                interpret),
        grid=(faces // nf, k // bk),
        in_specs=in_specs,
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((out_rows, e16), jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SWEEP_VMEM_CAP,
        ),
        interpret=interpret,
    )(*operands)


def _sweep_banded_kernel_t(db: int, tiles: tuple, bl: int, ext: int,
                           mix: bool, interpret: bool, *refs):
    # the block is ONE element-row band extended with its neighbor rows in
    # the cyclic layout [band | next-halo-row | prev-halo-row]: the beta
    # rolls wrap into the correct halo row, so no boundary special-casing
    if mix:
        (x_ref, m_ref, rsp_ref, vd_ref, dm_ref, coef_ref, mx_ref,
         out_ref) = refs
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
    else:
        x_ref, m_ref, rsp_ref, vd_ref, dm_ref, out_ref = refs
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        roll = lambda a, s: pltpu.roll(a, shift=s % ext, axis=1)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = _rsp_mul(rsp_ref[:], z[:, :bl])
    if mix:
        mx = mx_ref[:]
        out_ref[:] = ca * mx + cb * w
    else:
        out_ref[:] = w
    for n, t in enumerate(tiles):
        wdt = min(128, bl - t * 128)
        m = dm_ref[:, n * 128:n * 128 + wdt]
        merged = (w[:, t * 128:t * 128 + wdt] * (1.0 - m)
                  + vd_ref[:, n * 128:n * 128 + wdt] * m)
        if mix:
            merged = ca * mx[:, t * 128:t * 128 + wdt] + cb * merged
        out_ref[:, t * 128:t * 128 + wdt] = merged


@partial(jax.jit, static_argnames=("tiles", "nchunks", "bl", "rl",
                                   "interpret", "block_k"))
def dss_sweeps_banded_t(x_ext, rsp, vals_dense, dense_mask, masks,
                        tiles: tuple, nchunks: int, bl: int, rl: int,
                        mix=None,
                        interpret: bool = False, block_k: int = 16):
    """Banded sweep pass for the element-row-sharded multi-chip step: the
    lane axis carries ``nchunks`` band chunks, each pre-extended with its
    two neighbor element-rows ([band | next | prev], ``rl`` lanes each).
    masks / dense_mask / vals_dense are per-chunk operands (the band's
    face-edge pattern varies with its position in the face).
    ``mix=(mx, ca, cb)`` returns ca*mx + cb*(assembled); ``mx`` is the
    UNextended [k, nchunks*bl] shard field — or TALLER, in which case the
    output takes mx's height with mx aliased into it (rows beyond x's
    ride through untouched; the in-place hyperviscosity update)."""
    k, _ = x_ext.shape
    ext = bl + 2 * rl
    assert x_ext.shape[1] == nchunks * ext, (x_ext.shape, nchunks, ext)
    bk = fit_block_k(k, ext, block_k)
    if mix is not None and mix[0].shape[0] != k and mix[0].shape[0] % bk:
        cands = [b for b in range(bk, 0, -1)
                 if k % b == 0 and mix[0].shape[0] % b == 0]
        bk = next((b for b in cands if b % 8 == 0), cands[0])
    db = rl - (NP - 1)
    wd = len(tiles) * 128
    # grid iterates the LAST axis fastest: put the chunk axis first so
    # the per-chunk masks/rsp/dense_mask blocks stay resident across the
    # k sweep instead of being re-fetched every step
    in_specs = [
        pl.BlockSpec((bk, ext), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, ext), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rsp.shape[0], bl), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, wd), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wd), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_ext, masks, rsp, vals_dense, dense_mask]
    out_rows = k
    aliases = {}
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape[1] == nchunks * bl and mx.shape[0] >= k, \
            (mx.shape, k, nchunks * bl)
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((bk, bl), lambda j, i: (i, j),
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]
        if mx.shape[0] > k:
            out_rows = mx.shape[0]
            aliases = {6: 0}      # mx -> out: unvisited rows ride through
    return pl.pallas_call(
        partial(_sweep_banded_kernel_t, db, tiles, bl, ext, mix is not None,
                interpret),
        grid=(nchunks, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bk, bl), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, nchunks * bl),
                                       jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SWEEP_VMEM_CAP,
        ),
        interpret=interpret,
    )(*operands)


def _sweep_banded_kernel_ct(db: int, tiles: tuple, bl: int, ext: int,
                            M: int, mix: bool, split: bool,
                            interpret: bool, *refs):
    """`_sweep_banded_kernel_t` with the COMPACT vals buffer: the fix
    values arrive as [bk, ntb*M] compact lanes per chunk and each affected
    tile is re-expanded with an exact one-hot placement dot
    (fdot.make_sel), like `_sweep_kernel_ct` on the single-chip path."""
    from .fdot import make_sel

    if mix:
        (x_ref, m_ref, rsp_ref, vd_ref, p_ref, dm_ref, coef_ref, mx_ref,
         out_ref) = refs
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
    else:
        x_ref, m_ref, rsp_ref, vd_ref, p_ref, dm_ref, out_ref = refs
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        roll = lambda a, s: pltpu.roll(a, shift=s % ext, axis=1)
    _, sel_r = make_sel(split)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = _rsp_mul(rsp_ref[:], z[:, :bl])
    if mix:
        mx = mx_ref[:]
        out_ref[:] = ca * mx + cb * w
    else:
        out_ref[:] = w
    for n, t in enumerate(tiles):
        placed = sel_r(vd_ref[:, n * M:(n + 1) * M],
                       p_ref[n * M:(n + 1) * M, :])
        wdt = min(128, bl - t * 128)
        m = dm_ref[:, n * 128:n * 128 + wdt]
        merged = (w[:, t * 128:t * 128 + wdt] * (1.0 - m)
                  + placed[:, :wdt])
        if mix:
            merged = ca * mx[:, t * 128:t * 128 + wdt] + cb * merged
        out_ref[:, t * 128:t * 128 + wdt] = merged


@partial(jax.jit, static_argnames=("tiles", "nchunks", "bl", "rl", "m_rows",
                                   "interpret", "block_k"))
def dss_sweeps_banded_ct(x_ext, rsp, vd_c, p_tbl, dense_mask, masks,
                         tiles: tuple, nchunks: int, bl: int, rl: int,
                         m_rows: int, mix=None,
                         interpret: bool = False, block_k: int = 16):
    """`dss_sweeps_banded_t` with the COMPACT vals buffer: ``vd_c`` is
    [k, nchunks*wr] (wr = len(tiles)*m_rows padded to 128) and ``p_tbl``
    the [len(tiles)*m_rows, 128] bf16 placement table (banded compact
    tables, dist/banded_t4.py) — ~3x less vals HBM traffic than the
    tile-dense buffer at the fix lanes' ~9-11% occupancy."""
    k, _ = x_ext.shape
    ext = bl + 2 * rl
    assert x_ext.shape[1] == nchunks * ext, (x_ext.shape, nchunks, ext)
    ntb = len(tiles)
    wr = vd_c.shape[1] // nchunks
    assert wr % 128 == 0 and wr >= ntb * m_rows, (wr, ntb, m_rows)
    bk = fit_block_k(k, ext, block_k)
    if mix is not None and mix[0].shape[0] != k and mix[0].shape[0] % bk:
        cands = [b for b in range(bk, 0, -1)
                 if k % b == 0 and mix[0].shape[0] % b == 0]
        bk = next((b for b in cands if b % 8 == 0), cands[0])
    db = rl - (NP - 1)
    # chunk axis FIRST (see dss_sweeps_banded_t): per-chunk static blocks
    # stay resident across the k sweep
    in_specs = [
        pl.BlockSpec((bk, ext), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, ext), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rsp.shape[0], bl), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, wr), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ntb * m_rows, 128), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ntb * 128), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_ext, masks, rsp, vd_c, p_tbl, dense_mask]
    out_rows = k
    aliases = {}
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape[1] == nchunks * bl and mx.shape[0] >= k, \
            (mx.shape, k, nchunks * bl)
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((bk, bl), lambda j, i: (i, j),
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]
        if mx.shape[0] > k:
            out_rows = mx.shape[0]
            aliases = {7: 0}      # mx -> out: unvisited rows ride through
    return pl.pallas_call(
        partial(_sweep_banded_kernel_ct, db, tiles, bl, ext, m_rows,
                mix is not None, not interpret, interpret),
        grid=(nchunks, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bk, bl), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, nchunks * bl),
                                       jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SWEEP_VMEM_CAP,
        ),
        interpret=interpret,
    )(*operands)


@partial(jax.jit, static_argnames=("ne", "tiles", "nf", "faces", "vdt",
                                   "interpret", "block_k"))
def dss_sweeps_pallas_t(x, rsp, vals_dense, dense_mask, ne: int,
                        tiles: tuple, nf: int, faces: int = 6,
                        vdt: bool = False, mix=None,
                        interpret: bool = False, block_k: int = 16):
    """rsp * (alpha+beta sweeps of x) with the edge/corner fix merged in.
    The grid is (k/bk, faces/nf): each block carries ``nf`` whole faces on
    the lane axis (rolls never need to cross a face). ``vals_dense`` /
    ``dense_mask`` are [k, (faces/nf)*len(tiles)*128] / [1, len(tiles)*128]
    tile-dense buffers (one 128-lane slot per affected face-local tile).
    ``faces`` < 6 serves the face-sharded multi-chip step (the lane axis
    carries only this shard's faces). ``mix=(mx, ca, cb)`` returns
    ca*mx + cb*(assembled) instead — the RK convex combination /
    hyperviscosity update folded into the sweep pass. When ``mx`` has MORE
    rows than x, the output takes mx's shape with mx donated/aliased into
    it: rows beyond x's keep mx's data untouched (the in-place patch
    pattern — e.g. the hyperviscosity update rewrites the (u, v, T) rows
    of the stacked state while the dp rows ride through)."""
    k, e16 = x.shape
    assert e16 == faces * ne * ne * NPSQ, (e16, ne, faces)
    lb = nf * ne * ne * NPSQ
    assert nf == faces or lb % 128 == 0, (lb, nf)
    bk = fit_block_k(k, lb, block_k)
    if vdt and not interpret and not (bk == k or bk % 128 == 0):
        # The transposed vals buffer puts the row-block size bk on the LANE
        # axis; Mosaic requires lane blocks to be multiples of 128 or the
        # full dimension, and no divisor of a typical k (4*nlev = 288) is a
        # multiple of 128 while a full-k block blows the VMEM cap. The
        # producer-fused slab path (dss_structured_t_pallas_pre) supersedes
        # this experiment: its scatter-into-zeros costs only ~44 us at ne30.
        raise NotImplementedError(
            f"vdt cannot lower on TPU: vals lane block bk={bk} is neither "
            f"k={k} nor a multiple of 128 (use vdt=False)")
    masks = jnp.asarray(_sweep_masks_np(ne, nf))
    db = NPSQ * ne - (NP - 1)
    wd = len(tiles) * 128
    # face axis FIRST in the grid (last axis iterates fastest): the
    # per-face rsp block then stays resident across the k sweep — with
    # the k axis fastest it was re-fetched on every grid step (~400 MB
    # per ne120 sweep)
    blk = lambda: pl.BlockSpec((bk, lb), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)
    vd_spec = pl.BlockSpec((wd, bk), lambda j, i: (j, i),
                           memory_space=pltpu.VMEM) if vdt else \
        pl.BlockSpec((bk, wd), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM)
    in_specs = [
        blk(),
        pl.BlockSpec((4, lb), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rsp.shape[0], lb), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        vd_spec,
        pl.BlockSpec((1, wd), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, masks, rsp, vals_dense, dense_mask]
    out_rows = k
    aliases = {}
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape[1] == e16 and mx.shape[0] >= k, (mx.shape, x.shape)
        if mx.shape[0] != k and mx.shape[0] % bk:
            # the aliased taller output needs bk | mx rows too: largest
            # common divisor <= the VMEM-fit bk, preferring multiples of 8
            cands = [b for b in range(bk, 0, -1)
                     if k % b == 0 and mx.shape[0] % b == 0]
            bk = next((b for b in cands if b % 8 == 0), cands[0])
            blk = lambda: pl.BlockSpec((bk, lb), lambda j, i: (i, j),
                                       memory_space=pltpu.VMEM)
            in_specs[0] = blk()
            if not vdt:
                in_specs[3] = pl.BlockSpec((bk, wd), lambda j, i: (i, j),
                                           memory_space=pltpu.VMEM)
            else:
                in_specs[3] = pl.BlockSpec((wd, bk), lambda j, i: (j, i),
                                           memory_space=pltpu.VMEM)
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM), blk()]
        operands += [coef, mx]
        if mx.shape[0] > k:
            out_rows = mx.shape[0]
            aliases = {6: 0}      # mx -> out: unvisited rows ride through
    return pl.pallas_call(
        partial(_sweep_kernel_t, db, tiles, lb, vdt, mix is not None,
                interpret),
        grid=(faces // nf, k // bk),
        in_specs=in_specs,
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((out_rows, e16), jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SWEEP_VMEM_CAP,
        ),
        interpret=interpret,
    )(*operands)


def _tile_extract_kernel_t(gt_ref, x_ref, o_ref):
    o_ref[:] = x_ref[:].T


@partial(jax.jit, static_argnames=("gtiles", "interpret"))
def extract_tiles_t(x, gtiles: tuple, interpret: bool = False):
    """[k, e16] -> [len(gtiles)*128, k]: copy the given 128-lane tiles out
    TRANSPOSED (in-VMEM transpose; tile list rides scalar prefetch).
    Reads/writes only the affected tiles (~38% at ne30); the transposed
    output makes the fixup's lane selections MAJOR-axis (row) gathers,
    which XLA executes without relayout — a lane-axis gather from the big
    field forces a column-major copy of the ENTIRE field first (measured
    361 us at ne30, ~5.8 ms at ne120)."""
    k, e16 = x.shape
    nt = len(gtiles)
    if interpret:
        # OOB lanes of a partial final tile are clamped (read garbage,
        # never referenced by the row maps)
        idx = np.minimum(np.concatenate(
            [np.arange(t * 128, t * 128 + 128) for t in gtiles]), e16 - 1)
        return x[:, idx].T
    gt = jnp.asarray(np.asarray(gtiles, np.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((k, 128), lambda i, gt_ref: (0, gt_ref[i]))],
        out_specs=pl.BlockSpec((128, k), lambda i, gt_ref: (i, 0)),
    )
    return pl.pallas_call(
        _tile_extract_kernel_t,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * 128, k), jnp.float32),
    )(gt, x)


def _tile_extract_ct_kernel(split, gt_ref, cq_ref, x_ref, o_ref):
    from .fdot import make_sel

    sel_l, _ = make_sel(split)
    o_ref[:] = sel_l(cq_ref[:], x_ref[:].T)


@partial(jax.jit, static_argnames=("gtiles", "cM", "interpret"))
def extract_tiles_ct(x, gtiles: tuple, cq, cM: int,
                     interpret: bool = False):
    """[k, e16] -> COMPACT slab [len(gtiles)*cM, k]: extract each affected
    128-lane tile transposed AND reduced to its cM fix lanes with the
    exact one-hot selection contraction (`cext_tables`'s cq table,
    fdot.make_sel — bitwise equal to the producer-fused slab). The
    standalone form lets producers WITHOUT slot-mapped extra outputs
    (e.g. the lane-grouped ne120 kernel) feed
    `dss_structured_t_pallas_cpre`: reads only the affected tiles (~38%)
    and writes the ~9-11%-occupancy compact slab, vs the dense
    `extract_tiles_t`'s full-tile slab."""
    k, e16 = x.shape
    nt = len(gtiles)
    if interpret:
        idx = np.minimum(np.concatenate(
            [np.arange(t * 128, t * 128 + 128) for t in gtiles]), e16 - 1)
        tiles_t = x[:, idx].T.reshape(nt, 128, k)
        cq3 = jnp.asarray(cq, jnp.float32).reshape(nt, cM, 128)
        return jnp.einsum("nmr,nrk->nmk", cq3, tiles_t).reshape(nt * cM, k)
    gt = jnp.asarray(np.asarray(gtiles, np.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((cM, 128), lambda i, gt_ref: (i, 0)),
            pl.BlockSpec((k, 128), lambda i, gt_ref: (0, gt_ref[i])),
        ],
        out_specs=pl.BlockSpec((cM, k), lambda i, gt_ref: (i, 0)),
    )
    return pl.pallas_call(
        partial(_tile_extract_ct_kernel, True),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * cM, k), jnp.float32),
    )(gt, cq, x)


@lru_cache(maxsize=None)
def _fixup_arrays(plan):
    """Static index sets for the one-gather/one-scatter edge+corner fixup."""
    from ..dist.structured_dss import _side_line_idx

    ne = plan.ne
    lines = []
    for fa, sa, fb, sb, flip in plan.edges:
        lines.append(_side_line_idx(ne, fa, sa))
        lines.append(_side_line_idx(ne, fb, sb))
    idx_lines = np.stack(lines).astype(np.int32)            # [24, 4*ne]
    corner = np.asarray(plan.corner_rows, np.int32)         # [8, 3]

    # duplicate-free scatter set: line INTERIORS (endpoints are cube-corner
    # lanes) + each corner lane once
    idx_uniq = np.concatenate([idx_lines[:, 1:-1].reshape(-1),
                               corner.reshape(-1)])
    assert len(idx_uniq) == len(np.unique(idx_uniq))

    # lane blocking for the sweep kernel: nf whole faces per block, the
    # largest nf whose block is both 128-lane aligned and VMEM-fitting
    # bk=8 needs ~(12*8+3) live [8, lb] f32 buffers under the 100 MB cap.
    # nf=6 = the full lane axis (always a legal block, no 128-alignment
    # needed); smaller whole-face blocks must be 128-lane aligned.
    face = ne * ne * NPSQ
    if 6 * face <= 250_000:
        nf = 6
    else:
        nf = next(n for n in (3, 2, 1)
                  if (n * face) % 128 == 0 and n * face <= 250_000)
    lb = nf * face

    # tile-dense decomposition WITHIN a block: the 128-lane tiles that
    # contain fix lanes (~38% at ne30). Fix-lane positions are face-local,
    # so the affected-tile pattern is identical for every block; tiles =
    # union over the block's faces of the per-face pattern.
    block_local = idx_uniq % lb
    tiles = np.unique(block_local // 128)
    tile_pos = {int(t): n for n, t in enumerate(tiles)}
    wd = len(tiles) * 128
    dense_idx = np.asarray(
        [int(l) // lb * wd + tile_pos[int(l) % lb // 128] * 128
         + int(l) % 128 for l in idx_uniq],
        np.int32)
    dense_mask = np.zeros((1, wd), np.float32)
    dense_mask[0, dense_idx % wd] = 1.0
    # every block must see the SAME fix-lane pattern (face-locality): the
    # shared [1, wd] mask is only correct if each block's position set is
    # identical
    pos0 = set((dense_idx[(idx_uniq // lb) == 0] % wd).tolist())
    for b in range(1, 6 // nf):
        posb = set((dense_idx[(idx_uniq // lb) == b] % wd).tolist())
        assert posb == pos0, "fix-lane pattern differs between blocks"
    return (idx_lines, corner, idx_uniq, tuple(int(t) for t in tiles),
            nf, dense_idx, dense_mask)


@lru_cache(maxsize=None)
def _fixup_arrays_t(plan):
    """Transposed-slab companion to `_fixup_arrays`: the global affected
    128-lane tiles, and the xd_t ROW index of every line/corner lane
    (xd_t rows use the same block-major tile-dense layout as vd's lanes)."""
    idx_lines, corner, _, tiles, nf, _, _ = _fixup_arrays(plan)
    ne = plan.ne
    lb = nf * ne * ne * NPSQ
    wd = len(tiles) * 128
    tile_pos = {int(t): n for n, t in enumerate(tiles)}

    def pos(l):
        return (int(l) // lb * wd + tile_pos[int(l) % lb // 128] * 128
                + int(l) % 128)

    row_lines = np.asarray([[pos(l) for l in row] for row in idx_lines],
                           np.int32)
    row_corner = np.asarray([[pos(l) for l in row] for row in corner],
                            np.int32)
    if nf == 6:
        gtiles = tuple(int(t) for t in tiles)
    else:
        tpb = lb // 128
        gtiles = tuple(b * tpb + int(t)
                       for b in range(6 // nf) for t in tiles)
    return gtiles, row_lines, row_corner


def dss_fixup_tiles_t(xd_t, rsp, plan):
    """Transposed fixup: final (scaled) values [nv, k] for the cube-edge
    and corner lanes, computed from the TRANSPOSED affected-tile slab
    ``xd_t`` [n_tiles*128, k] (see `extract_tiles_t`) — every lane
    selection is a major-axis row gather, so XLA never relayouts a
    [k, e16]-sized array."""
    _, row_lines, row_corner = _fixup_arrays_t(plan)
    return _fixup_from_rows(xd_t, rsp, plan, row_lines, row_corner)


def _fixup_from_rows(xd_t, rsp, plan, row_lines, row_corner):
    """Fixup body shared by the 128-dense (`_fixup_arrays_t`) and compact
    (`_compact_arrays`) slab layouts — only the lane -> slab-row maps
    differ."""
    idx_lines, corner = _fixup_arrays(plan)[:2]
    k = xd_t.shape[1]
    nl = idx_lines.shape[1]

    g = xd_t[jnp.asarray(row_lines.reshape(-1))].reshape(24, nl, k)
    # junction sums along each line: samples t=4m+3 / t=4m+4 share a dof
    t = np.arange(nl)
    mj_hi = jnp.asarray(((t % NP == NP - 1) & (t < nl - 1))
                        .astype(np.float32))[:, None]
    mj_lo = jnp.asarray(((t % NP == 0) & (t > 0))
                        .astype(np.float32))[:, None]
    zl = (g + mj_hi * jnp.roll(g, -1, axis=1)
            + mj_lo * jnp.roll(g, 1, axis=1))

    rsp_l = rsp[:, idx_lines.reshape(-1)].reshape(-1, 24, nl, 1)
    # cross-edge pair sums WITHOUT a row gather: line 2p pairs with line
    # 2p+1 (position-flipped when the edge is flipped), so the partner
    # array is a pair-swap on a leading axis + a statically-masked flip —
    # streaming copies instead of a 24*nl-row take (the take's per-row
    # descriptors were the latency floor of the fixup chain; VERDICT r3
    # item 4). Pure permutation of the same f32 values — bitwise equal.
    flip_mask = np.asarray([e[4] for e in plan.edges], bool)
    zl4 = zl.reshape(12, 2, nl, k)
    sw = zl4[:, ::-1].reshape(12, 2, nl, k)
    sel = jnp.where(jnp.asarray(flip_mask)[:, None, None, None],
                    jnp.flip(sw, axis=2), sw)
    stk = zl + sel.reshape(24, nl, k)                       # [24, nl, k]
    vals = sum(stk * rsp_l[r] for r in range(rsp.shape[0]))

    cg = xd_t[jnp.asarray(row_corner.reshape(-1))].reshape(8, 3, k)
    cs_ = cg.sum(axis=1)
    rc = rsp[:, corner[:, 0]]
    cv = sum(cs_ * rc[r][:, None] for r in range(rsp.shape[0]))  # [8, k]

    return jnp.concatenate(
        [vals[:, 1:-1].reshape(-1, k), jnp.repeat(cv, 3, axis=0)], axis=0)


def dss_fixup_t(x_pre, rsp, plan):
    """Final (scaled) values + lane indices for the cube-edge and corner
    lanes, computed ENTIRELY from the pre-sweep field: one compact gather,
    junction sums (the line's own in-face sweep), cross-edge pair sums,
    corner triple-sums."""
    idx_lines, corner, idx_uniq = _fixup_arrays(plan)[:3]
    k = x_pre.shape[0]
    nl = idx_lines.shape[1]

    g = x_pre[:, idx_lines.reshape(-1)].reshape(k, 24, nl)
    # junction sums along each line: samples t=4m+3 / t=4m+4 share a dof
    t = np.arange(nl)
    mj_hi = jnp.asarray(((t % NP == NP - 1) & (t < nl - 1))
                        .astype(np.float32))
    mj_lo = jnp.asarray(((t % NP == 0) & (t > 0)).astype(np.float32))
    zl = (g + mj_hi * jnp.roll(g, -1, axis=-1)
            + mj_lo * jnp.roll(g, 1, axis=-1))

    rsp_l = rsp[:, idx_lines.reshape(-1)].reshape(-1, 1, 24, nl)
    outs = []
    for p, (fa, sa, fb, sb, flip) in enumerate(plan.edges):
        a, b = zl[:, 2 * p], zl[:, 2 * p + 1]
        bo = jnp.flip(b, axis=-1) if flip else b
        s = a + bo
        outs.append(s)
        outs.append(jnp.flip(s, axis=-1) if flip else s)
    stk = jnp.stack(outs, axis=1)                           # [k, 24, nl]
    vals = sum(stk * rsp_l[r] for r in range(rsp.shape[0]))

    cg = x_pre[:, corner.reshape(-1)].reshape(k, 8, 3)
    cs_ = cg.sum(axis=-1)
    rc = rsp[:, corner[:, 0]]                               # [nr, 8]
    cv = sum(cs_ * rc[r] for r in range(rsp.shape[0]))      # [k, 8]

    vals_uniq = jnp.concatenate(
        [vals[:, :, 1:-1].reshape(k, -1), jnp.repeat(cv, 3, axis=1)],
        axis=1)
    return vals_uniq, idx_uniq


@partial(jax.jit, static_argnames=("plan", "vdt", "interpret"))
def dss_structured_t_pallas(x, plan, rsp_lanes, vdt: bool = False,
                            mix=None, interpret: bool = False):
    """rspheremp * DSS(x) on transposed [k, e16] fields — three passes:
    (1) `extract_tiles_t` copies only the affected 128-lane tiles out
    TRANSPOSED, (2) the compact fixup (row gathers + line/corner sums)
    runs on that slab and scatters into a small tile-dense buffer
    (scatter-into-zeros fuses; scatter into the big array costs a full
    copy, measured 44 vs 799 us at ne30), (3) ONE Pallas pass does the
    sweeps + tile merge. Drop-in for
    dist.structured_dss.dss_structured_scaled_t."""
    gtiles, _, _ = _fixup_arrays_t(plan)
    xd_t = extract_tiles_t(x, gtiles, interpret=interpret)
    return dss_structured_t_pallas_pre(x, xd_t, plan, rsp_lanes, vdt=vdt,
                                       mix=mix, interpret=interpret)


@partial(jax.jit, static_argnames=("plan", "vdt", "interpret"))
def dss_structured_t_pallas_pre(x, xd_t, plan, rsp_lanes, vdt: bool = False,
                                mix=None, interpret: bool = False):
    """`dss_structured_t_pallas` with the affected-tile slab ``xd_t``
    already in hand: the PRODUCER kernel wrote it as a slot-mapped extra
    output (e.g. kernels.caar_pallas_t.caar_pallas_packed_t4_ext via
    `ext_slot_arrays`), so the separate extract dispatch and its read pass
    of the affected tiles disappear. xd_t rows must follow the
    `_fixup_arrays_t(plan)` gtiles order (ascending global tile index,
    each tile transposed to [128, k])."""
    _, _, _, tiles, nf, dense_idx, dense_mask = _fixup_arrays(plan)
    vals_t = dss_fixup_tiles_t(xd_t, rsp_lanes, plan)
    k = x.shape[0]
    wd_tot = (6 // nf) * len(tiles) * 128
    if vdt:
        # keep vals TRANSPOSED: row-scatter (fast path) + in-kernel flip
        vd = jnp.zeros((wd_tot, k), jnp.float32).at[
            jnp.asarray(dense_idx)].set(vals_t, unique_indices=True)
    else:
        # row-gather into vd-column order + transpose-place kernel (no
        # XLA relayout; see dss_structured_t_pallas_cpre)
        nv = dense_idx.shape[0]
        inv = np.full(wd_tot, nv, np.int32)
        inv[dense_idx] = np.arange(nv, dtype=np.int32)
        vals_z = jnp.concatenate(
            [vals_t, jnp.zeros((1, k), jnp.float32)], axis=0)
        vd = vals_to_vd_pallas(vals_z[jnp.asarray(inv)],
                               interpret=interpret)
    return dss_sweeps_pallas_t(x, rsp_lanes, vd, jnp.asarray(dense_mask),
                               plan.ne, tiles, nf, vdt=vdt, mix=mix,
                               interpret=interpret)


@lru_cache(maxsize=None)
def _compact_arrays(plan):
    """Static tables for the COMPACT fix-lane slab: the 128-dense slab and
    tile-dense vals buffer carry whole 128-lane tiles but only ~9-11% of
    those lanes are ever read or written by the fixup (per-tile max 38 at
    ne30/ne120) — at QSIZE_D=35 that is ~1 GB/stage of nearly-empty HBM
    traffic. Here each affected tile stores only its M fix lanes
    (M = per-tile max rounded up to the sublane granularity 8):

      * slab [nt*M, k]: the producer selects the M rows with a one-hot
        Q[M,128] @ tile.T MXU contraction (exact 3-limb bf16 split,
        fdot.make_sel — bitwise equal to the dense extraction);
      * vals buffer [k, (6//nf)*wr] (wr = ntb*M padded to 128 lanes per
        face-block region): the sweep kernel re-expands each tile with a
        [bk, M] @ P[M, 128] placement dot (same Q matrix, same exactness).

    Returns (M, Q bf16 [nt*M, 128], row_lines_c, row_corner_c,
    di_c [len(idx_uniq)], wd_c, wr, P bf16 [ntb*M, 128])."""
    idx_lines, corner, idx_uniq, tiles, nf, _, _ = _fixup_arrays(plan)
    gtiles, _, _ = _fixup_arrays_t(plan)
    ne = plan.ne
    lb = nf * ne * ne * NPSQ
    ntb = len(tiles)

    read = np.unique(np.concatenate([idx_lines.reshape(-1),
                                     corner.reshape(-1)]))
    by_tile = {}
    for l in read:
        by_tile.setdefault(int(l) // 128, []).append(int(l))
    assert set(by_tile) <= set(gtiles), "read lane outside affected tiles"
    M = -(-max(len(v) for v in by_tile.values()) // 8) * 8

    slot = {t: s for s, t in enumerate(gtiles)}
    pos = {}                       # lane -> global compact slab row
    q = np.zeros((len(gtiles) * M, 128), np.float32)
    for t, ll in by_tile.items():
        s = slot[t]
        for r, l in enumerate(sorted(ll)):
            pos[l] = s * M + r
            q[s * M + r, l % 128] = 1.0

    row_lines_c = np.asarray([[pos[int(l)] for l in row]
                              for row in idx_lines], np.int32)
    row_corner_c = np.asarray([[pos[int(l)] for l in row]
                               for row in corner], np.int32)

    # vals-buffer columns: per-face-block regions of width wr (128-padded
    # so the sweep's (bk, wr) lane block is legal for nf < 6)
    wr = -(-ntb * M // 128) * 128
    wd_c = (6 // nf) * wr
    di_c = np.asarray(
        [(pos[int(l)] // (ntb * M)) * wr + pos[int(l)] % (ntb * M)
         for l in idx_uniq], np.int32)
    assert len(di_c) == len(np.unique(di_c))
    rows_uniq = np.asarray([pos[int(l)] for l in idx_uniq], np.int32)

    # block-local placement table; fix-lane ranks are face-local, so every
    # block shares block 0's (asserted, like the dense mask pattern)
    p = q[:ntb * M]
    for b in range(1, 6 // nf):
        assert np.array_equal(q[b * ntb * M:(b + 1) * ntb * M], p), \
            "fix-lane rank pattern differs between face blocks"
    return (M, q.astype(jnp.bfloat16), row_lines_c, row_corner_c,
            di_c, wd_c, wr, p.astype(jnp.bfloat16), rows_uniq)


def cext_tables(plan, nblocks: int):
    """Producer-side tables for COMPACT fused extraction: the
    `ext_slot_arrays` slot/flag table plus (M, Q) — the per-tile one-hot
    row-selection matrices the producer kernels contract with
    (fdot.make_sel). Q rows follow the slab layout [nt*M, 128]."""
    sf, nt = ext_slot_arrays(plan, nblocks)
    M, q = _compact_arrays(plan)[:2]
    return sf, nt, M, q


def cext_tables_lg_for_gtiles(gtiles: tuple, nblocks: int, lg: int,
                              cM: int, q_dense):
    """Lane-grouped slot/selection tables for an EXPLICIT affected-tile
    list (the shard-local form of `cext_tables_lg` — used by the banded/
    face-sharded multi-chip paths whose slabs follow their own gtiles
    order): slots are assigned per affected SUPER-BLOCK (a run of lg
    tiles containing at least one affected tile), each granted lg*cM
    contiguous slab rows; group g of super-block I writes rows
    [g*cM, (g+1)*cM) of its slot block when its tile is flagged (static
    offsets — no dynamic stores), unaffected groups skip the write, and
    the monotone slot row keeps Pallas' revisit coalescing semantics.
    ``q_dense`` is the [len(gtiles)*cM, 128] one-hot selection table in
    the DENSE compact slab order (one cM-row block per affected tile).

    Returns (sf [1+lg, nblocks//lg], n_asb, cq_lg [n_asb*lg*cM, 128],
    perm [len(gtiles)*cM] — dense compact slab row -> lg slab row, for
    re-addressing the consumer's fixup row maps)."""
    assert nblocks % lg == 0, (nblocks, lg)
    nsb = nblocks // lg
    asb = sorted({t // lg for t in gtiles})
    S = {sb: i for i, sb in enumerate(asb)}
    dense_slot = {t: s for s, t in enumerate(gtiles)}

    sf = np.zeros((1 + lg, nsb), np.int32)
    s = 0
    for I in range(nsb):
        if I in S:
            s = S[I]
            for g in range(lg):
                if I * lg + g in dense_slot:
                    sf[1 + g, I] = 1
        sf[0, I] = s
    q_np = np.asarray(q_dense, np.float32)
    cq = np.zeros((len(asb) * lg * cM, 128), np.float32)
    perm = np.empty(len(gtiles) * cM, np.int64)
    for t in gtiles:
        dst = (S[t // lg] * lg + t % lg) * cM
        src = dense_slot[t] * cM
        cq[dst:dst + cM] = q_np[src:src + cM]
        perm[src:src + cM] = np.arange(dst, dst + cM)
    return sf, len(asb), cq.astype(jnp.bfloat16), perm


@lru_cache(maxsize=None)
def cext_tables_lg(plan, nblocks: int, lg: int):
    """Producer-side tables for COMPACT fused extraction from a
    LANE-GROUPED producer (lg 128-lane groups per grid step) on the
    single-chip whole-sphere slab: `cext_tables_lg_for_gtiles` driven by
    the plan's global affected tiles and `_compact_arrays` selection
    table. Returns (sf [1+lg, nsb], n_asb, cM, cq_lg [n_asb*lg*cM, 128]).
    The slab layout differs from `cext_tables`'s dense one only by the
    per-super-block strides + holes; the consumer difference is confined
    to the fixup's slab-row maps (`_compact_row_maps_lg`) — the vals
    buffer / sweep / placement tables are untouched."""
    gtiles, _, _ = _fixup_arrays_t(plan)
    (cM, q_dense) = _compact_arrays(plan)[:2]
    sf, nslots, cq, _ = cext_tables_lg_for_gtiles(gtiles, nblocks, lg,
                                                  cM, q_dense)
    return sf, nslots, cM, cq


@lru_cache(maxsize=None)
def _compact_row_maps_lg(plan, lg: int):
    """The fixup's slab-row maps (`_compact_arrays`'s row_lines_c /
    row_corner_c) re-addressed for the lane-grouped super-block slab:
    pos'(lane) = (S(tile//lg)*lg + tile%lg)*cM + rank(lane in tile)."""
    idx_lines, corner = _fixup_arrays(plan)[:2]
    gtiles, _, _ = _fixup_arrays_t(plan)
    cM = _compact_arrays(plan)[0]
    asb = sorted({t // lg for t in gtiles})
    S = {sb: i for i, sb in enumerate(asb)}

    read = np.unique(np.concatenate([idx_lines.reshape(-1),
                                     corner.reshape(-1)]))
    by_tile = {}
    for l in read:
        by_tile.setdefault(int(l) // 128, []).append(int(l))
    pos = {}
    for t, ll in by_tile.items():
        base = (S[t // lg] * lg + t % lg) * cM
        for r, l in enumerate(sorted(ll)):
            pos[l] = base + r
    row_lines = np.asarray([[pos[int(l)] for l in row]
                            for row in idx_lines], np.int32)
    row_corner = np.asarray([[pos[int(l)] for l in row]
                             for row in corner], np.int32)
    return row_lines, row_corner


def _sweep_kernel_ct(db: int, tiles: tuple, lb: int, M: int, mix: bool,
                     split: bool, interpret: bool, *refs):
    """Sweep + COMPACT edge/corner merge: like `_sweep_kernel_t`, but the
    fix values arrive as [bk, ntb*M] compact lanes and each affected tile
    is re-expanded with an exact one-hot placement dot (fdot.make_sel)."""
    from .fdot import make_sel

    if mix:
        (x_ref, m_ref, rsp_ref, vd_ref, p_ref, dm_ref, coef_ref, mx_ref,
         out_ref) = refs
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
    else:
        x_ref, m_ref, rsp_ref, vd_ref, p_ref, dm_ref, out_ref = refs
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        roll = lambda a, s: pltpu.roll(a, shift=s % lb, axis=1)
    _, sel_r = make_sel(split)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = _rsp_mul(rsp_ref[:], z)
    if mix:
        mx = mx_ref[:]
        out_ref[:] = ca * mx + cb * w
    else:
        out_ref[:] = w
    for n, t in enumerate(tiles):
        placed = sel_r(vd_ref[:, n * M:(n + 1) * M],
                       p_ref[n * M:(n + 1) * M, :])
        m = dm_ref[:, n * 128:(n + 1) * 128]
        merged = w[:, t * 128:(t + 1) * 128] * (1.0 - m) + placed
        if mix:
            merged = ca * mx[:, t * 128:(t + 1) * 128] + cb * merged
        out_ref[:, t * 128:(t + 1) * 128] = merged


@partial(jax.jit, static_argnames=("ne", "tiles", "nf", "faces", "m_rows",
                                   "interpret", "block_k"))
def dss_sweeps_pallas_ct(x, rsp, vd_c, dense_mask, p_tbl, ne: int,
                         tiles: tuple, nf: int, m_rows: int, faces: int = 6,
                         mix=None, interpret: bool = False,
                         block_k: int = 16):
    """`dss_sweeps_pallas_t` with the COMPACT vals buffer: ``vd_c`` is
    [k, (faces/nf)*wr] (wr = len(tiles)*m_rows padded to 128) and
    ``p_tbl`` the [len(tiles)*m_rows, 128] bf16 placement table from
    `_compact_arrays`. Requires a 128-aligned lane axis (the compact path
    only runs fused — even ne, elem_block 8)."""
    k, e16 = x.shape
    assert e16 == faces * ne * ne * NPSQ, (e16, ne, faces)
    lb = nf * ne * ne * NPSQ
    assert lb % 128 == 0, lb
    bk = fit_block_k(k, lb, block_k)
    ntb = len(tiles)
    wr = vd_c.shape[1] // (faces // nf)
    assert wr % 128 == 0 and wr >= ntb * m_rows, (wr, ntb, m_rows)
    masks = jnp.asarray(_sweep_masks_np(ne, nf))
    db = NPSQ * ne - (NP - 1)
    # face axis FIRST (see dss_sweeps_pallas_t): keeps the per-face rsp
    # block resident across the k sweep
    blk = lambda: pl.BlockSpec((bk, lb), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)
    mk_specs = lambda: [
        blk(),
        pl.BlockSpec((4, lb), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rsp.shape[0], lb), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, wr), lambda j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ntb * m_rows, 128), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ntb * 128), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, masks, rsp, vd_c, p_tbl, dense_mask]
    out_rows = k
    aliases = {}
    if mix is not None:
        mx, ca, cb = mix
        assert mx.shape[1] == e16 and mx.shape[0] >= k, (mx.shape, x.shape)
        if mx.shape[0] != k and mx.shape[0] % bk:
            cands = [b for b in range(bk, 0, -1)
                     if k % b == 0 and mx.shape[0] % b == 0]
            bk = next((b for b in cands if b % 8 == 0), cands[0])
            blk = lambda: pl.BlockSpec((bk, lb), lambda j, i: (i, j),
                                       memory_space=pltpu.VMEM)
        in_specs = mk_specs()
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM), blk()]
        operands += [coef, mx]
        if mx.shape[0] > k:
            out_rows = mx.shape[0]
            aliases = {7: 0}      # mx -> out: unvisited rows ride through
    else:
        in_specs = mk_specs()
    return pl.pallas_call(
        partial(_sweep_kernel_ct, db, tiles, lb, m_rows, mix is not None,
                not interpret, interpret),
        grid=(faces // nf, k // bk),
        in_specs=in_specs,
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((out_rows, e16), jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=SWEEP_VMEM_CAP,
        ),
        interpret=interpret,
    )(*operands)


def _vals_tp_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


@partial(jax.jit, static_argnames=("interpret",))
def vals_to_vd_pallas(vals_di, interpret: bool = False):
    """[wd_c, k] row-major vals (already permuted into vd-column order)
    -> [k, wd_c]: a trivial Pallas transpose-place kernel (one [128, k]
    block in, its [k, 128] transpose out per grid step). Replaces the
    XLA `vals_t.T` + column-scatter pair, whose relayout cost measured
    ~60 us per DSS call at ne30 (fixup-chain attribution, BYTES_MODEL
    round-5 q1 decomposition)."""
    wd_c, k = vals_di.shape
    assert wd_c % 128 == 0, wd_c
    if interpret:
        return vals_di.T
    return pl.pallas_call(
        _vals_tp_kernel,
        grid=(wd_c // 128,),
        in_specs=[pl.BlockSpec((128, k), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, 128), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, wd_c), jnp.float32),
    )(vals_di)


@lru_cache(maxsize=None)
def _vd_inverse_perm(plan):
    """vd-column -> vals-row inverse permutation: position c of the
    compact vals buffer takes vals row inv[c] (the pattern index whose
    di_c equals c), or the trailing zero row for the ~5-10% pad holes.
    With this, vd_c = `vals_to_vd_pallas`(concat(vals, zeros)[inv]) —
    one row gather + one transpose-place kernel instead of the XLA
    transpose + column scatter."""
    di_c, wd_c = _compact_arrays(plan)[4:6]
    nv = len(di_c)
    inv = np.full(wd_c, nv, np.int32)          # default: the zero row
    inv[di_c] = np.arange(nv, dtype=np.int32)
    return inv, nv


@partial(jax.jit, static_argnames=("plan", "lg", "interpret"))
def dss_structured_t_pallas_cpre(x, xs, plan, rsp_lanes, mix=None,
                                 lg: int = 0,
                                 interpret: bool = False):
    """`dss_structured_t_pallas_pre` on the COMPACT fix-lane slab ``xs``
    [nt*M, k] emitted by a `cext_tables`-driven producer: the fixup's row
    gathers use the compact row maps, the vals scatter targets the compact
    [k, wd_c] buffer, and the sweep re-expands each affected tile with an
    exact placement dot — ~3.2x less slab/vals HBM traffic than the
    128-dense path at ne30/ne120 (per-tile fix-lane occupancy ~9-11%)."""
    _, _, _, tiles, nf, _, _ = _fixup_arrays(plan)
    (m_rows, _, row_lines_c, row_corner_c, di_c, wd_c, _,
     p_tbl, _) = _compact_arrays(plan)
    if lg > 1:
        # slab emitted by a lane-grouped producer: super-block slot
        # layout — only the fixup's slab-row maps change
        row_lines_c, row_corner_c = _compact_row_maps_lg(plan, lg)
    vals_t = _fixup_from_rows(xs, rsp_lanes, plan, row_lines_c,
                              row_corner_c)
    k = x.shape[0]
    # vd build: row-gather into vd-column order + transpose-place kernel
    # (replaces vals_t.T + column scatter — measured ~60 us/call of XLA
    # relayout at ne30; bitwise-equal, holes are the zero row)
    inv, nv = _vd_inverse_perm(plan)
    vals_z = jnp.concatenate(
        [vals_t, jnp.zeros((1, vals_t.shape[1]), jnp.float32)], axis=0)
    vd_c = vals_to_vd_pallas(vals_z[jnp.asarray(inv)],
                             interpret=interpret)
    _, _, _, _, _, _, dense_mask = _fixup_arrays(plan)
    return dss_sweeps_pallas_ct(x, rsp_lanes, vd_c, jnp.asarray(dense_mask),
                                jnp.asarray(p_tbl), plan.ne, tiles, nf,
                                m_rows, mix=mix, interpret=interpret)


@lru_cache(maxsize=None)
def ext_slot_arrays(plan, nblocks: int):
    """Slot/flag tables for PRODUCER-fused tile extraction over a grid of
    ``nblocks`` 128-lane blocks: row 0 maps grid block i to the xd_t slab
    slot of the most recent affected tile at or before i (monotone
    non-decreasing, so consecutive blocks sharing a slot coalesce into ONE
    buffer flush under Pallas revisiting semantics), row 1 flags the
    affected tiles (the producer writes its transposed block to the slab
    only when flagged — unflagged visits leave the resident buffer
    untouched, so each slot's flush carries exactly its affected tile).
    Requires the producer's lane grid to be 128-lane blocks covering
    [*, nblocks*128] — i.e. e16 % 128 == 0 and elem_block*NPSQ == 128."""
    gtiles, _, _ = _fixup_arrays_t(plan)
    return slot_arrays_for_gtiles(gtiles, nblocks)


@lru_cache(maxsize=None)
def slot_arrays_for_gtiles(gtiles: tuple, nblocks: int):
    """`ext_slot_arrays` for an explicit (ascending) affected-tile list —
    used by the sharded/banded paths whose xd_t slabs follow their own
    shard-local gtiles order."""
    assert gtiles == tuple(sorted(gtiles)) and gtiles[-1] < nblocks, (
        gtiles[-1], nblocks)
    pos = {t: n for n, t in enumerate(gtiles)}
    slots = np.zeros(nblocks, np.int32)
    flags = np.zeros(nblocks, np.int32)
    s = 0
    for i in range(nblocks):
        if i in pos:
            s = pos[i]
            flags[i] = 1
        slots[i] = s
    return np.stack([slots, flags]), len(gtiles)


def fix_vals3(xs, rsp_lanes, plan, lg: int = 0):
    """Per-tile fixup value blocks [nt, M, k] from the compact slab ``xs``
    [nt*M, k]: the cube-edge/corner line math (`_fixup_from_rows`) followed
    by a ROW scatter back into slab-row order — no transposes, so XLA never
    relayouts anything k-sized. Feeds `merge_patch_pallas`. ``lg`` > 1
    reads a lane-grouped producer's super-block slab (only the read row
    maps change; the output stays in dense gtiles order)."""
    (m_rows, _, row_lines_c, row_corner_c, _, _, _, _,
     rows_uniq) = _compact_arrays(plan)
    if lg > 1:
        row_lines_c, row_corner_c = _compact_row_maps_lg(plan, lg)
    vals = _fixup_from_rows(xs, rsp_lanes, plan, row_lines_c, row_corner_c)
    k = xs.shape[1]
    nt = len(_fixup_arrays_t(plan)[0])
    v = jnp.zeros((nt * m_rows, k), jnp.float32).at[
        jnp.asarray(rows_uniq)].set(vals, unique_indices=True)
    return v.reshape(nt, m_rows, k)


@partial(jax.jit, static_argnames=("plan", "lg", "interpret"))
def dss_structured_t_pallas_patch(x, xs, plan, rsp_lanes, mix=None,
                                  lg: int = 0, interpret: bool = False):
    """`dss_structured_t_pallas_cpre` with the sweep/patch SPLIT: the
    sweep runs MERGE-FREE (`dss_sweeps_pallas_nomerge`) and the fix
    tiles are rewritten once each by `merge_patch_pallas`. Bitwise-equal
    to the cpre path (same placement dots, same fp order on every lane;
    gated in tests/test_dss_compact.py).

    MEASURED VERDICT (round 5, on chip): LOSES to the fused cpre path —
    q35 tracer stage 26.5 -> 30.5 ms (+15%). The hypothesis was that
    the in-sweep merge loop's ntb placement dots per k-block grid step
    (~80k tiny MXU ops per q35 DSS call) throttle the tall-field sweep
    to ~300 GB/s; in fact Mosaic pipelines those dots under the block
    DMA, and the patch's extra read+write of the ~38% affected tiles
    (~0.66 GB/call at q35) is pure added traffic. Kept as the A/B
    variant and as the single-chip mirror of the multi-chip overlap
    decomposition (where the same split buys collective hiding)."""
    _, _, _, _, nf, _, _ = _fixup_arrays(plan)
    vals3 = fix_vals3(xs, rsp_lanes, plan, lg=lg)
    w = dss_sweeps_pallas_nomerge(x, rsp_lanes, plan.ne, nf,
                                  mix=mix, interpret=interpret)
    pmix = None if mix is None else (mix[0], mix[1], mix[2])
    return merge_patch_pallas(w, vals3, plan, mix=pmix,
                              interpret=interpret)


def _merge_patch_kernel(mix, split, *refs):
    from .fdot import make_sel

    if mix:
        gt_ref, w_ref, v_ref, p_ref, dm_ref, coef_ref, mx_ref, o_ref = refs
    else:
        gt_ref, w_ref, v_ref, p_ref, dm_ref, o_ref = refs
    _, sel_r = make_sel(split)
    placed = sel_r(v_ref[0].T, p_ref[:])          # [k, 128], exact
    m = dm_ref[:]
    w = w_ref[:]
    if mix:
        ca, cb = coef_ref[0, 0], coef_ref[0, 1]
        o_ref[:] = w * (1.0 - m) + (ca * mx_ref[:] + cb * placed) * m
    else:
        o_ref[:] = w * (1.0 - m) + placed * m


@partial(jax.jit, static_argnames=("plan", "interpret"))
def merge_patch_pallas(w, vals3, plan, mix=None, interpret: bool = False):
    """Rewrite the cube-edge/corner FIX TILES of the ring-fused output
    ``w`` in place (input_output_aliases): grid over the affected tiles
    only, each block re-expanded from ``vals3`` (`fix_vals3`) with the
    exact one-hot placement dot. With ``mix=(mx, ca, cb)`` the patched
    lanes get ca*mx + cb*vals (the ring emission already applied the mix
    to the non-fix lanes; fix lanes carry don\'t-care partial sums)."""
    gtiles, _, _ = _fixup_arrays_t(plan)
    (m_rows, _, _, _, _, _, _, p_tbl, _) = _compact_arrays(plan)
    _, _, _, _, _, _, dense_mask = _fixup_arrays(plan)
    k, e16 = w.shape
    nt = len(gtiles)
    assert vals3.shape == (nt, m_rows, k), (vals3.shape, nt, m_rows, k)
    gt = jnp.asarray(np.asarray(gtiles, np.int32))
    # per-GLOBAL-tile mask lanes: dense_mask is per-block-local tile order,
    # identical for every face block (asserted in _fixup_arrays)
    ntb = dense_mask.shape[1] // 128

    in_specs = [
        pl.BlockSpec((k, 128), lambda n, gt: (0, gt[n]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_rows, k), lambda n, gt: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_rows, 128),
                     lambda n, gt: (n % ntb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda n, gt: (0, n % ntb),
                     memory_space=pltpu.VMEM),
    ]
    operands = [gt, w, vals3, jnp.asarray(p_tbl), jnp.asarray(dense_mask)]
    if mix is not None:
        mx, ca, cb = mix
        coef = jnp.stack([jnp.asarray(ca, jnp.float32),
                          jnp.asarray(cb, jnp.float32)]).reshape(1, 2)
        in_specs += [pl.BlockSpec((1, 2), lambda n, gt: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((k, 128), lambda n, gt: (0, gt[n]),
                                  memory_space=pltpu.VMEM)]
        operands += [coef, mx]
    return pl.pallas_call(
        partial(_merge_patch_kernel, mix is not None, not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((k, 128), lambda n, gt: (0, gt[n]),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k, e16), jnp.float32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(*operands)
