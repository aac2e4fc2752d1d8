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
* **edge/corner fixup** (`dss_fixup_t`): ONE compact gather of the 24
  cube-edge lines + 8x3 corner lanes *from the pre-sweep field* (line
  lanes only ever receive sweep contributions from within their own
  line, so their post-sweep values are reconstructable compactly — and
  the gather can overlap the sweep kernel), the junction/pair/corner
  sums in compact space, then ONE duplicate-free scatter back over the
  swept output. rspheremp is constant across the aliases of a shared
  dof (the inverse of the globally assembled spheremp), so the pair
  sums commute with the fused scaling.

Replaces HOMME's edge-buffer pack/exchange (element_mod.F90:234-236,
the layer the reference stripped) for the single-chip assembled step.
Measured at ne30 (stacked [288, 86400]): ~1.7 ms vs ~4.5 ms for the
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

__all__ = ["dss_sweeps_pallas_t", "dss_structured_t_pallas"]


@lru_cache(maxsize=None)
def _sweep_masks_np(ne: int):
    """[4, e16] f32 lane masks: alpha-hi/alpha-lo/beta-hi/beta-lo."""
    e16 = 6 * ne * ne * NPSQ
    lane = np.arange(e16)
    i = (lane // NP) % NP
    j = lane % NP
    ei = (lane // NPSQ) % ne
    ej = (lane // (NPSQ * ne)) % ne
    return np.stack([
        (i == NP - 1) & (ei < ne - 1), (i == 0) & (ei > 0),
        (j == NP - 1) & (ej < ne - 1), (j == 0) & (ej > 0),
    ]).astype(np.float32)


def _sweep_kernel_t(db: int, tiles: tuple, e16: int, interpret: bool,
                    x_ref, m_ref, rsp_ref, vd_ref, dm_ref, out_ref):
    if interpret:
        roll = lambda a, s: jnp.roll(a, s, axis=1)
    else:
        # pltpu.roll wants non-negative shifts; cyclic -s == e16 - s
        roll = lambda a, s: pltpu.roll(a, shift=s % e16, axis=1)

    x = x_ref[:]
    y = x + m_ref[0:1] * roll(x, -NP) + m_ref[1:2] * roll(x, NP)
    z = y + m_ref[2:3] * roll(y, -db) + m_ref[3:4] * roll(y, db)
    w = rsp_ref[:] * z
    out_ref[:] = w
    # fused edge/corner merge: rewrite only the statically-known 128-lane
    # tiles that contain fix lanes (the tile-dense vals/mask operands are
    # laid out one 128-lane slot per affected tile)
    for n, t in enumerate(tiles):
        wdt = min(128, e16 - t * 128)
        m = dm_ref[:, n * 128:n * 128 + wdt]
        out_ref[:, t * 128:t * 128 + wdt] = (
            w[:, t * 128:t * 128 + wdt] * (1.0 - m)
            + vd_ref[:, n * 128:n * 128 + wdt] * m
        )


@partial(jax.jit, static_argnames=("ne", "tiles", "interpret", "block_k"))
def dss_sweeps_pallas_t(x, rsp, vals_dense, dense_mask, ne: int,
                        tiles: tuple, interpret: bool = False,
                        block_k: int = 16):
    """rsp * (alpha+beta sweeps of x) with the edge/corner fix merged in:
    ``vals_dense``/``dense_mask`` are [k, len(tiles)*128] / [1, ...]
    tile-dense buffers (one 128-lane slot per affected tile)."""
    k, e16 = x.shape
    assert e16 == 6 * ne * ne * NPSQ, (e16, ne)
    bk = block_k
    while k % bk:
        bk //= 2
    masks = jnp.asarray(_sweep_masks_np(ne))
    db = NPSQ * ne - (NP - 1)
    wd = len(tiles) * 128
    return pl.pallas_call(
        partial(_sweep_kernel_t, db, tiles, e16, interpret),
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec((bk, e16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, e16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, wd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bk, e16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, e16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, masks, rsp, vals_dense, dense_mask)


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

    # tile-dense decomposition: the 128-lane tiles containing fix lanes
    # (~38% of tiles at ne30), one dense 128-lane slot per tile
    e16 = 6 * ne * ne * NPSQ
    tiles = np.unique(idx_uniq // 128)
    tile_pos = {int(t): n for n, t in enumerate(tiles)}
    dense_idx = np.asarray(
        [tile_pos[int(l) // 128] * 128 + int(l) % 128 for l in idx_uniq],
        np.int32)
    dense_mask = np.zeros((1, len(tiles) * 128), np.float32)
    dense_mask[0, dense_idx] = 1.0
    return (idx_lines, corner, idx_uniq, tuple(int(t) for t in tiles),
            dense_idx, dense_mask)


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

    rsp_l = rsp[:, idx_lines.reshape(-1)].reshape(1, 24, nl)
    outs = []
    for p, (fa, sa, fb, sb, flip) in enumerate(plan.edges):
        a, b = zl[:, 2 * p], zl[:, 2 * p + 1]
        bo = jnp.flip(b, axis=-1) if flip else b
        s = a + bo
        outs.append(s)
        outs.append(jnp.flip(s, axis=-1) if flip else s)
    vals = jnp.stack(outs, axis=1) * rsp_l                  # [k, 24, nl]

    cg = x_pre[:, corner.reshape(-1)].reshape(k, 8, 3)
    cv = cg.sum(axis=-1) * rsp[:, corner[:, 0]]             # [k, 8]

    vals_uniq = jnp.concatenate(
        [vals[:, :, 1:-1].reshape(k, -1), jnp.repeat(cv, 3, axis=1)],
        axis=1)
    return vals_uniq, idx_uniq


@partial(jax.jit, static_argnames=("plan", "interpret"))
def dss_structured_t_pallas(x, plan, rsp_lanes, interpret: bool = False):
    """rspheremp * DSS(x) on transposed [k, e16] fields — compact fixup
    scattered into a small tile-dense buffer (scatter-into-zeros fuses;
    scatter into the big array costs a full copy, measured 44 vs 799 us
    at ne30), then ONE Pallas pass doing the sweeps + tile merge. Drop-in
    for dist.structured_dss.dss_structured_scaled_t."""
    _, _, _, tiles, dense_idx, dense_mask = _fixup_arrays(plan)
    vals, _ = dss_fixup_t(x, rsp_lanes, plan)
    k = x.shape[0]
    vd = jnp.zeros((k, len(tiles) * 128), jnp.float32).at[
        :, jnp.asarray(dense_idx)].set(vals, unique_indices=True)
    return dss_sweeps_pallas_t(x, rsp_lanes, vd, jnp.asarray(dense_mask),
                               plan.ne, tiles, interpret=interpret)
