"""Face-sharded packed assembled step: the multi-chip fast path.

The single-chip fast path (dist/step_pallas.py::caar_dss_structured_packed_t4)
runs the fused CAAR kernel + structured Pallas DSS on the whole packed
[4*nlev, E16] lane axis. This module shards that lane axis BY CUBE FACE over
a ``jax.sharding.Mesh`` (shard_map): per shard, the CAAR kernel and the
in-face DSS sweeps are entirely local (the sweep partners of a lane never
leave its face), and the only cross-chip traffic is ONE ``all_gather`` of
the compact face-side lines — O(ne*NP*nlev) values per face, the exact
perimeter-minimal exchange volume of HOMME's edge-buffer pack/exchange
(fortran/element_mod.F90:234-236, the layer the reference stripped).

Supported mesh sizes: any divisor of 6 (1, 2, 3, 6 faces per shard... i.e.
shards of 6/N whole faces). The per-shard programs are the SAME Pallas
kernels as the single-chip path (kernels/caar_pallas_t.py,
kernels/dss_pallas.py) on a shorter lane axis.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import NP, NPSQ
from .structured_dss import _SIDES, _side_line_idx

__all__ = ["caar_dss_sharded_t4", "shard_packed_t4", "make_face_mesh"]


def make_face_mesh(devices=None, n: int | None = None) -> Mesh:
    """A 1-D face mesh over ``n`` devices (n | 6); defaults to the largest
    divisor of 6 that fits the available devices."""
    devices = list(jax.devices() if devices is None else devices)
    if n is None:
        n = next(d for d in (6, 3, 2, 1) if d <= len(devices))
    assert 6 % n == 0, f"face mesh needs n | 6, got {n}"
    return Mesh(np.asarray(devices[:n]), ("e",))


@lru_cache(maxsize=None)
def _sharded_fixup_arrays(plan, fps: int):
    """Static tables for the face-sharded fixup (``fps`` faces per shard).

    Everything position-like is face-local (identical for every face); the
    cross-face pairing/corner assignment is carried as small index tables
    looked up with the traced shard index.
    """
    ne = plan.ne
    nl = ne * NP
    fl = ne * ne * NPSQ                                  # lanes per face

    # local side lines of face 0 (the pattern is identical per face)
    line_loc = np.stack([_side_line_idx(ne, 0, s) for s in _SIDES])

    # local fix-lane set: side interiors + the 4 face-corner lanes
    corner_loc = np.unique(line_loc[:, [0, -1]].reshape(-1))
    assert corner_loc.size == 4
    idx_uniq = np.concatenate([line_loc[:, 1:-1].reshape(-1), corner_loc])
    assert len(idx_uniq) == len(np.unique(idx_uniq))

    # tile-dense decomposition of one face (sweep-kernel merge operands)
    tiles = np.unique(idx_uniq // 128)
    tile_pos = {int(t): n for n, t in enumerate(tiles)}
    wd = len(tiles) * 128
    dense_idx = np.asarray(
        [tile_pos[int(l) // 128] * 128 + int(l) % 128 for l in idx_uniq],
        np.int32)
    dense_mask = np.zeros((1, wd), np.float32)
    dense_mask[0, dense_idx] = 1.0

    # xd_t row of every local line lane (extract_tiles_t layout)
    pos = lambda l: tile_pos[int(l) // 128] * 128 + int(l) % 128
    row_lines = np.asarray([[pos(l) for l in row] for row in line_loc],
                           np.int32)

    # COMPACT fix-lane tables (kernels/dss_pallas.py::_compact_arrays
    # ported to the face-local pattern): the slab read set is exactly the
    # side lines (their ends ARE the face corners), so one Q matrix both
    # selects the producer's fix rows and places the sweep's merge lanes.
    by_tile = {}
    for l in np.unique(line_loc.reshape(-1)):
        by_tile.setdefault(int(l) // 128, []).append(int(l))
    ntb = len(tiles)
    Mc = -(-max(len(v) for v in by_tile.values()) // 8) * 8
    cpos = {}
    qc = np.zeros((ntb * Mc, 128), np.float32)
    for t, ll in by_tile.items():
        s = tile_pos[t]
        for r, l in enumerate(sorted(ll)):
            cpos[l] = s * Mc + r
            qc[s * Mc + r, l % 128] = 1.0
    rowc_lines = np.asarray([[cpos[int(l)] for l in row]
                             for row in line_loc], np.int32)
    ci_c = np.asarray([cpos[int(l)] for l in idx_uniq], np.int32)
    wr = -(-ntb * Mc // 128) * 128

    # cross-face pairing: face f side si -> (partner face, side, flip)
    partner = np.zeros((6, 4, 2), np.int32)
    flip_tab = np.zeros((6, 4), np.float32)
    for fa, sa, fb, sb, fl_ in plan.edges:
        ia, ib = _SIDES.index(sa), _SIDES.index(sb)
        partner[fa, ia] = (fb, ib)
        partner[fb, ib] = (fa, ia)
        flip_tab[fa, ia] = flip_tab[fb, ib] = float(fl_)

    # cube corners: alias lanes -> (face, side, end) slots in the gathered
    # [6, 4, 2(end)] endpoint table; per-face corner assignment tables
    ends_global = {}
    for f in range(6):
        for si, s in enumerate(_SIDES):
            gl = _side_line_idx(ne, f, s)
            ends_global[int(gl[0])] = (f, si, 0)
            ends_global[int(gl[-1])] = (f, si, 1)
    corner_rows = np.asarray(plan.corner_rows, np.int32)     # [8, 3]
    corner_slot = np.asarray(
        [[ends_global[int(r)][0] * 8 + ends_global[int(r)][1] * 2
          + ends_global[int(r)][2] for r in row] for row in corner_rows],
        np.int32)                                            # [8, 3]
    # face f's 4 corner lanes, in corner_loc (ascending local-lane) order,
    # mapped to their cube-corner ids
    face_cid = np.zeros((6, 4), np.int32)
    for c, row in enumerate(corner_rows):
        for r in row:
            f, loc = int(r) // fl, int(r) % fl
            face_cid[f, int(np.searchsorted(corner_loc, loc))] = c
    corner_dense = np.asarray([pos(l) for l in corner_loc], np.int32)

    return (line_loc, idx_uniq, tuple(int(t) for t in tiles), dense_idx,
            dense_mask, row_lines, partner, flip_tab, corner_slot,
            face_cid, corner_dense, nl, fl,
            Mc, qc.astype(jnp.bfloat16), rowc_lines, ci_c, wr)


@partial(jax.jit, static_argnames=("plan", "mesh", "eb", "nlev", "moist",
                                   "lg", "overlap", "interpret"))
def caar_dss_sharded_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                        s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                        plan, rsp_lanes, mesh: Mesh,
                        eb: int, nlev: int, moist: bool = True,
                        lg: int = 0, overlap: bool = False,
                        interpret: bool = False):
    """Face-sharded assembled leapfrog step over ``mesh`` (axis "e" with
    6/N whole faces per shard). Same contract as
    step_pallas.caar_dss_structured_packed_t4; the lane axis of every
    [*, E16] operand is sharded P(None, "e"). Cross-chip traffic: one
    all_gather of the compact side lines. ``lg=0`` auto-picks the
    per-shard lane-group width on the fused path (round-4 grid-overhead
    fix, bitwise-equal to the eb=8 kernel); ``lg=1`` disables."""
    from ..kernels.caar_pallas_t import (
        caar_pallas_packed_t4, caar_pallas_packed_t4_ext,
        caar_pallas_packed_t4_lg,
    )
    from ..kernels.dss_pallas import (
        cext_tables_lg_for_gtiles, dss_sweeps_pallas_ct,
        dss_sweeps_pallas_nomerge, dss_sweeps_pallas_t, extract_tiles_t,
        merge_patch_tiles, slot_arrays_for_gtiles,
    )
    from .banded_t4 import _resolve_lg

    nshards = mesh.shape["e"]
    assert 6 % nshards == 0, nshards
    fps = 6 // nshards                                   # faces per shard
    (line_loc, idx_uniq, tiles, dense_idx, dense_mask, row_lines,
     partner, flip_tab, corner_slot, face_cid, corner_dense, nl, fl,
     Mc, qc, rowc_lines, ci_c, wr) = _sharded_fixup_arrays(plan, fps)
    ne = plan.ne
    k4 = s0.shape[0]
    k = nlev
    wd = len(tiles) * 128

    # shard-local xd_t tile ids for each of the shard's faces
    # (fps > 1 requires 128 | fl so per-face tile ids tile cleanly)
    assert fps == 1 or fl % 128 == 0, (fl, fps)
    gtiles_shard = tiles if fps == 1 else tuple(
        b * (fl // 128) + t for b in range(fps) for t in tiles)

    # producer-fused tile extraction when the shard's lane axis is 128-
    # aligned and the kernel runs 128-lane blocks (elem_block == 8)
    from ..fastpath import fused_admissible

    local_lanes = fps * fl
    fuse_ext = fused_admissible(eb, local_lanes, "caar_dss_sharded_t4")
    lg = _resolve_lg(lg, fuse_ext, local_lanes, "caar_dss_sharded_t4")
    perm = None
    if fuse_ext:
        # fused implies the COMPACT fix-lane slab (round-3 port): the
        # producer selects each tile's Mc fix lanes (cq/cM) and the sweep
        # re-expands them with exact placement dots; lg > 1 lays the slab
        # out in the lane-grouped super-block slot order (only the fixup
        # row maps change — the vals/placement tables are untouched)
        q_dense = np.tile(np.asarray(qc), (fps, 1))
        if lg > 1:
            sf_np, nslots_lg, cq_np, perm = cext_tables_lg_for_gtiles(
                gtiles_shard, local_lanes // 128, lg, Mc, q_dense)
        else:
            sf_np, nt_ext = slot_arrays_for_gtiles(gtiles_shard,
                                                   local_lanes // 128)
            cq_np = q_dense

    ntb = len(tiles)
    slab_w = ntb * Mc if fuse_ext else wd       # slab rows per face
    vd_rows = wr if fuse_ext else wd

    partner_j = jnp.asarray(partner)
    flip_j = jnp.asarray(flip_tab)
    cslot_j = jnp.asarray(corner_slot.reshape(-1))
    fcid_j = jnp.asarray(face_cid)
    rows_flat = (rowc_lines if fuse_ext else row_lines).reshape(-1)
    # per-face slab-row maps (the lg slab only permutes the rows)
    remap = (lambda r: perm[r]) if perm is not None else (lambda r: r)
    rows_pf = np.stack([remap(rows_flat + b * slab_w)
                        for b in range(fps)])
    di_j = jnp.asarray(ci_c if fuse_ext else dense_idx)
    dm_j = jnp.asarray(dense_mask)
    lineloc_j = jnp.asarray(line_loc.reshape(-1))
    corner_loc = np.unique(line_loc[:, [0, -1]].reshape(-1))
    cornerloc_j = jnp.asarray(corner_loc)

    t = np.arange(nl)
    mj_hi = jnp.asarray(((t % NP == NP - 1) & (t < nl - 1))
                        .astype(np.float32))[None, None, :, None]
    mj_lo = jnp.asarray(((t % NP == 0) & (t > 0))
                        .astype(np.float32))[None, None, :, None]

    def body(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
             s0, sm1, qdp, pecnd, vn0u, vn0v, omg, rsp):
        shard = jax.lax.axis_index("e")

        # 1+2. local fused CAAR kernel (element blocks never cross shards),
        # emitting this shard's transposed affected tiles directly when the
        # slot-mapped extra output is admissible
        if fuse_ext and lg > 1:
            s1, phi, a1, b1, c1, xd_t = caar_pallas_packed_t4_lg(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                nlev=k, moist=moist, lg=lg, sf=jnp.asarray(sf_np),
                cq=jnp.asarray(cq_np), nslots=nslots_lg, cM=Mc,
                interpret=interpret)
        elif fuse_ext:
            s1, phi, a1, b1, c1, xd_t = caar_pallas_packed_t4_ext(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg, jnp.asarray(sf_np),
                nt=nt_ext, nlev=k, moist=moist,
                cq=jnp.asarray(cq_np), cM=Mc, interpret=interpret)
        else:
            s1, phi, a1, b1, c1 = caar_pallas_packed_t4(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                eb=eb, nlev=k, moist=moist, interpret=interpret)
            xd_t = extract_tiles_t(s1, gtiles_shard, interpret=interpret)

        # 3. compact side lines of the shard's faces -> all_gather
        lines = jnp.stack([xd_t[rows_pf[b]].reshape(4, nl, k4)
                           for b in range(fps)], axis=0)
        all_lines = jax.lax.all_gather(lines, "e").reshape(6, 4, nl, k4)

        # 4. the fixup values, from the gathered lines only
        zl = (all_lines + mj_hi * jnp.roll(all_lines, -1, axis=2)
                        + mj_lo * jnp.roll(all_lines, 1, axis=2))
        ends = all_lines[:, :, (0, nl - 1)].reshape(6 * 4 * 2, k4)
        cv_all = ends[cslot_j].reshape(8, 3, k4).sum(axis=1)   # [8, k4]

        vd_parts = []
        for b in range(fps):
            f = shard * fps + b
            own = jax.lax.dynamic_index_in_dim(zl, f, 0, False)   # [4,nl,k4]
            pf = partner_j[f, :, 0]
            psi = partner_j[f, :, 1]
            par = zl[pf, psi]                                     # [4,nl,k4]
            fl_f = flip_j[f][:, None, None]
            par = fl_f * jnp.flip(par, axis=1) + (1.0 - fl_f) * par
            # scale by this face's rsp at the line lanes (two-float aware)
            nr = rsp.shape[0]
            rloc = rsp[:, lineloc_j + b * fl].reshape(nr, 4, nl, 1)
            op = own + par
            vals_lines = sum(op * rloc[r] for r in range(nr))     # [4,nl,k4]
            cv = cv_all[fcid_j[f]]                                # [4, k4]
            rcor = rsp[:, cornerloc_j + b * fl][:, :, None]
            cvs = sum(cv * rcor[r] for r in range(nr))
            vals = jnp.concatenate(
                [vals_lines[:, 1:-1].reshape(-1, k4), cvs], axis=0)
            if overlap and fuse_ext:
                # compact [ntb*Mc, k4] per-face value block for the patch
                vd_parts.append(jnp.zeros(
                    (len(tiles) * Mc, k4), s1.dtype).at[di_j].set(
                        vals, unique_indices=True))
            else:
                # gather into vd-column order; transposed once below
                vd_parts.append(vals)

        # 5. local sweeps + tile merge (compact re-expansion when fused).
        # With ``overlap`` the sweep runs MERGE-FREE (no dependence on
        # the all_gather above) and the fix tiles are patched in place —
        # XLA's async collectives hide the gather behind the sweep.
        if overlap and fuse_ext:
            w = dss_sweeps_pallas_nomerge(
                s1, rsp, ne, nf=1, faces=fps, interpret=interpret)
            vals3 = jnp.concatenate(vd_parts, axis=0).reshape(
                fps * len(tiles), Mc, k4)
            dm_t = jnp.asarray(np.tile(np.asarray(dense_mask), (1, fps)))
            assembled = merge_patch_tiles(
                w, vals3, jnp.asarray(qc), dm_t, gtiles_shard,
                len(tiles), Mc, interpret=interpret)
            return assembled, phi, a1, b1, c1
        # row-gather into vd-column order + transpose-place kernel (no
        # XLA transpose per face; kernels.dss_pallas.vals_to_vd_pallas)
        from ..kernels.dss_pallas import vals_to_vd_pallas

        di_np = ci_c if fuse_ext else dense_idx
        nv_ = di_np.shape[0]
        inv = np.full(vd_rows, nv_, np.int32)
        inv[di_np] = np.arange(nv_, dtype=np.int32)
        vals_all = jnp.stack(vd_parts)                   # [fps, nv, k4]
        vals_z = jnp.concatenate(
            [vals_all, jnp.zeros((fps, 1, k4), s1.dtype)], axis=1)
        vd = vals_to_vd_pallas(
            vals_z[:, jnp.asarray(inv)].reshape(fps * vd_rows, k4),
            interpret=interpret)                         # [k4, fps*vd_rows]
        if fuse_ext:
            assembled = dss_sweeps_pallas_ct(
                s1, rsp, vd, dm_j, jnp.asarray(qc), ne, tiles, nf=1,
                m_rows=Mc, faces=fps, interpret=interpret)
        else:
            assembled = dss_sweeps_pallas_t(
                s1, rsp, vd, dm_j, ne, tiles, nf=1, faces=fps,
                interpret=interpret)
        return assembled, phi, a1, b1, c1

    spec_l = P(None, "e")
    rep = P(None, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, spec_l,
                  spec_l, spec_l, spec_l, spec_l, spec_l, spec_l, spec_l,
                  spec_l),
        out_specs=(spec_l, spec_l, spec_l, spec_l, spec_l),
        # pallas_call outputs carry no varying-mesh-axis metadata
        check_vma=False,
    )
    return fn(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
              s0, sm1, qdp, pecnd, vn0u, vn0v, omg, rsp_lanes)


def shard_packed_t4(mesh: Mesh, *arrays):
    """Place [*, E16] packed arrays with their lane axis sharded over the
    face mesh (replicates scalars/square operators untouched)."""
    sh = NamedSharding(mesh, P(None, "e"))
    return tuple(jax.device_put(a, sh) for a in arrays)
