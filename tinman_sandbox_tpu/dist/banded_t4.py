"""Band-sharded packed assembled step: the general multi-chip fast path.

`dist/sharded_t4.py` shards the packed lane axis by whole cube faces
(N | 6). This module generalizes to N = 6m/cps shards by splitting each
face into ``m`` element-row BANDS (ej ranges) and giving every shard
``cps`` consecutive band chunks. Per chunk:

* the fused CAAR kernel is local (element blocks never span chunks);
* the in-face alpha sweep is local (partners live in the same ej row);
* the beta partners of a chunk's first/last ej row live one row over —
  the chunk is extended with its two RAW neighbor rows (one ppermute in
  each direction for the shard-boundary rows, local slices otherwise) in
  the cyclic layout [band | next | prev], so the banded sweep kernel's
  rolls wrap into the correct halo row with no special cases;
* the cube-edge/corner fixup gathers only the compact face-side line
  SEGMENTS (all_gather, O(ne*NP*4*nlev) per chunk) and reassembles full
  lines; the band-position-dependent value selection is an affine index
  (A_variant + b*B_variant) into a per-face value table, so one program
  serves every shard.

Cross-chip traffic per step: two single-row ppermutes + one compact-line
all_gather — the perimeter-minimal exchange of HOMME's edge-buffer
pack/exchange (fortran/element_mod.F90:234-236) for arbitrary 6m/cps-way
decompositions.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import NP, NPSQ
from .structured_dss import _SIDES, _side_line_idx

__all__ = ["caar_dss_banded_t4", "dss_banded_t", "banded_vmem_report",
           "pick_lg"]


def banded_vmem_report(ne: int, m: int, N: int, nlev: int,
                       qsize: int = 1, block_k: int = 16) -> dict:
    """Static VMEM accounting for a band-sharded decomposition at scale
    (ROADMAP: ne120-class shards cannot be measured without a pod slice,
    so the fit is proven arithmetically from the sweep kernel's own block
    model — `kernels.dss_pallas.fit_block_k`).

    Checks every stacked row count the prim cadence pushes through the
    banded sweep (dynamics 4*nlev, hyperviscosity 3*nlev, tracers
    qsize*nlev) and returns the worst case. Raises on an inadmissible
    decomposition (N does not divide 6m, multi-chunk shards without
    128-aligned band lanes, m does not divide ne)."""
    from ..kernels.dss_pallas import (
        SWEEP_VMEM_CAP, fit_block_k, sweep_vmem_bytes,
    )

    assert ne % m == 0 and m >= 2, (ne, m)
    assert (6 * m) % N == 0, (m, N)
    cps = 6 * m // N
    rl = ne * NPSQ
    br = ne // m
    bl = br * rl
    ext = bl + 2 * rl
    assert bl % 128 == 0 or cps == 1, \
        f"multi-chunk shards need 128 | band lanes (bl={bl})"
    rows = {"dynamics": 4 * nlev, "hypervis": 3 * nlev,
            "tracers": max(qsize, 1) * nlev}
    # lane-grouped producer shapes (round-5 port of the r4 single-chip
    # win): the per-shard lg kernel block is [k, 128*lg]; ~4.5 live f32
    # buffers must fit the 16 MB scoped cap (the measured single-chip
    # guard, commit a0100d1 — tall stacked-tracer k shrinks lg)
    nblocks = cps * bl // 128
    scoped = 16 * 2 ** 20
    per = {}
    worst = 0
    for name, k in rows.items():
        bk = fit_block_k(k, ext, block_k)
        b = sweep_vmem_bytes(bk, ext)
        cap = 8
        while cap > 1 and 4.5 * k * 128 * cap * 4 > scoped:
            cap -= 1
        lg = pick_lg(nblocks, cap) or 1
        per[name] = {"k": k, "bk": bk, "vmem_bytes": b, "lg": lg,
                     "lg_vmem_bytes": int(4.5 * k * 128 * max(lg, 1) * 4)}
        assert per[name]["lg_vmem_bytes"] <= scoped
        worst = max(worst, b)
    return dict(ne=ne, m=m, N=N, cps=cps, br=br, bl=bl, ext=ext,
                lanes_per_shard=cps * bl,
                elems_per_shard=cps * bl // NPSQ,
                nblocks_per_shard=nblocks,
                per_stage=per, worst_vmem_bytes=worst,
                cap_bytes=SWEEP_VMEM_CAP,
                fits=bool(worst <= SWEEP_VMEM_CAP))


@lru_cache(maxsize=None)
def _banded_tables(plan, m: int):
    """Static tables for m bands per face (band height br = ne/m rows)."""
    ne = plan.ne
    assert ne % m == 0 and m >= 2, (ne, m)
    nl = ne * NP
    rl = ne * NPSQ                     # lanes per element row
    br = ne // m                       # element rows per band
    bl = br * rl                       # lanes per band chunk
    fl = ne * rl

    rows = np.arange(br)
    W = (rows[:, None] * rl + np.arange(NP)[None, :]).reshape(-1)
    E = (rows[:, None] * rl + (ne - 1) * NPSQ + (NP - 1) * NP
         + np.arange(NP)[None, :]).reshape(-1)
    S = (np.arange(ne)[:, None] * NPSQ
         + np.arange(NP)[None, :] * NP).reshape(-1)
    Nn = ((br - 1) * rl + np.arange(ne)[:, None] * NPSQ
          + np.arange(NP)[None, :] * NP + (NP - 1)).reshape(-1)
    sides_loc = {"W": W, "E": E, "S": S, "N": Nn}
    pattern = np.unique(np.concatenate([W, E, S, Nn]))
    npat = len(pattern)

    tiles = np.unique(pattern // 128)
    tile_pos = {int(t): i for i, t in enumerate(tiles)}
    wd = len(tiles) * 128
    dp = lambda l: tile_pos[int(l) // 128] * 128 + int(l) % 128
    dense_pat = np.asarray([dp(l) for l in pattern], np.int32)

    # xd_t rows of the side lanes, in line-t order
    row_of = {s: np.asarray([dp(l) for l in sides_loc[s]], np.int32)
              for s in _SIDES}

    # COMPACT fix-lane tables (the banded port of kernels/dss_pallas.py::
    # _compact_arrays): each affected tile stores only its Mc fix lanes —
    # the union pattern (W|E|S|N) is band-position-independent, so one Q
    # selection matrix serves every chunk variant; the variant masks (dmv)
    # still gate which lanes actually merge.
    by_tile = {}
    for l in pattern:
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
    rowc_of = {s_: np.asarray([cpos[int(l)] for l in sides_loc[s_]],
                              np.int32) for s_ in _SIDES}
    cpat = np.asarray([cpos[int(l)] for l in pattern], np.int32)
    wr = -(-ntb * Mc // 128) * 128

    # per-variant (first,last) affine value-table indices: idx = A + b*B
    # into vt = [vals4 (4*nl) | cv4 (SW,SE,NW,NE) | zero] rows
    zrow = 4 * nl + 4

    def classify(b, first, last):
        segT = br * NP
        a = np.full(npat, zrow, np.int64)
        Wset = {int(l): t for t, l in enumerate(W)}
        Eset = {int(l): t for t, l in enumerate(E)}
        Sset = {int(l): t for t, l in enumerate(S)}
        Nset = {int(l): t for t, l in enumerate(Nn)}
        for i, l in enumerate(pattern):
            l = int(l)
            if first and l == W[0]:
                a[i] = 4 * nl + 0                       # SW cube corner
            elif first and l == E[0]:
                a[i] = 4 * nl + 1                       # SE
            elif last and l == W[-1]:
                a[i] = 4 * nl + 2                       # NW
            elif last and l == E[-1]:
                a[i] = 4 * nl + 3                       # NE
            elif l in Wset:
                a[i] = 0 * nl + b * segT + Wset[l]
            elif l in Eset:
                a[i] = 1 * nl + b * segT + Eset[l]
            elif l in Sset and first:
                a[i] = 2 * nl + Sset[l]
            elif l in Nset and last:
                a[i] = 3 * nl + Nset[l]
        return a

    segT = br * NP
    variants = {}
    for first, last, b_rep in ((True, False, 0), (False, True, m - 1),
                               (False, False, 1)):
        a_at = classify(b_rep, first, last)
        bvec = np.where(
            (a_at < 2 * nl)                     # W/E line entries slide
            & ~((a_at >= 4 * nl)), segT, 0).astype(np.int64)
        variants[(first, last)] = (
            (a_at - b_rep * bvec).astype(np.int32), bvec.astype(np.int32))

    # per-variant merge masks over the dense pattern
    def dmv(first, last):
        act = np.zeros((1, wd), np.float32)
        on = set(map(int, W)) | set(map(int, E))
        if first:
            on |= set(map(int, S))
        if last:
            on |= set(map(int, Nn))
        for l in on:
            act[0, dp(l)] = 1.0
        return act

    # per-variant sweep masks on the extended chunk [band | next | prev]
    ext = bl + 2 * rl

    def maskv(first, last):
        lane = np.arange(ext)
        i = (lane // NP) % NP
        j = lane % NP
        ei = (lane // NPSQ) % ne
        lrow = lane // rl                       # 0..br-1 band, br/br+1 halo
        in_band = lrow < br
        ahi = (i == NP - 1) & (ei < ne - 1)
        alo = (i == 0) & (ei > 0)
        bhi = (j == NP - 1) & in_band & ~((lrow == br - 1) & last)
        blo = (j == 0) & in_band & ~((lrow == 0) & first)
        return np.stack([ahi, alo, bhi, blo]).astype(jnp.bfloat16)

    # global cube-corner machinery (reused from the face-sharded path)
    ends_global = {}
    for f in range(6):
        for si, s in enumerate(_SIDES):
            gl = _side_line_idx(ne, f, s)
            ends_global[int(gl[0])] = (f, si, 0)
            ends_global[int(gl[-1])] = (f, si, 1)
    corner_rows = np.asarray(plan.corner_rows, np.int32)
    corner_slot = np.asarray(
        [[ends_global[int(r)][0] * 8 + ends_global[int(r)][1] * 2
          + ends_global[int(r)][2] for r in row] for row in corner_rows],
        np.int32)
    # face f's cube-corner ids in (SW, SE, NW, NE) order
    lane_of = {
        0: lambda f: f * fl,
        1: lambda f: f * fl + (ne - 1) * NPSQ + (NP - 1) * NP,
        2: lambda f: f * fl + (ne - 1) * rl + (NP - 1),
        3: lambda f: f * fl + (ne - 1) * rl + (ne - 1) * NPSQ
        + (NP - 1) * NP + (NP - 1),
    }
    cid_by_lane = {}
    for c, row in enumerate(corner_rows):
        for r in row:
            cid_by_lane[int(r)] = c
    cid4 = np.asarray([[cid_by_lane[lane_of[p](f)] for p in range(4)]
                       for f in range(6)], np.int32)

    # cross-face pairing
    partner = np.zeros((6, 4, 2), np.int32)
    flip_tab = np.zeros((6, 4), np.float32)
    for fa, sa, fb, sb, fl_ in plan.edges:
        ia, ib = _SIDES.index(sa), _SIDES.index(sb)
        partner[fa, ia] = (fb, ib)
        partner[fb, ib] = (fa, ia)
        flip_tab[fa, ia] = flip_tab[fb, ib] = float(fl_)

    return dict(ne=ne, nl=nl, rl=rl, br=br, bl=bl, fl=fl, ext=ext,
                pattern=pattern, dense_pat=dense_pat,
                tiles=tuple(int(t) for t in tiles), wd=wd, row_of=row_of,
                variants=variants, dmv=dmv, maskv=maskv,
                corner_slot=corner_slot, cid4=cid4, partner=partner,
                flip_tab=flip_tab,
                Mc=Mc, qc=qc.astype(jnp.bfloat16), rowc_of=rowc_of,
                cpat=cpat, wr=wr)


def pick_lg(nblocks: int, cap: int = 8) -> int:
    """Per-shard lane-group width (0 when no width divides): the
    size-aware preference from the round-5 sweep (fastpath.auto_lg),
    clamped to ``cap`` (the tall-stack VMEM guard)."""
    from ..fastpath import auto_lg

    lg = auto_lg(nblocks)
    if lg and lg <= cap:
        return lg
    return next((g for g in range(cap, 1, -1) if nblocks % g == 0), 0)


@lru_cache(maxsize=None)
def _banded_dss_builder(plan, m: int, N: int, interpret: bool,
                        compact: bool = False, lg: int = 0,
                        overlap: bool = False):
    """Build the per-shard banded-DSS closure + its chunk-order static
    operands (dm, masks). The closure runs INSIDE shard_map and performs:
    halo-row ppermute -> [band|next|prev] extension -> compact line
    all_gather -> affine fixup -> banded sweep kernel.

    With ``compact`` the closure consumes the COMPACT fix-lane slab
    ([nt_shard*Mc, k], producer-fused via the returned ext tables —
    REQUIRED, there is no unfused compact extract) and the sweep
    re-expands each affected tile with an exact placement dot
    (`dss_sweeps_banded_ct`); the 5th return is then the producer-side
    table dict {sf, nt (dense) | nslots (lg), cM, cq} for the fused
    kernels' cext operands. ``lg`` > 1 lays the slab out for a
    LANE-GROUPED producer (lg 128-lane groups per grid step, the round-4
    single-chip win ported per shard): the super-block slot tables come
    from `cext_tables_lg_for_gtiles` and only the fixup's slab-row maps
    change — the vals buffer / sweep / placement tables are untouched.
    Requires lg | (shard 128-lane block count).

    ``overlap`` (requires compact) splits the closing pass into a
    merge-free sweep (NO dependence on the cross-chip line collectives)
    plus an in-place fix-tile patch that consumes them — the
    compute/communication-overlap decomposition SCALING_MODEL.md claim 2
    names as the N=64 weak-scaling requirement: XLA's async collectives
    start the W/E all_gathers and S/N psum as soon as the producer slab
    exists and hide them behind the sweep pass."""
    from ..kernels.dss_pallas import (
        cext_tables_lg_for_gtiles, dss_sweeps_banded_ct,
        dss_sweeps_banded_nomerge, dss_sweeps_banded_t, extract_tiles_t,
        merge_patch_tiles, slot_arrays_for_gtiles,
    )

    T = _banded_tables(plan, m)
    ne, nl, rl, br, bl, ext = (T["ne"], T["nl"], T["rl"], T["br"], T["bl"],
                               T["ext"])
    tiles, wd = T["tiles"], T["wd"]
    assert (6 * m) % N == 0, (m, N)
    cps = 6 * m // N
    assert bl % 128 == 0 or cps == 1, \
        f"multi-chunk shards need 128 | band lanes (bl={bl})"
    assert lg <= 1 or compact, "lane-grouped slabs require the compact path"
    assert not overlap or compact, "overlap requires the compact path"

    # chunk-order global operands for the per-chunk static data
    chunk_first = [(c % m) == 0 for c in range(6 * m)]
    chunk_last = [(c % m) == m - 1 for c in range(6 * m)]
    # NUMPY constants only: this builder is lru-cached, and jnp arrays
    # created inside one jit trace leak as tracers into later traces
    dm_g = np.concatenate(
        [T["dmv"](chunk_first[c], chunk_last[c]) for c in range(6 * m)],
        axis=1)
    masks_g = np.concatenate(
        [T["maskv"](chunk_first[c], chunk_last[c]) for c in range(6 * m)],
        axis=1)

    gtiles_shard = tuple(l * (bl // 128) + t
                         for l in range(cps) for t in tiles) \
        if cps > 1 else tiles

    Mc, wr = T["Mc"], T["wr"]
    ntb = len(tiles)
    srows_chunk = ntb * Mc                   # compact slab rows per chunk
    nblocks_shard = cps * bl // 128
    perm = None
    cext = None
    if compact:
        q_dense = np.tile(np.asarray(T["qc"]), (cps, 1))
        if lg > 1:
            sf_np, nslots, cq_np, perm = cext_tables_lg_for_gtiles(
                gtiles_shard, nblocks_shard, lg, Mc, q_dense)
            cext = dict(sf=sf_np, nslots=nslots, cM=Mc, cq=cq_np, lg=lg)
        else:
            sf_np, nt = slot_arrays_for_gtiles(gtiles_shard, nblocks_shard)
            cext = dict(sf=sf_np, nt=nt, cM=Mc, cq=q_dense, lg=0)

    var = T["variants"]
    A_f, B_f = var[(True, False)]
    A_l, B_l = var[(False, True)]
    A_m, B_m = var[(False, False)]
    dense_pat = T["cpat"] if compact else T["dense_pat"]
    pattern_j = T["pattern"]
    row_src = T["rowc_of"] if compact else T["row_of"]
    slab_w = srows_chunk if compact else wd
    # per-chunk slab-row maps: chunk-major strides on the dense slab; the
    # lane-grouped slab only permutes the rows (super-block slot layout)
    remap = (lambda r: perm[r]) if perm is not None else (lambda r: r)
    rowW_l, rowE_l, rowS_l, rowN_l = (
        np.stack([remap(row_src[s] + l * slab_w) for l in range(cps)])
        for s in ("W", "E", "S", "N"))
    vd_rows = wr if compact else wd
    cslot_j = T["corner_slot"].reshape(-1)
    cid4_j = T["cid4"]
    partner_j = T["partner"]
    flip_j = T["flip_tab"]

    t = np.arange(nl)
    mj_hi = ((t % NP == NP - 1) & (t < nl - 1)).astype(
        np.float32)[None, None, :, None]
    mj_lo = ((t % NP == 0) & (t > 0)).astype(
        np.float32)[None, None, :, None]

    # static ppermute pairs for the shard-boundary halo rows
    send_fwd = [(s, s + 1) for s in range(N - 1)
                if ((s * cps + cps - 1) % m) != m - 1]
    send_bwd = [(s, s - 1) for s in range(1, N)
                if ((s * cps) % m) != 0]

    def dss_local(s1, rsp, dm_l, masks_l, xd_t=None, mix=None):
        shard = jax.lax.axis_index("e")
        k4 = s1.shape[0]
        # tables indexed by TRACED chunk ids need jnp form; converting here
        # (per trace) keeps the lru-cached builder free of trace-bound
        # arrays
        partner_t = jnp.asarray(partner_j)
        flip_t = jnp.asarray(flip_j)
        cid4_t = jnp.asarray(cid4_j)

        # halo rows: [band | next | prev] per chunk
        first_rows = [s1[:, l * bl:l * bl + rl] for l in range(cps)]
        last_rows = [s1[:, (l + 1) * bl - rl:(l + 1) * bl]
                     for l in range(cps)]
        prev0 = jax.lax.ppermute(last_rows[-1], "e", send_fwd)
        nextL = jax.lax.ppermute(first_rows[0], "e", send_bwd)
        pieces = []
        for l in range(cps):
            nxt = first_rows[l + 1] if l < cps - 1 else nextL
            prv = last_rows[l - 1] if l > 0 else prev0
            pieces += [s1[:, l * bl:(l + 1) * bl], nxt, prv]
        x_ext = jnp.concatenate(pieces, axis=1)

        # compact line segments -> all_gather -> full lines (the slab may
        # arrive producer-fused from the CAAR kernel's extra output)
        if xd_t is None:
            assert not compact, \
                "the compact banded path requires a producer-fused slab"
            xd_t = extract_tiles_t(s1, gtiles_shard, interpret=interpret)
        ws = jnp.stack([xd_t[rowW_l[l]] for l in range(cps)])
        es = jnp.stack([xd_t[rowE_l[l]] for l in range(cps)])
        ws_g = jax.lax.all_gather(ws, "e").reshape(6, m * br * NP, k4)
        es_g = jax.lax.all_gather(es, "e").reshape(6, m * br * NP, k4)
        # S/N face lines: only band 0's S rows and band m-1's N rows are
        # ever read, so an all_gather of every band's rows over-receives
        # by a factor m — at N=64/m=32 that term alone (~1.1 GB/shard/step
        # at ne120 q1) would exceed the shard's compute (SCALING_MODEL.md).
        # Instead each shard scatters its (at most cps) contributing rows
        # into a zero [6, 2, nl, k4] buffer and ONE psum assembles them:
        # volume is m-independent and matches the W/E gathers.
        sn_buf = jnp.zeros((6, 2, nl, k4), s1.dtype)
        for l in range(cps):
            c = shard * cps + l
            f, b = c // m, c % m
            s_rows = jnp.where(b == 0, xd_t[rowS_l[l]], 0.0)
            n_rows = jnp.where(b == m - 1, xd_t[rowN_l[l]], 0.0)
            sn_buf = sn_buf.at[f].add(jnp.stack([s_rows, n_rows]))
        sn_g = jax.lax.psum(sn_buf, "e")                    # [6, 2, nl, k4]
        all_lines = jnp.stack(
            [ws_g, es_g, sn_g[:, 0], sn_g[:, 1]], axis=1)

        zl = (all_lines + mj_hi * jnp.roll(all_lines, -1, axis=2)
                        + mj_lo * jnp.roll(all_lines, 1, axis=2))
        ends = all_lines[:, :, (0, nl - 1)].reshape(6 * 4 * 2, k4)
        cv_all = ends[cslot_j].reshape(8, 3, k4).sum(axis=1)

        scaled_parts = []
        for l in range(cps):
            c = shard * cps + l
            f, b = c // m, c % m
            own = jax.lax.dynamic_index_in_dim(zl, f, 0, False)
            par = zl[partner_t[f, :, 0], partner_t[f, :, 1]]
            fl_f = flip_t[f][:, None, None]
            par = fl_f * jnp.flip(par, axis=1) + (1.0 - fl_f) * par
            vals4 = own + par                               # [4, nl, k4]
            cv4 = cv_all[cid4_t[f]]                         # [4, k4]
            vt = jnp.concatenate(
                [vals4.reshape(4 * nl, k4), cv4,
                 jnp.zeros((1, k4), s1.dtype)], axis=0)
            first = (b == 0)
            last = (b == m - 1)
            A = jnp.where(first, A_f, jnp.where(last, A_l, A_m))
            B = jnp.where(first, B_f, jnp.where(last, B_l, B_m))
            vals_pat = vt[A + b * B]                        # [npat, k4]
            # two-float-aware rsp scaling (kernels.dss_pallas._rsp_mul)
            rpat = rsp[:, pattern_j + l * bl][:, :, None]
            scaled_parts.append(
                sum(vals_pat * rpat[r] for r in range(rsp.shape[0])))

        if overlap:
            # compute/communication overlap: the merge-free sweep depends
            # only on shard-local data (x_ext via the single-row halo
            # ppermute), so the W/E gathers + S/N psum feeding vals3 run
            # in its shadow; the fix tiles are then patched in place
            rows_all = np.concatenate(
                [dense_pat + l * srows_chunk for l in range(cps)])
            vals_c = jnp.zeros((cps * srows_chunk, k4), s1.dtype).at[
                rows_all].set(jnp.concatenate(scaled_parts, axis=0),
                              unique_indices=True)
            w = dss_sweeps_banded_nomerge(
                x_ext, rsp, masks_l, nchunks=cps, bl=bl, rl=rl,
                mix=mix, interpret=interpret)
            ntb_ = len(tiles)
            pmix = None if mix is None else (mix[0], mix[1], mix[2])
            return merge_patch_tiles(
                w, vals_c.reshape(cps * ntb_, Mc, k4),
                jnp.asarray(np.asarray(T["qc"])), dm_l,
                gtiles_shard, ntb_, Mc, mix=pmix, interpret=interpret)

        # row-gather into vd-column order + transpose-place kernel (no
        # XLA transpose per chunk; kernels.dss_pallas.vals_to_vd_pallas)
        from ..kernels.dss_pallas import vals_to_vd_pallas

        npat_ = dense_pat.shape[0]
        inv = np.full(vd_rows, npat_, np.int32)
        inv[dense_pat] = np.arange(npat_, dtype=np.int32)
        vals_all = jnp.stack(scaled_parts)               # [cps, npat, k4]
        vals_z = jnp.concatenate(
            [vals_all, jnp.zeros((cps, 1, k4), s1.dtype)], axis=1)
        vd = vals_to_vd_pallas(
            vals_z[:, jnp.asarray(inv)].reshape(cps * vd_rows, k4),
            interpret=interpret)                         # [k4, cps*vd_rows]

        if compact:
            # placement table: the DENSE per-chunk selection rows (the
            # sweep's tile re-expansion is slab-layout independent)
            return dss_sweeps_banded_ct(
                x_ext, rsp, vd, jnp.asarray(np.asarray(T["qc"])), dm_l,
                masks_l, tiles, nchunks=cps, bl=bl, rl=rl, m_rows=Mc,
                mix=mix, interpret=interpret)
        return dss_sweeps_banded_t(
            x_ext, rsp, vd, dm_l, masks_l, tiles, nchunks=cps, bl=bl,
            rl=rl, mix=mix, interpret=interpret)

    return dss_local, dm_g, masks_g, gtiles_shard, cext


_SPEC_L = P(None, "e")
_REP = P(None, None)


def _resolve_lg(lg: int, fuse: bool, local_lanes: int,
                site: str | None = None) -> int:
    """Per-shard lane-group width: 0/1 disables; ``lg=0`` auto-picks the
    largest admissible width <= 8 on the fused path (the round-4
    single-chip default, ported per shard). Explicit lg > 1 requires
    admissibility (asserted). Records the decision in fastpath.last_path
    under ``site`` (bench/dryrun visibility)."""
    nblocks = local_lanes // 128
    if not fuse:
        return 0
    if lg == 0:
        lg = pick_lg(nblocks)
    elif lg > 1:
        assert nblocks % lg == 0, (nblocks, lg)
    if lg > 1 and site is not None:
        from ..fastpath import last_path

        last_path[site] = f"fused-lg{lg}-compact"
    return lg


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "eb", "nlev",
                                   "moist", "lg", "overlap", "interpret"))
def caar_dss_banded_t4(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                       s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                       plan, rsp_lanes, mesh: Mesh, m: int,
                       eb: int, nlev: int, moist: bool = True,
                       lg: int = 0, overlap: bool = False,
                       interpret: bool = False):
    """Band-sharded assembled leapfrog step over ``mesh`` axis "e" with
    N | 6m shards (cps = 6m/N band chunks each; chunk = ne/m element
    rows). Same contract as caar_dss_structured_packed_t4. ``lg=0``
    auto-picks the per-shard lane-group width on the fused path (the
    round-4 grid-overhead fix: lg independent 128-lane groups per grid
    step, bitwise-equal to the eb=8 kernel); ``lg=1`` disables."""
    from ..kernels.caar_pallas_t import (
        caar_pallas_packed_t4, caar_pallas_packed_t4_ext,
        caar_pallas_packed_t4_lg,
    )

    N = mesh.shape["e"]

    # producer-fused tile extraction when the shard's lane axis is 128-
    # aligned and the kernel runs 128-lane blocks (elem_block == 8);
    # fused implies the COMPACT fix-lane slab (round-3 port)
    from ..fastpath import fused_admissible

    local_lanes = s0.shape[1] // N
    fuse_ext = fused_admissible(eb, local_lanes, "caar_dss_banded_t4")
    lg = _resolve_lg(lg, fuse_ext, local_lanes, "caar_dss_banded_t4")
    dss_local, dm_g, masks_g, gtiles_shard, cext = _banded_dss_builder(
        plan, m, N, interpret, compact=fuse_ext, lg=lg,
        overlap=overlap and fuse_ext)

    def body(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
             s0, sm1, qdp, pecnd, vn0u, vn0v, omg, rsp, dm_l, masks_l):
        if fuse_ext and lg > 1:
            s1, phi, a1, b1, c1, xd_t = caar_pallas_packed_t4_lg(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                nlev=nlev, moist=moist, lg=lg,
                sf=jnp.asarray(cext["sf"]), cq=jnp.asarray(cext["cq"]),
                nslots=cext["nslots"], cM=cext["cM"], interpret=interpret)
        elif fuse_ext:
            s1, phi, a1, b1, c1, xd_t = caar_pallas_packed_t4_ext(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                jnp.asarray(cext["sf"]),
                nt=cext["nt"], nlev=nlev, moist=moist,
                cq=jnp.asarray(cext["cq"]), cM=cext["cM"],
                interpret=interpret)
        else:
            s1, phi, a1, b1, c1 = caar_pallas_packed_t4(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta,
                s0, sm1, qdp, pecnd, vn0u, vn0v, omg,
                eb=eb, nlev=nlev, moist=moist, interpret=interpret)
            xd_t = None
        return dss_local(s1, rsp, dm_l, masks_l, xd_t), phi, a1, b1, c1

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(_REP, _REP, _REP, _REP, _REP, _REP, _SPEC_L,
                  _SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L,
                  _SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L),
        out_specs=(_SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L),
        check_vma=False,
    )
    return fn(scal, dxbt, dybt, ainct, astrt, bstrt, meta,
              s0, sm1, qdp, pecnd, vn0u, vn0v, omg, rsp_lanes,
              dm_g, masks_g)


@partial(jax.jit, static_argnames=("plan", "mesh", "m", "interpret"))
def dss_banded_t(x, plan, rsp_lanes, mesh: Mesh, m: int,
                 interpret: bool = False):
    """rspheremp * DSS(x) on a band-sharded [k, E16] field — the
    standalone sharded assembly used by the sharded hyperviscosity and
    tracer paths. Drop-in (sharded) for dss_structured_t_pallas."""
    dss_local, dm_g, masks_g, _, _ = _banded_dss_builder(
        plan, m, mesh.shape["e"], interpret)
    fn = shard_map(
        lambda x, rsp, dm_l, masks_l: dss_local(x, rsp, dm_l, masks_l),
        mesh=mesh,
        in_specs=(_SPEC_L, _SPEC_L, _SPEC_L, _SPEC_L),
        out_specs=_SPEC_L,
        check_vma=False,
    )
    return fn(x, rsp_lanes, dm_g, masks_g)
