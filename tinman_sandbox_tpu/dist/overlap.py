"""Interior/boundary compute-communication overlap for the ppermute tier.

SURVEY §2.9/§5 (re: the stripped HOMME layer, element_mod.F90:234-236)
requires "overlap by splitting elements into interior ... and boundary sets
and dispatching interior RHS compute concurrently with the exchange". In the
XLA execution model that structure is expressed through dataflow: the
exchange collectives must depend ONLY on the boundary elements' RHS, so the
scheduler can hoist the interior RHS into the collectives' shadow
(async collective latency hiding). This module builds exactly that graph:

  1. CAAR on the boundary subset (elements owning any cross-shard dof);
  2. per-shard partial sums of the cross-shard dofs (boundary rows only —
     by definition no interior element touches a cross-shard dof) feed the
     ppermute exchange rounds;
  3. CAAR on the interior subset — no path to/from step 2;
  4. combine both subsets' np1, add the in-shard assembly and the received
     remote partials, scale by rspheremp.

Numerically identical (up to summation order) to dist.step.caar_dss_step.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import NPSQ, Config
from ..grid import Geometry, HybridVCoord
from ..kernels.caar_xla import caar_xla
from ..state import Derived, State
from .halo_ppermute import PpermutePlan
from .sharding import _ELEM_AXIS

__all__ = ["OverlapPlan", "make_overlap_plan", "caar_ppermute_overlap_step"]


@dataclasses.dataclass(frozen=True)
class OverlapPlan:
    nb_max: int           # padded boundary-element count per shard
    ni_max: int           # padded interior-element count per shard
    beid: Any             # [ndev, nb_max] local boundary element ids
    bw: Any               # [ndev, nb_max] 1.0 for real entries, 0.0 for pads
    ieid: Any             # [ndev, ni_max] local interior element ids
    iw: Any               # [ndev, ni_max]


def make_overlap_plan(gdof: np.ndarray, ndev: int) -> OverlapPlan:
    """Split each shard's local elements into boundary (own at least one
    cross-shard dof) and interior sets, padded to uniform SPMD shapes."""
    nelem = gdof.shape[0]
    assert nelem % ndev == 0
    eloc = nelem // ndev
    flat = np.asarray(gdof).reshape(ndev, eloc, NPSQ)

    dof_sets = [set(np.unique(flat[d]).tolist()) for d in range(ndev)]
    cross = [
        set().union(*(dof_sets[d] & dof_sets[e]
                      for e in range(ndev) if e != d)) or set()
        for d in range(ndev)
    ]
    b_lists, i_lists = [], []
    for d in range(ndev):
        isb = np.array([
            bool(set(flat[d, e].tolist()) & cross[d]) for e in range(eloc)
        ])
        b_lists.append(np.nonzero(isb)[0])
        i_lists.append(np.nonzero(~isb)[0])

    nb_max = max(1, max(len(b) for b in b_lists))
    ni_max = max(1, max(len(i) for i in i_lists))
    beid = np.zeros((ndev, nb_max), np.int32)
    bw = np.zeros((ndev, nb_max), np.float32)
    ieid = np.zeros((ndev, ni_max), np.int32)
    iw = np.zeros((ndev, ni_max), np.float32)
    for d in range(ndev):
        b, i = b_lists[d], i_lists[d]
        beid[d, : len(b)] = b
        bw[d, : len(b)] = 1.0
        ieid[d, : len(i)] = i
        iw[d, : len(i)] = 1.0
    return OverlapPlan(nb_max=nb_max, ni_max=ni_max, beid=beid, bw=bw,
                       ieid=ieid, iw=iw)


def _take_elems(tree, ids):
    """Gather an element subset from a State/Derived/Geometry pytree."""
    def take(path, x):
        name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
        ax = _ELEM_AXIS.get(name, 0)
        if ax is None:
            return x
        return jnp.take(jnp.asarray(x), ids, axis=ax)

    return jax.tree_util.tree_map_with_path(take, tree)


def caar_ppermute_overlap_step(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    plan: PpermutePlan,
    oplan: OverlapPlan,
    mesh: Mesh,
    cfg: Config,
    dt2,
    eta_ave_w,
    moist: bool = True,
    axis: str = "e",
):
    """caar_dss_step with the boundary-first / exchange / interior-overlap
    dataflow on the neighbor-wise ppermute tier."""
    np1 = cfg.np1
    nlm = plan.n_local_max
    perms = plan.perms
    nlev = cfg.nlev
    eloc = cfg.nelem // plan.ndev
    # local cfg for the shard-local subproblems (nelem is never read by
    # caar_xla beyond array shapes, but keep it honest)
    cfg_b = dataclasses.replace(cfg, nelem=oplan.nb_max)
    cfg_i = dataclasses.replace(cfg, nelem=oplan.ni_max)

    def body(st, dv, gm, sid, send_idx, beid, bw, ieid, iw):
        sid, send_idx = sid[0], send_idx[0]
        beid, bw, ieid, iw = beid[0], bw[0], ieid[0], iw[0]

        # -- 1. boundary CAAR ------------------------------------------------
        sb, db = caar_xla(_take_elems(st, beid), _take_elems(dv, beid),
                          _take_elems(gm, beid), hv, cfg_b, dt2, eta_ave_w,
                          moist=moist)
        bfields = jnp.stack([sb.u[np1], sb.v[np1], sb.t[np1], sb.dp3d[np1]])
        # [4, nb, nlev, np, np] -> dof-major cols [nb*16, 4*nlev]
        nb = oplan.nb_max
        bcols = jnp.moveaxis(bfields, 0, 1).reshape(nb, 4 * nlev, NPSQ)
        bcols = jnp.moveaxis(bcols, 1, 2).reshape(nb * NPSQ, 4 * nlev)
        bcols = bcols * jnp.repeat(bw, NPSQ)[:, None]      # mask pads
        sid_b = sid.reshape(eloc, NPSQ)[beid].reshape(-1)
        # local partials of every dof owned by boundary elements (cross-
        # shard dofs are a subset; slot nlm is the pad/dummy row)
        local_b = jax.ops.segment_sum(bcols, sid_b, num_segments=nlm + 1)

        # -- 2. exchange rounds (depend only on step 1) ----------------------
        me = jax.lax.axis_index(axis)
        remote = jnp.zeros_like(local_b)
        for m in range(plan.rounds):
            idx = send_idx[m]
            buf = local_b[idx]
            recv = jax.lax.ppermute(buf, axis, perms[m])
            partner = jnp.asarray([p[1] for p in perms[m]], jnp.int32)[me]
            recv = jnp.where(partner != me, recv, jnp.zeros_like(recv))
            remote = remote.at[idx].add(recv)

        # -- 3. interior CAAR (independent of step 2 -> overlappable) --------
        si, di = caar_xla(_take_elems(st, ieid), _take_elems(dv, ieid),
                          _take_elems(gm, ieid), hv, cfg_i, dt2, eta_ave_w,
                          moist=moist)

        # -- 4. combine + assemble ------------------------------------------
        def combine(xb, xi):
            out = jnp.zeros((eloc,) + xb.shape[1:], xb.dtype)
            return out.at[beid].set(xb).at[ieid].set(xi)

        ifields = jnp.stack([si.u[np1], si.v[np1], si.t[np1], si.dp3d[np1]])
        full = combine(jnp.moveaxis(bfields, 0, 1),
                       jnp.moveaxis(ifields, 0, 1))  # [eloc, 4, nlev, np, np]
        fcols = full.reshape(eloc, 4 * nlev, NPSQ)
        fcols = jnp.moveaxis(fcols, 1, 2).reshape(eloc * NPSQ, 4 * nlev)
        total = jax.ops.segment_sum(fcols, sid, num_segments=nlm + 1)
        total = total + remote
        out = total[sid].reshape(eloc, NPSQ, 4 * nlev)
        out = jnp.moveaxis(out, 1, 2).reshape(eloc, 4, nlev, NPSQ)
        rsp = gm.rspheremp.reshape(eloc, 1, 1, NPSQ)
        out = (out * rsp).reshape(eloc, 4, nlev, NPSQ // 4, 4)
        out = jnp.moveaxis(out, 1, 0)

        new_st = dataclasses.replace(
            st,
            u=st.u.at[np1].set(out[0].reshape(st.u.shape[1:])),
            v=st.v.at[np1].set(out[1].reshape(st.u.shape[1:])),
            t=st.t.at[np1].set(out[2].reshape(st.u.shape[1:])),
            dp3d=st.dp3d.at[np1].set(out[3].reshape(st.u.shape[1:])),
        )
        # derived updates are per-element (no assembly): combine subsets
        new_dv = jax.tree.map(
            lambda xb, xi, x0: jnp.zeros_like(x0).at[beid].set(xb)
                                                 .at[ieid].set(xi),
            db, di, dv,
        )
        return new_st, new_dv

    def spec_of(tree):
        def f(path, x):
            name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
            ax = _ELEM_AXIS.get(name, 0)
            if ax is None:
                return P()
            return P(*([None] * ax + [axis]))

        return jax.tree_util.tree_map_with_path(f, tree)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_of(state), spec_of(derived), spec_of(geom),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(spec_of(state), spec_of(derived)),
    )
    return fn(state, derived, geom,
              jnp.asarray(plan.local_sid), jnp.asarray(plan.send_idx),
              jnp.asarray(oplan.beid), jnp.asarray(oplan.bw),
              jnp.asarray(oplan.ieid), jnp.asarray(oplan.iw))
