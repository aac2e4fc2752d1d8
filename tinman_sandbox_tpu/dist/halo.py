"""Explicit-collective DSS: shard_map + single aggregated exchange.

A middle tier between the SPMD segment-sum (dist/dss.py) and the
neighbor-wise ppermute exchange (dist/halo_ppermute.py): each device
assembles its OWN elements' shared dofs locally, then the dofs whose
aliases span shards — the GLOBAL partition perimeter — are summed in ONE
`psum`. Interior and locally-shared dofs never leave the chip, so the
buffer is perimeter-sized (~O(sqrt(elements/shard)) per element row); note
the psum is an ALL-REDUCE of that whole global-perimeter buffer, i.e.
every device receives every perimeter dof, not just its neighbors' — the
volume-optimal per-neighbor exchange is the ppermute tier. This tier
trades that extra volume for a single dense collective (often the faster
choice at small shard counts on ICI).

Host-side planning (`make_dss_plan`) runs once per mesh; the device body is
a fixed-shape shard_map program (per-shard index tables are padded to the
max across shards and passed as sharded operands).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import NPSQ

__all__ = ["DssPlan", "make_dss_plan", "dss_sum_halo", "dss_scaled_halo"]


@dataclasses.dataclass(frozen=True)
class DssPlan:
    """Per-mesh DSS exchange plan (host-precomputed, device-resident)."""

    ndev: int
    nelem: int
    n_local_max: int      # max local assembled dofs per shard (+1 dummy row)
    n_gshared: int        # dofs whose aliases span shards (+1 dummy row)
    local_sid: Any        # [ndev, eloc*16] i32: slot -> local dof id
    shared_local: Any     # [ndev, Lmax] i32: local dof id of shared dofs (pad=n_local_max)
    shared_global: Any    # [ndev, Lmax] i32: global shared index (pad=n_gshared)

    @property
    def perimeter_fraction(self) -> float:
        """Communicated dofs / total dofs — the halo-volume figure."""
        return self.n_gshared / (self.nelem * NPSQ)


def make_dss_plan(gdof: np.ndarray, ndev: int) -> DssPlan:
    """Plan the exchange for ``gdof`` [nelem, np, np] split into ``ndev``
    contiguous element shards."""
    nelem = gdof.shape[0]
    assert nelem % ndev == 0, (nelem, ndev)
    eloc = nelem // ndev
    flat = np.asarray(gdof).reshape(ndev, eloc * NPSQ)

    uniqs, sids = [], []
    for d in range(ndev):
        uniq, sid = np.unique(flat[d], return_inverse=True)
        uniqs.append(uniq)
        sids.append(sid.astype(np.int32))
    n_local_max = max(len(u) for u in uniqs)

    # dofs appearing in more than one shard
    shard_count = np.zeros(int(np.asarray(gdof).max()) + 1, np.int32)
    for u in uniqs:
        shard_count[u] += 1
    gshared = np.flatnonzero(shard_count > 1)
    gs_index = np.full(shard_count.size, -1, np.int64)
    gs_index[gshared] = np.arange(gshared.size)
    n_gshared = int(gshared.size)

    lmax = max(
        int(np.sum(gs_index[u] >= 0)) for u in uniqs
    ) if n_gshared else 1
    shared_local = np.full((ndev, lmax), n_local_max, np.int32)
    shared_global = np.full((ndev, lmax), n_gshared, np.int32)
    for d, u in enumerate(uniqs):
        mask = gs_index[u] >= 0
        ids = np.flatnonzero(mask)
        shared_local[d, : ids.size] = ids
        shared_global[d, : ids.size] = gs_index[u[mask]]

    return DssPlan(
        ndev=ndev,
        nelem=nelem,
        n_local_max=n_local_max,
        n_gshared=n_gshared,
        local_sid=np.stack(sids),
        shared_local=shared_local,
        shared_global=shared_global,
    )


def dss_sum_halo(x, plan: DssPlan, mesh: Mesh, axis: str = "e"):
    """dist.dss.dss_sum with explicit local-assembly + one psum exchange.

    x: [nelem, ..., np, np] sharded (or shardable) on the element axis.
    """
    mid = x.shape[1:-2]
    nmid = int(np.prod(mid)) if mid else 1
    nlm, ngs = plan.n_local_max, plan.n_gshared

    def body(x_loc, sid, sl, sg):
        sid, sl, sg = sid[0], sl[0], sg[0]
        eloc = x_loc.shape[0]
        cols = jnp.moveaxis(
            x_loc.reshape(eloc, nmid, NPSQ), 1, 2
        ).reshape(eloc * NPSQ, nmid)
        local = jax.ops.segment_sum(cols, sid, num_segments=nlm + 1)
        buf = jnp.zeros((ngs + 1, nmid), x_loc.dtype).at[sg].add(local[sl])
        buf = jax.lax.psum(buf, axis)
        fixed = local.at[sl].set(buf[sg])
        out = fixed[sid].reshape(eloc, NPSQ, nmid)
        return jnp.moveaxis(out, 1, 2).reshape(x_loc.shape)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(
        x,
        jnp.asarray(plan.local_sid),
        jnp.asarray(plan.shared_local),
        jnp.asarray(plan.shared_global),
    )


def dss_scaled_halo(x, plan: DssPlan, mesh: Mesh, rspheremp, axis: str = "e"):
    """rspheremp * halo-DSS(x) (assembly of a spheremp-weighted update)."""
    r = rspheremp
    while r.ndim < x.ndim:
        r = r[:, None]
    return r * dss_sum_halo(x, plan, mesh, axis)
