"""Neighbor-wise halo exchange: DSS via `jax.lax.ppermute` rounds.

The BASELINE north-star formulation of the boundary exchange: instead of an
all-reduce of the whole partition perimeter (dist/halo.py's psum), each
shard exchanges partial sums only with the shards it actually borders, as
point-to-point collective-permutes riding ICI neighbor links.

Host-side planning: the shard-adjacency graph (pairs sharing dofs) is
edge-colored greedily (<= degree+1 colors), so each exchange round is a
perfect matching — a valid ppermute permutation (non-participants self-send
a dummy). For every pair, the shared dofs are ordered by global dof id on
both sides, so send and receive tables align positionally.

A dof spanning s shards receives partial sums from all s-1 peers (cube
corners span 3, in-face corners up to 4), so pairwise accumulation
reproduces the full assembly.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import NPSQ

__all__ = ["PpermutePlan", "make_ppermute_plan", "dss_sum_ppermute",
           "dss_scaled_ppermute"]


@dataclasses.dataclass(frozen=True)
class PpermutePlan:
    ndev: int
    nelem: int
    n_local_max: int
    rounds: int           # exchange rounds (graph edge colors)
    pair_len: int         # padded per-pair shared-dof count
    local_sid: Any        # [ndev, eloc*16] slot -> local dof id
    perms: Any            # tuple of `rounds` permutation lists [(src, dst)]
    send_idx: Any         # [ndev, rounds, pair_len] local dof ids (pad nlm)


def make_ppermute_plan(gdof: np.ndarray, ndev: int) -> PpermutePlan:
    nelem = gdof.shape[0]
    assert nelem % ndev == 0
    eloc = nelem // ndev
    flat = np.asarray(gdof).reshape(ndev, eloc * NPSQ)

    uniqs, sids = [], []
    for d in range(ndev):
        uniq, sid = np.unique(flat[d], return_inverse=True)
        uniqs.append(uniq)
        sids.append(sid.astype(np.int32))
    nlm = max(len(u) for u in uniqs)
    dof_sets = [set(u.tolist()) for u in uniqs]

    # shard adjacency + per-pair shared dofs (sorted by global id)
    pair_dofs = {}
    for d in range(ndev):
        for e in range(d + 1, ndev):
            shared = sorted(dof_sets[d] & dof_sets[e])
            if shared:
                pair_dofs[(d, e)] = shared

    # greedy edge coloring: each color class is a matching
    colors: list[list[tuple[int, int]]] = []
    for edge in sorted(pair_dofs, key=lambda p: -len(pair_dofs[p])):
        for cls in colors:
            if all(edge[0] not in p and edge[1] not in p for p in cls):
                cls.append(edge)
                break
        else:
            colors.append([edge])
    rounds = max(len(colors), 1)
    pair_len = max((len(v) for v in pair_dofs.values()), default=1)

    # permutation + aligned send/recv tables per round
    perms = []
    send_idx = np.full((ndev, rounds, pair_len), nlm, np.int32)
    for m in range(rounds):
        cls = colors[m] if m < len(colors) else []
        perm = list(range(ndev))            # default: self-send (no-op)
        for d, e in cls:
            perm[d], perm[e] = e, d
            local_of = {
                s: {dof: i for i, dof in enumerate(uniqs[s])} for s in (d, e)
            }
            dofs = pair_dofs[(d, e)]
            for s in (d, e):
                ids = [local_of[s][dof] for dof in dofs]
                send_idx[s, m, : len(ids)] = ids
        perms.append(tuple((src, dst) for src, dst in enumerate(perm)))

    return PpermutePlan(
        ndev=ndev, nelem=nelem, n_local_max=nlm, rounds=rounds,
        pair_len=pair_len, local_sid=np.stack(sids), perms=tuple(perms),
        send_idx=send_idx,
    )


def dss_sum_ppermute(x, plan: PpermutePlan, mesh: Mesh, axis: str = "e"):
    """dist.dss.dss_sum with per-neighbor ppermute exchange rounds.

    x: [nelem, ..., np, np] shard(able) on the element axis.
    """
    mid = x.shape[1:-2]
    nmid = int(np.prod(mid)) if mid else 1
    nlm = plan.n_local_max
    perms = plan.perms

    def body(x_loc, sid, send_idx):
        sid, send_idx = sid[0], send_idx[0]
        eloc = x_loc.shape[0]
        cols = jnp.moveaxis(
            x_loc.reshape(eloc, nmid, NPSQ), 1, 2
        ).reshape(eloc * NPSQ, nmid)
        # local assembly (row nlm is the zero dummy for padded indices)
        local = jax.ops.segment_sum(cols, sid, num_segments=nlm + 1)
        total = local
        for m in range(plan.rounds):
            idx = send_idx[m]
            buf = local[idx]                         # own partials for peer
            recv = jax.lax.ppermute(buf, axis, perms[m])
            # a self-send returns our own buffer — contribute only when the
            # round actually paired us with someone else
            me = jax.lax.axis_index(axis)
            partner = jnp.asarray(
                [p[1] for p in perms[m]], jnp.int32
            )[me]
            recv = jnp.where(partner != me, recv, jnp.zeros_like(recv))
            total = total.at[idx].add(recv)
        out = total[sid].reshape(eloc, NPSQ, nmid)
        return jnp.moveaxis(out, 1, 2).reshape(x_loc.shape)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(x, jnp.asarray(plan.local_sid), jnp.asarray(plan.send_idx))


def dss_scaled_ppermute(x, plan: PpermutePlan, mesh: Mesh, rspheremp,
                        axis: str = "e"):
    """rspheremp * ppermute-DSS(x) (assembly of a spheremp-weighted
    update), the neighbor-exchange analog of dist.halo.dss_scaled_halo."""
    r = rspheremp
    while r.ndim < x.ndim:
        r = r[:, None]
    return r * dss_sum_ppermute(x, plan, mesh, axis)
