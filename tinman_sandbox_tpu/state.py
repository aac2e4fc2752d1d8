"""Prognostic / derived state pytrees and the canonical deterministic init.

Replaces the reference's element_state_mod.F90:10-24 (elem_state_t) and
element_mod.F90:63-124 (derived_state_t) with struct-of-arrays pytrees:
time levels lead ([3, nelem, ...]), elements next, levels, then GLL i, j.
This is the layout XLA shards and vectorizes best (SURVEY §7 design stance).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from .config import NP, NUM_TIME_LEVELS, QDP_TIME_LEVELS, Config


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    """Prognostic state (element_state_mod.F90:10-24)."""

    u: Any        # [3, nelem, nlev, np, np]  zonal wind
    v: Any        # [3, nelem, nlev, np, np]  meridional wind
    t: Any        # [3, nelem, nlev, np, np]  temperature
    dp3d: Any     # [3, nelem, nlev, np, np]  pressure-level thickness
    ps_v: Any     # [3, nelem, np, np]        surface pressure
    phis: Any     # [nelem, np, np]           surface geopotential
    qdp: Any      # [2, nelem, qsize, nlev, np, np] tracer mass

    @property
    def nelem(self) -> int:
        return self.u.shape[1]

    @property
    def nlev(self) -> int:
        return self.u.shape[2]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Derived:
    """Diagnostic/accumulator state (element_mod.F90:63-124 subset used by
    CAAR: vn0, phi, omega_p, eta_dot_dpdn, pecnd)."""

    vn0_u: Any          # [nelem, nlev, np, np]   mass-flux accumulator (u)
    vn0_v: Any          # [nelem, nlev, np, np]   mass-flux accumulator (v)
    phi: Any            # [nelem, nlev, np, np]   geopotential
    omega_p: Any        # [nelem, nlev, np, np]   omega/p accumulator
    eta_dot_dpdn: Any   # [nelem, nlev+1, np, np] vertical mass flux accumulator
    pecnd: Any          # [nelem, nlev, np, np]   CAM condensate pressure perturbation


def analytic_state(cfg: Config, dtype=np.float64) -> State:
    """The reference's deterministic analytic init (fortran/main.F90:103-154,
    cxx/basic/data_structures.cpp:42-92). 1-based i, j, k, ie; time levels get
    +tl*(1|2|3|1) offsets. Qdp is only initialized at time level qn0."""
    nelem, nlev, qsize = cfg.nelem, cfg.nlev, cfg.qsize
    ie = np.arange(1, nelem + 1, dtype=np.float64)[:, None, None, None]
    k = np.arange(1, nlev + 1, dtype=np.float64)[None, :, None, None]
    i = np.arange(1, NP + 1, dtype=np.float64)[None, None, :, None]
    j = np.arange(1, NP + 1, dtype=np.float64)[None, None, None, :]
    tl = np.arange(1, NUM_TIME_LEVELS + 1, dtype=np.float64).reshape(-1, 1, 1, 1, 1)

    base_dp = 10.0 * k + ie + i + j                    # [nelem, nlev, np, np]
    base_uv = 1.0 + k / 2.0 + i + j + ie / 5.0
    base_t = 1000.0 - k - i - j + ie / 10.0

    dp3d = (base_dp[None] + tl).astype(dtype)
    u = (base_uv[None] + tl * 2.0).astype(dtype)
    v = (base_uv[None] + tl * 3.0).astype(dtype)
    t = (base_t[None] + tl).astype(dtype)

    qdp = np.zeros((QDP_TIME_LEVELS, nelem, qsize, nlev, NP, NP), dtype=dtype)
    qdp[cfg.qn0, :, 0] = 1.0 + np.sin(i * j * k)

    phis = np.broadcast_to(i[0, 0] + j[0, 0], (nelem, NP, NP)).astype(dtype)
    ps_v = np.zeros((NUM_TIME_LEVELS, nelem, NP, NP), dtype=dtype)

    return State(u=u, v=v, t=t, dp3d=dp3d, ps_v=ps_v, phis=phis, qdp=qdp)


def analytic_derived(cfg: Config, dtype=np.float64) -> Derived:
    """Derived-field analytic init (fortran/main.F90:130-134)."""
    nelem, nlev = cfg.nelem, cfg.nlev
    k = np.arange(1, nlev + 1, dtype=np.float64)[None, :, None, None]
    i = np.arange(1, NP + 1, dtype=np.float64)[None, None, :, None]
    j = np.arange(1, NP + 1, dtype=np.float64)[None, None, None, :]
    shape3 = (nelem, nlev, NP, NP)

    phi = np.broadcast_to(np.cos(i + 3.0 * j) + k, shape3).astype(dtype)
    return Derived(
        vn0_u=np.ones(shape3, dtype=dtype),
        vn0_v=np.ones(shape3, dtype=dtype),
        phi=phi.copy(),
        omega_p=np.broadcast_to(j * j, shape3).astype(dtype).copy(),
        eta_dot_dpdn=np.zeros((nelem, nlev + 1, NP, NP), dtype=dtype),
        pecnd=np.ones(shape3, dtype=dtype),
    )


def random_state(cfg: Config, seed: int = 1, dtype=np.float64) -> State:
    """Seeded random init for performance runs (Elements.cpp:101-151 analog):
    dp3d strictly positive so the dp3d>0 invariant holds at step 0."""
    rng = np.random.default_rng(seed)
    nelem, nlev, qsize = cfg.nelem, cfg.nlev, cfg.qsize
    s3 = (NUM_TIME_LEVELS, nelem, nlev, NP, NP)
    return State(
        u=rng.uniform(-1, 1, s3).astype(dtype),
        v=rng.uniform(-1, 1, s3).astype(dtype),
        t=rng.uniform(250, 300, s3).astype(dtype),
        dp3d=rng.uniform(10, 20, s3).astype(dtype),
        ps_v=rng.uniform(9e4, 1.1e5, (NUM_TIME_LEVELS, nelem, NP, NP)).astype(dtype),
        phis=rng.uniform(0, 1, (nelem, NP, NP)).astype(dtype),
        qdp=rng.uniform(0, 1, (QDP_TIME_LEVELS, nelem, qsize, nlev, NP, NP)).astype(dtype),
    )


def random_state_device(cfg: Config, seed: int = 1, dtype=None) -> State:
    """random_state generated ON DEVICE with jax.random — avoids staging
    multi-GB host arrays through slow host->device links for large grids
    (ne120-class: ~10 GB of state). Same distributions as random_state,
    different stream."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    nelem, nlev, qsize = cfg.nelem, cfg.nlev, cfg.qsize
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    s3 = (NUM_TIME_LEVELS, nelem, nlev, NP, NP)
    u = lambda k, lo, hi, sh: jax.random.uniform(
        k, sh, dtype, minval=lo, maxval=hi
    )
    return State(
        u=u(ks[0], -1, 1, s3),
        v=u(ks[1], -1, 1, s3),
        t=u(ks[2], 250, 300, s3),
        dp3d=u(ks[3], 10, 20, s3),
        ps_v=u(ks[4], 9e4, 1.1e5, (NUM_TIME_LEVELS, nelem, NP, NP)),
        phis=u(ks[5], 0, 1, (nelem, NP, NP)),
        qdp=u(ks[6], 0, 1, (QDP_TIME_LEVELS, nelem, qsize, nlev, NP, NP)),
    )


def zero_derived(cfg: Config, dtype=np.float64) -> Derived:
    nelem, nlev = cfg.nelem, cfg.nlev
    shape3 = (nelem, nlev, NP, NP)
    z = lambda s: np.zeros(s, dtype=dtype)
    return Derived(
        vn0_u=z(shape3), vn0_v=z(shape3), phi=z(shape3), omega_p=z(shape3),
        eta_dot_dpdn=z((nelem, nlev + 1, NP, NP)), pecnd=z(shape3),
    )
