"""Time-integration drivers.

Covers the reference's driver loops:
  * the golden benchmark loop — ``loopmax`` CAAR calls at FIXED time-level
    indices (/root/reference/compute_and_apply_rhs_test/fortran/main.F90:201-210;
    ``update_time_levels`` exists at utils_mod.F90:35-41 but is never called in
    the loop) — as a single jitted ``lax.fori_loop``;
  * a real leapfrog driver with cyclic time-level rotation
    (utils_mod.F90:35-41: nm1<-n0, n0<-np1, np1<-old nm1), expressed as three
    statically-compiled rotations (at most 3 XLA programs, cached);
  * the dp3d>0 runtime invariant (level_vectorized_ppscan/CaarFunctor.hpp:85-96).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..grid import Geometry, HybridVCoord
from ..kernels.caar_xla import caar_xla
from ..state import Derived, State

__all__ = ["benchmark_loop", "leapfrog_step", "run_leapfrog", "check_dp3d"]


@partial(jax.jit, static_argnames=("cfg", "nsteps", "moist"))
def benchmark_loop(
    state: State,
    derived: Derived,
    geom: Geometry,
    hv: HybridVCoord,
    cfg: Config,
    dt2,
    eta_ave_w,
    nsteps: int,
    moist: bool = True,
):
    """``nsteps`` CAAR evaluations at fixed time-level indices — the golden
    workload (main.F90:201-210, kokkos_init.cpp:123-134) as one XLA program."""

    def body(_, carry):
        s, d = carry
        return caar_xla(s, d, geom, hv, cfg, dt2, eta_ave_w, moist=moist)

    return jax.lax.fori_loop(0, nsteps, body, (state, derived))


def rotated(cfg: Config) -> Config:
    """Leapfrog time-level rotation (utils_mod.F90:35-41). Returns a Config
    with permuted (n0, np1, nm1); cycles with period 3 so jit caches at most
    three programs."""
    return dataclasses.replace(cfg, nm1=cfg.n0, n0=cfg.np1, np1=cfg.nm1)


def leapfrog_step(state, derived, geom, hv, cfg, dt2, eta_ave_w, moist=True):
    """One CAAR update followed by time-level rotation.

    Returns (state, derived, cfg) where cfg carries the rotated indices.
    """
    state, derived = caar_xla(
        state, derived, geom, hv, cfg, dt2, eta_ave_w, moist=moist
    )
    return state, derived, rotated(cfg)


def run_leapfrog(state, derived, geom, hv, cfg, nsteps=None, moist=True):
    """Drive ``nsteps`` leapfrog steps with time-level rotation.

    dt2 = 2*dt for a centered leapfrog step; eta_ave_w = 1/nsteps so the
    derived accumulators average over the run (HOMME convention: eta_ave_w =
    1/qsplit per RK stage; the sandbox fixes eta_ave_w=1, Control.hpp:11-53).
    """
    nsteps = cfg.nsteps if nsteps is None else nsteps
    dt2 = 2.0 * cfg.dt
    eta_ave_w = 1.0 / max(nsteps, 1)
    for _ in range(nsteps):
        state, derived, cfg = leapfrog_step(
            state, derived, geom, hv, cfg, dt2, eta_ave_w, moist=moist
        )
    return state, derived, cfg


@partial(jax.jit, static_argnames=("cfg",))
def check_dp3d(state: State, cfg: Config):
    """dp3d>0 invariant at the just-updated time level
    (CaarFunctor.hpp:85-96). Returns (all_positive, min_value)."""
    dp = state.dp3d[cfg.np1]
    return jnp.all(dp > 0.0), jnp.min(dp)
