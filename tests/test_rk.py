"""SSPRK3 driver: third-order self-convergence + DSS continuity + stage
consistency with the factored RHS."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_hvcoord,
    random_geometry,
    random_state,
    zero_derived,
)
from tinman_sandbox_tpu.dist import build_cubed_sphere, dss_project
from tinman_sandbox_tpu.kernels.caar_xla import caar_rhs
from tinman_sandbox_tpu.timeloop.rk import ssprk3_step


def _setup(nelem=4, nlev=6, seed=23):
    cfg = Config(nelem=nelem, nlev=nlev)
    st = random_state(cfg, seed=seed)
    dv = zero_derived(cfg)
    geom = random_geometry(cfg, seed=seed + 1)
    hv = analytic_hvcoord(cfg)
    return cfg, st, dv, geom, hv


def _advance(cfg, st, dv, geom, hv, dt, nsteps):
    """March nsteps, copying np1 -> n0 after each step (single-register RK)."""
    for _ in range(nsteps):
        st, dv = ssprk3_step(st, dv, geom, hv, cfg, dt)
        st = dataclasses.replace(
            st,
            u=jnp.asarray(st.u).at[cfg.n0].set(st.u[cfg.np1]),
            v=jnp.asarray(st.v).at[cfg.n0].set(st.v[cfg.np1]),
            t=jnp.asarray(st.t).at[cfg.n0].set(st.t[cfg.np1]),
            dp3d=jnp.asarray(st.dp3d).at[cfg.n0].set(st.dp3d[cfg.np1]),
        )
    return st


def test_ssprk3_third_order_self_convergence():
    cfg, st, dv, geom, hv = _setup()
    # random_geometry has O(1) fcor (real Coriolis is ~1e-4), so the
    # inertial term sets the timescale: keep fcor*dt << 1
    T = 0.4
    sols = {}
    for n in (1, 2, 4):
        out = _advance(cfg, st, dv, geom, hv, T / n, n)
        sols[n] = np.asarray(out.t[cfg.n0])
    e1 = np.max(np.abs(sols[1] - sols[2]))
    e2 = np.max(np.abs(sols[2] - sols[4]))
    assert e1 > 0 and e2 > 0
    order = np.log2(e1 / e2)
    assert 2.5 < order < 3.6, f"observed order {order}"


def test_ssprk3_stage1_matches_euler():
    """With the Shu-Osher coefficients, stage 1 alone is forward Euler —
    check the final state for one tiny step is Euler + O(dt^2)."""
    cfg, st, dv, geom, hv = _setup(seed=41)
    dt = 0.01
    out, _ = ssprk3_step(st, dv, geom, hv, cfg, dt)
    v1, v2, tt, dpt, _ = caar_rhs(
        st.u[cfg.n0], st.v[cfg.n0], st.t[cfg.n0], st.dp3d[cfg.n0],
        st.qdp[cfg.qn0, :, 0], st.phis, dv.pecnd, geom, hv, cfg,
    )
    euler_t = np.asarray(st.t[cfg.n0]) + dt * np.asarray(tt)
    diff = np.max(np.abs(np.asarray(out.t[cfg.np1]) - euler_t))
    # RK correction is O(dt^2 * L^2): a few percent of the Euler increment
    # at this dt, far from either 0 or the increment itself
    assert 0 < diff < 0.1 * np.max(np.abs(dt * np.asarray(tt)))


def test_ssprk3_with_dss_stays_continuous():
    cs = build_cubed_sphere(3)
    cfg = Config(nelem=cs.nelem, nlev=4)
    st = random_state(cfg, seed=9)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    out, _ = ssprk3_step(st, dv, g, hv, cfg, 10.0, gdof=gdof, ndof=cs.ndof)
    t1 = out.t[cfg.np1]
    proj = dss_project(t1, gdof, cs.ndof, g.spheremp, g.rspheremp)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(t1),
                               rtol=1e-11, atol=1e-11)
