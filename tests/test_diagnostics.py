"""Energy/mass diagnostics: values, mass invariance under the assembled
Lagrangian step, hyperviscosity KE dissipation."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
from tinman_sandbox_tpu.dist import build_cubed_sphere, caar_dss_step, dss_project
from tinman_sandbox_tpu.ops.diagnostics import energy_diagnostics
from tinman_sandbox_tpu.timeloop import rotated
from tinman_sandbox_tpu.timeloop.hyperviscosity import apply_hyperviscosity


def test_values_match_numpy():
    cfg = Config(nelem=3, nlev=5)
    st = random_state(cfg, seed=2)
    sph = np.random.default_rng(3).uniform(0.5, 1.5, (3, 4, 4))
    d = energy_diagnostics(st, jnp.asarray(sph), cfg)
    w = sph[:, None]
    u, v, t, dp = (np.asarray(x[cfg.n0]) for x in (st.u, st.v, st.t, st.dp3d))
    g = 9.80616
    np.testing.assert_allclose(
        float(d["KE"]), np.sum(w * 0.5 * (u * u + v * v) * dp) / g, rtol=1e-12
    )
    np.testing.assert_allclose(
        float(d["IE"]), 1005.0 * np.sum(w * t * dp) / g, rtol=1e-12
    )
    np.testing.assert_allclose(float(d["M"]), np.sum(w * dp) / g, rtol=1e-12)


def test_mass_conserved_by_assembled_step():
    """DSS-assembled dp3d update conserves global mass: the dp tendency is
    -div(v dp), whose spheremp-weighted global sum vanishes (Gauss) and the
    DSS projection preserves the weighted integral."""
    cs = build_cubed_sphere(3)
    cfg = Config(nelem=cs.nelem, nlev=4)
    st = random_state(cfg, seed=6)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    # start from a continuous state so the weak-form identity applies
    st = dataclasses.replace(
        st,
        u=jnp.asarray(st.u).at[cfg.n0].set(
            dss_project(st.u[cfg.n0], gdof, cs.ndof, g.spheremp, g.rspheremp)),
        v=jnp.asarray(st.v).at[cfg.n0].set(
            dss_project(st.v[cfg.n0], gdof, cs.ndof, g.spheremp, g.rspheremp)),
        dp3d=jnp.asarray(st.dp3d).at[cfg.n0].set(
            dss_project(st.dp3d[cfg.n0], gdof, cs.ndof, g.spheremp, g.rspheremp)),
    )
    # leapfrog step writing np1 from nm1=n0: set nm1 = n0 for a clean budget
    st = dataclasses.replace(
        st,
        u=jnp.asarray(st.u).at[cfg.nm1].set(st.u[cfg.n0]),
        v=jnp.asarray(st.v).at[cfg.nm1].set(st.v[cfg.n0]),
        t=jnp.asarray(st.t).at[cfg.nm1].set(st.t[cfg.n0]),
        dp3d=jnp.asarray(st.dp3d).at[cfg.nm1].set(st.dp3d[cfg.n0]),
    )
    before = energy_diagnostics(st, g.spheremp, cfg, tl=cfg.n0)
    out, _ = caar_dss_step(st, dv, g, hv, gdof, cs.ndof, cfg, 50.0, 1.0)
    after = energy_diagnostics(out, g.spheremp, cfg, tl=cfg.np1)
    np.testing.assert_allclose(float(after["M"]), float(before["M"]),
                               rtol=1e-11)


def test_hyperviscosity_dissipates_ke():
    cs = build_cubed_sphere(3)
    cfg = Config(nelem=cs.nelem, nlev=3)
    st = random_state(cfg, seed=12)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    noise = np.random.default_rng(1).normal(size=(cs.nelem, cfg.nlev, 4, 4))
    cont = dss_project(jnp.asarray(noise), gdof, cs.ndof, g.spheremp, g.rspheremp)
    st = dataclasses.replace(
        st,
        u=jnp.asarray(st.u).at[cfg.np1].set(cont),
        v=jnp.asarray(st.v).at[cfg.np1].set(0.7 * cont),
    )
    before = energy_diagnostics(st, g.spheremp, cfg, tl=cfg.np1)
    out = apply_hyperviscosity(st, g, gdof, cs.ndof, cfg, nu=1e13, dt=100.0)
    after = energy_diagnostics(out, g.spheremp, cfg, tl=cfg.np1)
    assert float(after["KE"]) < float(before["KE"])
    np.testing.assert_allclose(float(after["M"]), float(before["M"]), rtol=0,
                               atol=1e-20)
