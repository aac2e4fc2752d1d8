"""Biharmonic hyperviscosity on the cubed sphere: nullspace, damping,
continuity, and scalar-Laplacian spectral sanity."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
from tinman_sandbox_tpu.dist import build_cubed_sphere, dss_project
from tinman_sandbox_tpu.timeloop.hyperviscosity import apply_hyperviscosity, biharmonic_wk


def _setup(ne=4, nlev=3):
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=nlev)
    st = random_state(cfg, seed=31)
    return cs, cfg, st


def test_constant_field_is_nullspace():
    cs, cfg, st = _setup()
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    shape = (cfg.nelem, cfg.nlev, 4, 4)
    const = jnp.full(shape, 7.5)
    zero = jnp.zeros(shape)
    _, _, bt = biharmonic_wk(zero, zero, const, g, gdof, cs.ndof)
    assert np.max(np.abs(np.asarray(bt))) < 1e-18


def test_damping_reduces_noise_energy():
    cs, cfg, st = _setup(ne=3)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    np1 = cfg.np1
    # continuous smooth base + discontinuous noise, projected continuous
    rng = np.random.default_rng(5)
    noise = rng.normal(size=(cfg.nelem, cfg.nlev, 4, 4))
    tfield = dss_project(jnp.asarray(noise), gdof, cs.ndof, g.spheremp,
                         g.rspheremp)
    st = dataclasses.replace(
        st,
        t=jnp.asarray(st.t).at[np1].set(tfield),
        u=jnp.asarray(st.u).at[np1].set(tfield),
        v=jnp.asarray(st.v).at[np1].set(0.5 * tfield),
    )
    # choose nu*dt small for stability: |grad^4| ~ (k_max)^4, rrearth scaled
    out = apply_hyperviscosity(st, g, gdof, cs.ndof, cfg, nu=1e13, dt=100.0)
    before = np.linalg.norm(np.asarray(st.t[np1]) - np.mean(np.asarray(st.t[np1])))
    after_arr = np.asarray(out.t[np1])
    after = np.linalg.norm(after_arr - np.mean(after_arr))
    assert after < before
    # and the damped field stays continuous across element boundaries
    proj = dss_project(out.t[np1], gdof, cs.ndof, g.spheremp, g.rspheremp)
    np.testing.assert_allclose(np.asarray(proj), after_arr, rtol=1e-10,
                               atol=1e-10)
    # dp3d untouched by hyperviscosity
    np.testing.assert_array_equal(np.asarray(out.dp3d), np.asarray(st.dp3d))


def test_assembled_laplacian_eigenfunction():
    """On the sphere, spherical harmonics are Laplacian eigenfunctions:
    grad^2 Y_lm = -l(l+1)/a^2 Y_lm. Check with Y_10 ~ z at coarse tolerance
    (one weak pass + assembly approximates the continuous operator)."""
    cs = build_cubed_sphere(8)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    from tinman_sandbox_tpu.constants import CONSTANTS
    from tinman_sandbox_tpu.dist.dss import dss_scaled
    from tinman_sandbox_tpu.ops import laplace_simple

    z = jnp.asarray(cs.sphere_xyz[..., 2])[:, None]      # [e, 1, np, np]
    rr = CONSTANTS.rrearth
    lap = dss_scaled(
        laplace_simple(z, g.dvv, g.dinv[:, None], g.spheremp[:, None], rr),
        gdof, cs.ndof, g.rspheremp,
    )
    expect = -2.0 * rr * rr * np.asarray(z)   # l=1: -l(l+1)/a^2
    scale = np.max(np.abs(expect))
    np.testing.assert_allclose(np.asarray(lap) / scale, expect / scale,
                               atol=8e-3)
