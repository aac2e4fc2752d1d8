"""Cubed-sphere geometry + DSS: analytic operator checks, projection
identity, global invariants, and sharded-vs-single-device equality."""
import numpy as np
import jax
import jax.numpy as jnp

from tinman_sandbox_tpu.constants import CONSTANTS
from tinman_sandbox_tpu.dist import (
    build_cubed_sphere,
    caar_dss_step,
    dss_project,
    dss_sum,
    make_mesh,
    shard_problem,
)
from tinman_sandbox_tpu.ops import divergence_sphere, gradient_sphere, vorticity_sphere

RR = CONSTANTS.rrearth


def _grid(ne=4):
    return build_cubed_sphere(ne)


def test_dof_count_and_multiplicity():
    ne = 3
    cs = _grid(ne)
    # continuous GLL dofs on a cubed sphere: 6*(3ne)^2 + 2
    assert cs.ndof == 6 * (3 * ne) ** 2 + 2
    # in-face element corners: 4; cube corners: 3; edges: 2; interior: 1
    assert cs.multiplicity.max() == 4
    assert np.sum(cs.multiplicity == 3) == 8      # the 8 cube corners
    assert cs.multiplicity.min() == 1
    assert set(np.unique(cs.multiplicity)) == {1, 2, 3, 4}


def test_surface_area_converges():
    """GLL quadrature of the metric determinant integrates the sphere area
    with ~6th-order convergence in ne."""
    errs = []
    for ne in (2, 4, 8):
        cs = _grid(ne)
        area = float(np.sum(np.asarray(cs.geometry.spheremp)))
        errs.append(abs(area / (4.0 * np.pi) - 1.0))
    assert errs[2] < 1e-8
    assert errs[0] / errs[1] > 20 and errs[1] / errs[2] > 20  # ~O(ne^-5..6)


def test_gradient_matches_analytic():
    """grad of s = z (cartesian height) on the sphere: the tangential
    gradient of z is cos(lat) * e_lat / rearth."""
    cs = _grid(8)
    g = cs.geometry
    s = jnp.asarray(cs.sphere_xyz[..., 2])            # [e, np, np]
    g1, g2 = gradient_sphere(s, g.dvv, g.dinv, RR)
    expect1 = np.zeros_like(np.asarray(g1))
    expect2 = np.cos(cs.lat) * RR
    np.testing.assert_allclose(np.asarray(g1), expect1, atol=3e-4 * RR)
    np.testing.assert_allclose(np.asarray(g2), expect2, rtol=0, atol=3e-4 * RR)


def test_divergence_matches_analytic():
    """v = tangential projection of constant cartesian c:
    div_sphere(v) = -2 (c . rhat) / rearth."""
    cs = _grid(8)
    g = cs.geometry
    c = np.array([0.3, -1.1, 0.7])
    r = cs.sphere_xyz
    ct = c[None, None, None, :] - np.sum(c * r, axis=-1, keepdims=True) * r
    # latlon components via vec_sph2cart rows (e_lon, e_lat)
    v1 = np.sum(np.moveaxis(np.asarray(g.vec_sph2cart)[:, 0], 1, -1) * ct, axis=-1)
    v2 = np.sum(np.moveaxis(np.asarray(g.vec_sph2cart)[:, 1], 1, -1) * ct, axis=-1)
    div = divergence_sphere(jnp.asarray(v1), jnp.asarray(v2), g.dvv, g.dinv,
                            g.metdet, g.rmetdet, RR)
    expect = -2.0 * np.sum(c * r, axis=-1) * RR
    scale = np.max(np.abs(expect))
    np.testing.assert_allclose(np.asarray(div) / scale, expect / scale,
                               atol=2e-3)

    # and the error converges away under refinement
    cs16 = _grid(16)
    g16 = cs16.geometry
    r16 = cs16.sphere_xyz
    ct16 = c[None, None, None, :] - np.sum(c * r16, axis=-1, keepdims=True) * r16
    w1 = np.sum(np.moveaxis(np.asarray(g16.vec_sph2cart)[:, 0], 1, -1) * ct16, axis=-1)
    w2 = np.sum(np.moveaxis(np.asarray(g16.vec_sph2cart)[:, 1], 1, -1) * ct16, axis=-1)
    div16 = divergence_sphere(jnp.asarray(w1), jnp.asarray(w2), g16.dvv,
                              g16.dinv, g16.metdet, g16.rmetdet, RR)
    e16 = -2.0 * np.sum(c * r16, axis=-1) * RR
    err8 = np.max(np.abs(np.asarray(div) - expect)) / scale
    err16 = np.max(np.abs(np.asarray(div16) - e16)) / scale
    assert err16 < err8 / 4


def test_vorticity_of_gradient_is_zero():
    cs = _grid(6)
    g = cs.geometry
    s = jnp.asarray(np.sin(cs.sphere_xyz[..., 0]) + cs.sphere_xyz[..., 1] ** 2)
    g1, g2 = gradient_sphere(s, g.dvv, g.dinv, RR)
    vort = vorticity_sphere(g1, g2, g.dvv, g.d, g.rmetdet, RR)
    assert np.max(np.abs(np.asarray(vort))) < 1e-10 * RR


def test_dss_projection_identity():
    """DSS projection must be the identity on continuous fields."""
    cs = _grid(4)
    g = cs.geometry
    # a smooth global function sampled at nodes -> continuous by construction
    x = np.sin(3 * cs.sphere_xyz[..., 0]) * np.cos(2 * cs.sphere_xyz[..., 2])
    out = dss_project(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof,
                      g.spheremp, g.rspheremp)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-12, atol=1e-12)


def test_dss_sum_counts_multiplicity():
    cs = _grid(3)
    ones = jnp.ones((cs.nelem, 4, 4))
    out = np.asarray(dss_sum(ones, jnp.asarray(cs.gdof), cs.ndof))
    np.testing.assert_array_equal(out, cs.multiplicity[cs.gdof])


def test_global_divergence_integral_is_zero():
    """Gauss: integral of div(v) over the closed sphere vanishes."""
    cs = _grid(6)
    g = cs.geometry
    c = np.array([1.0, 2.0, -0.5])
    r = cs.sphere_xyz
    ct = c[None, None, None, :] - np.sum(c * r, axis=-1, keepdims=True) * r
    v1 = np.sum(np.moveaxis(np.asarray(g.vec_sph2cart)[:, 0], 1, -1) * ct, axis=-1)
    v2 = np.sum(np.moveaxis(np.asarray(g.vec_sph2cart)[:, 1], 1, -1) * ct, axis=-1)
    div = divergence_sphere(jnp.asarray(v1), jnp.asarray(v2), g.dvv, g.dinv,
                            g.metdet, g.rmetdet, RR)
    integral = float(jnp.sum(jnp.asarray(g.spheremp) * div))
    assert abs(integral) < 1e-12


def _dist_problem(ne=4, nlev=6):
    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived

    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=nlev)
    st = random_state(cfg, seed=4)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)
    return cs, cfg, st, dv, hv


def test_caar_dss_step_continuity():
    """After the DSS step the np1 fields must be continuous across element
    boundaries (projection idempotent)."""
    cs, cfg, st, dv, hv = _dist_problem()
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    s1, _ = caar_dss_step(st, dv, g, hv, gdof, cs.ndof, cfg, 0.01, 1.0)
    t1 = s1.t[cfg.np1]
    # continuity: DSS projection leaves the assembled field unchanged
    proj = dss_project(t1, gdof, cs.ndof, g.spheremp, g.rspheremp)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(t1),
                               rtol=1e-11, atol=1e-11)


def test_sharded_step_matches_single_device():
    """Element-sharded execution on the 8-device CPU mesh must equal the
    unsharded run bit-for-bit modulo fp reduction order (tight tol)."""
    cs, cfg, st, dv, hv = _dist_problem(ne=4, nlev=5)   # 96 elements / 8 devs
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)

    ref_s, ref_d = caar_dss_step(st, dv, g, hv, gdof, cs.ndof, cfg, 0.02, 0.5)

    mesh = make_mesh(8)
    st_s, dv_s, g_s = shard_problem(mesh, st, dv, g)
    out_s, out_d = caar_dss_step(st_s, dv_s, g_s, hv, gdof, cs.ndof, cfg,
                                 0.02, 0.5)
    assert "e" in str(out_s.t.sharding.spec), out_s.t.sharding
    np.testing.assert_allclose(
        np.asarray(out_s.t[cfg.np1]), np.asarray(ref_s.t[cfg.np1]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.dp3d[cfg.np1]), np.asarray(ref_s.dp3d[cfg.np1]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_d.omega_p), np.asarray(ref_d.omega_p),
        rtol=1e-12, atol=1e-12,
    )
