"""Solid-body-rotation transport test (the classic Williamson case-1 style
validation, which the reference has no analog of): a cosine bell advected
once around the sphere by solid-body zonal flow must return to its initial
position with bounded error and exactly conserved tracer mass."""
import numpy as np
import jax.numpy as jnp

from tinman_sandbox_tpu import Config
from tinman_sandbox_tpu.constants import CONSTANTS
from tinman_sandbox_tpu.dist import build_cubed_sphere
from tinman_sandbox_tpu.timeloop.tracer import ssprk3_tracer_step


def _cosine_bell(cs, lon0=0.0, lat0=0.0, radius=1.0 / 3.0):
    """q in [0,1] on the unit sphere; radius in radians."""
    x0 = np.array([np.cos(lat0) * np.cos(lon0),
                   np.cos(lat0) * np.sin(lon0), np.sin(lat0)])
    dot = np.clip(np.einsum("eijc,c->eij", cs.sphere_xyz, x0), -1, 1)
    r = np.arccos(dot)
    return np.where(r < radius, 0.5 * (1.0 + np.cos(np.pi * r / radius)), 0.0)


def test_solid_body_rotation_full_revolution():
    ne = 6
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=1, qsize=1)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)

    a = CONSTANTS.rearth
    period = 12.0 * 86400.0                      # one revolution in 12 days
    u0 = 2.0 * np.pi * a / period                # m/s at the equator
    vu = (u0 * np.cos(cs.lat))[:, None]          # zonal solid rotation
    vv = np.zeros_like(vu)

    q0 = _cosine_bell(cs, radius=0.5)[:, None, None]         # [e, qsize=1, nlev=1, 4, 4]
    qdp = jnp.asarray(q0)

    # CFL: min GLL spacing ~ 0.217/ne rad -> dt ~ 0.3 * dx / omega_rot
    nsteps = 480
    dt = period / nsteps
    vu_j, vv_j = jnp.asarray(vu), jnp.asarray(vv)
    mass0 = float(np.sum(np.asarray(g.spheremp)[:, None, None] * q0))

    q = qdp
    for _ in range(nsteps):
        q = ssprk3_tracer_step(q, vu_j, vv_j, g, cfg, dt, gdof=gdof,
                               ndof=cs.ndof)

    qf = np.asarray(q)
    assert np.isfinite(qf).all()
    mass1 = float(np.sum(np.asarray(g.spheremp)[:, None, None] * qf))
    # tracer mass exactly conserved by the weak-form/DSS machinery
    np.testing.assert_allclose(mass1, mass0, rtol=1e-10)
    # shape error after a full revolution: bounded spectral-element transport
    err = np.linalg.norm(qf - q0) / np.linalg.norm(q0)
    assert err < 0.3, f"L2 transport error {err}"
    # the bell's peak neither collapses nor blows up
    assert 0.6 < qf.max() < 1.2


def test_limiter_unit():
    from tinman_sandbox_tpu.ops.limiter import element_bounds, limit_tracer

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-0.2, 1.3, (6, 3, 4, 4)))
    w = jnp.asarray(rng.uniform(0.5, 2.0, (6, 3, 4, 4)))
    qmin, qmax = jnp.zeros((6, 3, 1, 1)), jnp.ones((6, 3, 1, 1))
    out = np.asarray(limit_tracer(q, w, qmin, qmax))
    # mass exactly conserved per element-level
    np.testing.assert_allclose(
        (out * np.asarray(w)).sum((-2, -1)),
        (np.asarray(q) * np.asarray(w)).sum((-2, -1)), rtol=1e-12,
    )
    # bounds respected wherever feasible (mass within [wsum*qmin, wsum*qmax])
    mass = (np.asarray(q) * np.asarray(w)).sum((-2, -1))
    wsum = np.asarray(w).sum((-2, -1))
    feasible = (mass >= 0.0) & (mass <= wsum)
    viol = np.maximum(out - 1.0, 0.0) + np.maximum(-out, 0.0)
    assert viol.max(axis=(-2, -1))[feasible].max() < 1e-10
    # identity when already within bounds
    q_ok = jnp.asarray(rng.uniform(0.2, 0.8, (2, 2, 4, 4)))
    out_ok = limit_tracer(q_ok, w[:2, :2], jnp.zeros((2, 2, 1, 1)),
                          jnp.ones((2, 2, 1, 1)))
    np.testing.assert_allclose(np.asarray(out_ok), np.asarray(q_ok),
                               rtol=1e-12)


def test_solid_body_rotation_with_limiter():
    """Limited transport: no negatives/overshoots beyond fp noise, mass
    conserved, error comparable to the unlimited run."""
    ne = 6
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=1, qsize=1)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    a = CONSTANTS.rearth
    period = 12.0 * 86400.0
    u0 = 2.0 * np.pi * a / period
    vu = jnp.asarray((u0 * np.cos(cs.lat))[:, None])
    vv = jnp.zeros_like(vu)
    q0 = _cosine_bell(cs, radius=0.5)[:, None, None]
    nsteps = 240
    dt = period / 2 / nsteps          # half revolution (runtime)
    mass0 = float(np.sum(np.asarray(g.spheremp)[:, None, None] * q0))
    q = jnp.asarray(q0)
    for _ in range(nsteps):
        q = ssprk3_tracer_step(q, vu, vv, g, cfg, dt, gdof=gdof,
                               ndof=cs.ndof, limit=True)
    qf = np.asarray(q)
    mass1 = float(np.sum(np.asarray(g.spheremp)[:, None, None] * qf))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-10)
    # monotone: projection after limiting can leak only marginally
    assert qf.min() > -1e-3
    assert qf.max() < 1.0 + 1e-3


def test_limiter_float32_uniform_elements():
    """f32 regression: uniform elements (zero headroom) must not produce
    NaN — 1e-300 guards underflow to 0 in f32."""
    from tinman_sandbox_tpu.ops.limiter import limit_tracer

    q = jnp.full((4, 2, 4, 4), 0.5, jnp.float32)
    w = jnp.full((4, 2, 4, 4), 1.0, jnp.float32)
    out = limit_tracer(q, w, jnp.full((4, 2, 1, 1), 0.5, jnp.float32),
                       jnp.full((4, 2, 1, 1), 0.5, jnp.float32))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-6)
