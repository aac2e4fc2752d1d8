"""Full primitive-equation step: stability, conservation, rotation."""
import numpy as np
import jax.numpy as jnp

from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
from tinman_sandbox_tpu.dist import build_cubed_sphere, dss_project
from tinman_sandbox_tpu.ops.diagnostics import energy_diagnostics
from tinman_sandbox_tpu.timeloop import check_dp3d
from tinman_sandbox_tpu.timeloop.prim import prim_run_step

import dataclasses


def test_prim_run_multi_step():
    cs = build_cubed_sphere(3)
    cfg = Config(nelem=cs.nelem, nlev=5, dt=30.0)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    st = random_state(cfg, seed=21)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)

    # continuous initial data at every time level (assembled model state)
    P = lambda x: dss_project(x, gdof, cs.ndof, g.spheremp, g.rspheremp)
    fields = {}
    for name in ("u", "v", "t", "dp3d"):
        arr = jnp.asarray(getattr(st, name))
        for tl in range(3):
            arr = arr.at[tl].set(P(arr[tl]))
        fields[name] = arr
    st = dataclasses.replace(st, **fields)

    m0 = float(energy_diagnostics(st, g.spheremp, cfg)["M"])
    q_mass0 = float(np.sum(np.asarray(g.spheremp)[:, None, None]
                           * np.asarray(st.qdp[cfg.qn0])))

    c = cfg
    s, d = st, dv
    for _ in range(5):
        s, d, c = prim_run_step(s, d, g, hv, c, gdof, cs.ndof, nu=1e12,
                                qsplit=2)

    assert np.isfinite(np.asarray(s.t)).all()
    ok, mn = check_dp3d(s, dataclasses.replace(c, np1=c.n0))
    assert bool(ok), float(mn)
    # rotation bookkeeping: 5 steps -> phase 5 mod 3 = 2 rotations past start
    assert (c.n0, c.np1, c.nm1) != (cfg.n0, cfg.np1, cfg.nm1)
    # air mass conserved through the assembled dynamics
    m1 = float(energy_diagnostics(s, g.spheremp, cfg, tl=c.n0)["M"])
    np.testing.assert_allclose(m1, m0, rtol=1e-10)
    # tracer mass conserved through the subcycled transport
    q_mass1 = float(np.sum(np.asarray(g.spheremp)[:, None, None]
                           * np.asarray(s.qdp[c.qn0])))
    np.testing.assert_allclose(q_mass1, q_mass0, rtol=1e-9)


def test_prim_run_with_remap_and_limiter():
    """prim step with limiter + remap cadence on a real hybrid coordinate:
    stable, mass + tracer mass conserved through the remap."""
    from tinman_sandbox_tpu.grid import HybridVCoord
    from tinman_sandbox_tpu.ops.remap import reference_dp
    from tinman_sandbox_tpu.config import NP, NUM_TIME_LEVELS

    cs = build_cubed_sphere(2)
    nlev = 6
    cfg = Config(nelem=cs.nelem, nlev=nlev, dt=20.0)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    p0, p_top = 1.0e5, 500.0
    etai = np.linspace(p_top / p0, 1.0, nlev + 1)
    b = ((etai - etai[0]) / (1.0 - etai[0])) ** 1.3
    a = etai - b
    hv = HybridVCoord(ps0=p0, hyai=a, hybi=b,
                      hyam=0.5 * (a[:-1] + a[1:]),
                      hybm=0.5 * (b[:-1] + b[1:]))
    ps = jnp.full((cs.nelem, NP, NP), p0)
    dp_ref = reference_dp(hv, ps)
    from tinman_sandbox_tpu.state import State

    tile = lambda x: jnp.broadcast_to(x, (NUM_TIME_LEVELS,) + x.shape).copy()
    zeros3 = jnp.zeros((NUM_TIME_LEVELS, cs.nelem, nlev, NP, NP))
    st = State(
        u=zeros3, v=zeros3,
        t=tile(280.0 * jnp.ones_like(dp_ref)),
        dp3d=tile(dp_ref), ps_v=tile(ps),
        phis=jnp.zeros((cs.nelem, NP, NP)),
        qdp=jnp.full((2, cs.nelem, cfg.qsize, nlev, NP, NP), 1e-3)
        * dp_ref[None, :, None],
    )
    dv = zero_derived(cfg)
    q_mass0 = float(np.sum(np.asarray(g.spheremp)[:, None, None]
                           * np.asarray(st.qdp[cfg.qn0])))
    m0 = float(energy_diagnostics(st, g.spheremp, cfg)["M"])

    c = cfg
    s, d = st, dv
    for step in range(4):
        s, d, c = prim_run_step(s, d, g, hv, c, gdof, cs.ndof, nu=1e14,
                                qsplit=2, limit_tracers=True,
                                remap=(step % 2 == 1))
    assert np.isfinite(np.asarray(s.t)).all()
    m1 = float(energy_diagnostics(s, g.spheremp, cfg, tl=c.n0)["M"])
    np.testing.assert_allclose(m1, m0, rtol=1e-9)
    q_mass1 = float(np.sum(np.asarray(g.spheremp)[:, None, None]
                           * np.asarray(s.qdp[c.qn0])))
    np.testing.assert_allclose(q_mass1, q_mass0, rtol=1e-9)
