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
