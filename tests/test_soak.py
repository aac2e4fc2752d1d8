"""100-step integration gate (BASELINE.md: allclose to the reference
implementation after 100 steps).

Note the sandbox's raw apply (X = spheremp*(X + dt2*tens),
routine_mod.F90:182-190) is not iterable under time-level rotation — full
HOMME closes it with DSS + rspheremp, which the sandbox stripped. The gate
therefore runs the physically-complete assembled step: the f64 NumPy oracle
(caar_ref + an independent np.add.at DSS) vs the jitted caar_dss_step, 100
leapfrog steps on a real ne=2 cubed sphere."""
import numpy as np
import jax.numpy as jnp

from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
from tinman_sandbox_tpu.dist import build_cubed_sphere, caar_dss_step
from tinman_sandbox_tpu.ref import caar_ref
from tinman_sandbox_tpu.timeloop import check_dp3d, rotated


def _numpy_dss_scaled(x, gdof, ndof, rspheremp):
    """Independent DSS implementation (np.add.at) for the oracle side."""
    nelem, nlev = x.shape[0], x.shape[1]
    acc = np.zeros((ndof, nlev))
    cols = np.moveaxis(x, 1, -1).reshape(-1, nlev)       # [e*16, nlev]
    np.add.at(acc, gdof.reshape(-1), cols)
    out = acc[gdof.reshape(-1)].reshape(nelem, 4, 4, nlev)
    return rspheremp[:, None] * np.moveaxis(out, -1, 1)


def test_100_step_assembled_leapfrog_oracle_vs_xla():
    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=8)
    st = random_state(cfg, seed=77)
    dv = zero_derived(cfg)
    geom = cs.geometry
    hv = analytic_hvcoord(cfg)
    gdof = cs.gdof

    st_o, dv_o = st, dv
    st_x, dv_x = st, dv
    c = cfg
    dt2 = 10.0
    gdof_j = jnp.asarray(gdof)
    for _ in range(100):
        # oracle: raw CAAR then independent assembly of np1
        st_o, dv_o = caar_ref(st_o, dv_o, geom, hv, c, dt2=dt2, eta_ave_w=0.01)
        for name in ("u", "v", "t", "dp3d"):
            arr = np.asarray(getattr(st_o, name))
            arr[c.np1] = _numpy_dss_scaled(
                arr[c.np1], gdof, cs.ndof, np.asarray(geom.rspheremp)
            )
        st_x, dv_x = caar_dss_step(st_x, dv_x, geom, hv, gdof_j, cs.ndof, c,
                                   dt2, 0.01)
        c = rotated(c)

    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(st_x, name))
        b = np.asarray(getattr(st_o, name))
        assert np.isfinite(b).all(), f"oracle {name} not finite after 100 steps"
        scale = np.max(np.abs(b))
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-10,
                                   err_msg=name)
    ok, mn = check_dp3d(st_x, c)
    assert bool(ok), f"dp3d positivity lost (min {float(mn)})"


import pytest


@pytest.mark.slow
def test_100_step_golden_init_prim_cadence_soak():
    """100 steps of the full prim_run_step cadence (SSPRK3 + DSS +
    hyperviscosity + subcycled limited tracers) on a real ne=2 cubed
    sphere, state initialized from the canonical analytic fields
    (main.F90:103-154). Gate: everything finite, dp3d stays positive,
    prognostic norms bounded."""
    from tinman_sandbox_tpu import analytic_state
    from tinman_sandbox_tpu.ops.norms import state_norms
    from tinman_sandbox_tpu.timeloop.prim import prim_run_step

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=8, dt=0.05)
    st = analytic_state(cfg)
    dv = zero_derived(cfg)
    geom = cs.geometry
    hv = analytic_hvcoord(cfg)
    gdof = jnp.asarray(cs.gdof)

    n0 = state_norms(st)
    c = cfg
    for i in range(100):
        st, dv, c = prim_run_step(st, dv, geom, hv, c, gdof, cs.ndof,
                                  nu=0.0, qsplit=2, limit_tracers=True)
    ok, mn = check_dp3d(st, c)
    assert bool(ok), f"dp3d went nonpositive: {float(mn)}"
    n1 = state_norms(st)
    for k in ("v", "T", "dp"):
        assert np.isfinite(n1[k])
        assert n1[k] < 10.0 * (n0[k] + 1.0)
