"""Fused Pallas tracer kernel vs the jitted euler_step (interpret mode)."""
import jax
import numpy as np

from tinman_sandbox_tpu import Config, random_geometry, random_state
from tinman_sandbox_tpu.kernels.tracer_pallas import euler_step_pallas
from tinman_sandbox_tpu.timeloop import euler_step


def _check(nelem, nlev, qsize, eb, seed=17):
    cfg = Config(nelem=nelem, nlev=nlev, qsize=qsize, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=seed))
    geom = cast(random_geometry(cfg, seed=seed + 1))
    qdp = st.qdp[cfg.qn0]
    vu, vv = st.u[cfg.n0], st.v[cfg.n0]
    dt = np.float32(7.5)

    ref = euler_step(qdp, vu, vv, geom, cfg, dt)
    out = euler_step_pallas(qdp, vu, vv, geom, cfg, dt, interpret=True)
    a, b = np.asarray(out), np.asarray(ref)
    scale = np.max(np.abs(b)) + 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-6)


def test_tracer_pallas_single_tracer():
    _check(nelem=8, nlev=6, qsize=1, eb=4)


def test_tracer_pallas_many_tracers():
    # the reference's tracer-heavy config shape (QSIZE_D=35,
    # level_vectorized_ppscan/config.h.in) at reduced element count
    _check(nelem=4, nlev=5, qsize=35, eb=2)
