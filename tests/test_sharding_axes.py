"""Additional parallel axes beyond element DP: tracer-axis sharding
(embarrassingly parallel, the EP analog) and a 2D element x tracer mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinman_sandbox_tpu import Config, random_geometry, random_state
from tinman_sandbox_tpu.timeloop import euler_step


def _problem(nelem=8, nlev=4, qsize=8, seed=15):
    cfg = Config(nelem=nelem, nlev=nlev, qsize=qsize)
    st = random_state(cfg, seed=seed)
    geom = random_geometry(cfg, seed=seed + 1)
    return cfg, st, geom


def test_tracer_axis_sharding_matches_unsharded():
    cfg, st, geom = _problem()
    qdp = jnp.asarray(st.qdp[cfg.qn0])
    vu, vv = jnp.asarray(st.u[cfg.n0]), jnp.asarray(st.v[cfg.n0])
    ref = euler_step(qdp, vu, vv, geom, cfg, 2.0)

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("q",))
    qdp_s = jax.device_put(qdp, NamedSharding(mesh, P(None, "q")))
    with mesh:
        out = euler_step(qdp_s, vu, vv, geom, cfg, 2.0)
    assert "q" in str(out.sharding.spec), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-13)


def test_2d_mesh_elements_by_tracers():
    cfg, st, geom = _problem(nelem=8, qsize=4)
    qdp = jnp.asarray(st.qdp[cfg.qn0])
    vu, vv = jnp.asarray(st.u[cfg.n0]), jnp.asarray(st.v[cfg.n0])
    ref = euler_step(qdp, vu, vv, geom, cfg, 0.3)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                axis_names=("e", "q"))
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    qdp_s = put(qdp, P("e", "q"))
    vu_s, vv_s = put(vu, P("e")), put(vv, P("e"))
    geom_s = jax.tree_util.tree_map_with_path(
        lambda path, x: put(
            jnp.asarray(x),
            P() if path[-1].name == "dvv" else P("e"),
        ),
        geom,
    )
    with mesh:
        out = euler_step(qdp_s, vu_s, vv_s, geom_s, cfg, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-13)
