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


def test_level_axis_sharding_matches_unsharded():
    """Vertical (level) axis sharding — the sequence-parallel analog
    (SURVEY §5): the cumsum recurrences cross the sharded axis, so XLA must
    insert collectives; results must be identical."""
    from tinman_sandbox_tpu import analytic_hvcoord, zero_derived
    from tinman_sandbox_tpu.kernels import caar_xla

    cfg, st, geom = _problem(nelem=4, nlev=8, qsize=1)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)
    ref_s, ref_d = caar_xla(st, dv, geom, hv, cfg, 0.1, 1.0)

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("k",))
    put = lambda x, ax: jax.device_put(
        jnp.asarray(x),
        NamedSharding(mesh, P(*[("k" if i == ax else None)
                                for i in range(np.ndim(x))])),
    )
    import dataclasses

    st_s = dataclasses.replace(
        st,
        u=put(st.u, 2), v=put(st.v, 2), t=put(st.t, 2), dp3d=put(st.dp3d, 2),
        qdp=put(st.qdp, 3),
    )
    with mesh:
        out_s, out_d = caar_xla(st_s, dv, geom, hv, cfg, 0.1, 1.0)
    np.testing.assert_allclose(
        np.asarray(out_s.t[cfg.np1]), np.asarray(ref_s.t[cfg.np1]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_d.phi), np.asarray(ref_d.phi), rtol=1e-12, atol=1e-12
    )


def test_replicate_places_on_all_devices():
    """dist.sharding.replicate: every leaf (incl. scalars) fully replicated."""
    from tinman_sandbox_tpu.dist.sharding import make_mesh, replicate

    mesh = make_mesh(4)
    tree = {"a": jnp.arange(12.0).reshape(3, 4), "s": jnp.float32(2.5)}
    out = replicate(mesh, tree)
    for leaf in jax.tree.leaves(out):
        assert leaf.sharding.is_fully_replicated, leaf.sharding
        assert len(leaf.sharding.device_set) == 4
    np.testing.assert_array_equal(np.asarray(out["a"]),
                                  np.arange(12.0).reshape(3, 4))
