"""Explicit-collective (shard_map + psum) DSS vs the segment-sum reference."""
import numpy as np
import jax
import jax.numpy as jnp

from tinman_sandbox_tpu import Config, random_state
from tinman_sandbox_tpu.dist import build_cubed_sphere, dss_sum, make_mesh
from tinman_sandbox_tpu.dist.halo import (
    dss_scaled_halo,
    dss_sum_halo,
    make_dss_plan,
)


def test_plan_perimeter_shrinks_with_shard_size():
    cs4 = build_cubed_sphere(4)
    p8 = make_dss_plan(cs4.gdof, 8)
    p2 = make_dss_plan(cs4.gdof, 2)
    # fewer shards -> fewer cross-shard dofs
    assert p2.n_gshared < p8.n_gshared
    assert 0 < p8.perimeter_fraction < 1


def test_halo_dss_matches_segment_sum():
    cs = build_cubed_sphere(4)           # 96 elements / 8 devices
    mesh = make_mesh(8)
    plan = make_dss_plan(cs.gdof, 8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(cs.nelem, 5, 4, 4)))
    ref = dss_sum(x, jnp.asarray(cs.gdof), cs.ndof)
    with mesh:
        out = dss_sum_halo(x, plan, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)


def test_halo_dss_2d_field():
    cs = build_cubed_sphere(2)
    mesh = make_mesh(8)
    plan = make_dss_plan(cs.gdof, 8)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(cs.nelem, 4, 4)))
    ref = dss_sum(x, jnp.asarray(cs.gdof), cs.ndof)
    with mesh:
        out = dss_sum_halo(x, plan, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-13)


def test_halo_step_matches_segment_sum_step():
    from tinman_sandbox_tpu import analytic_hvcoord, zero_derived
    from tinman_sandbox_tpu.dist import caar_dss_step, shard_problem
    from tinman_sandbox_tpu.kernels import caar_xla
    import dataclasses

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4)
    st = random_state(cfg, seed=8)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)
    g = cs.geometry
    mesh = make_mesh(8)
    plan = make_dss_plan(cs.gdof, 8)

    ref_s, _ = caar_dss_step(st, dv, g, hv, jnp.asarray(cs.gdof), cs.ndof,
                             cfg, 0.5, 1.0)

    # halo-exchange version of the same step
    s1, d1 = caar_xla(st, dv, g, hv, cfg, 0.5, 1.0)
    np1 = cfg.np1
    with mesh:
        out = {
            name: dss_scaled_halo(
                jnp.asarray(getattr(s1, name))[np1], plan, mesh, g.rspheremp
            )
            for name in ("u", "v", "t", "dp3d")
        }
    for name in ("u", "v", "t", "dp3d"):
        np.testing.assert_allclose(
            np.asarray(out[name]),
            np.asarray(getattr(ref_s, name)[np1]),
            rtol=1e-12, atol=1e-12, err_msg=name,
        )


def test_caar_dss_pallas_matches_xla_dss_step():
    from tinman_sandbox_tpu import analytic_hvcoord, zero_derived
    from tinman_sandbox_tpu.dist import caar_dss_step
    from tinman_sandbox_tpu.dist.step_pallas import caar_dss_pallas

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    gdof = jnp.asarray(cs.gdof)

    ref_s, ref_d = caar_dss_step(st, dv, g, hv, gdof, cs.ndof, cfg,
                                 np.float32(0.5), np.float32(1.0))
    out_s, out_d = caar_dss_pallas(st, dv, g, hv, gdof, cs.ndof, cfg,
                                   0.5, 1.0, interpret=True)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(out_s, name)[cfg.np1])
        b = np.asarray(getattr(ref_s, name)[cfg.np1])
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)
    a, b = np.asarray(out_d.omega_p), np.asarray(ref_d.omega_p)
    scale = np.max(np.abs(b)) + 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-6)


def test_ppermute_dss_matches_segment_sum():
    from tinman_sandbox_tpu.dist.halo_ppermute import (
        dss_sum_ppermute, make_ppermute_plan,
    )

    for ne in (3, 4):
        cs = build_cubed_sphere(ne)
        if cs.nelem % 8:
            continue
        mesh = make_mesh(8)
        plan = make_ppermute_plan(cs.gdof, 8)
        assert plan.rounds >= 1
        x = jnp.asarray(
            np.random.default_rng(ne).normal(size=(cs.nelem, 3, 4, 4))
        )
        ref = dss_sum(x, jnp.asarray(cs.gdof), cs.ndof)
        with mesh:
            out = dss_sum_ppermute(x, plan, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)


def test_ppermute_dss_two_shards():
    from tinman_sandbox_tpu.dist.halo_ppermute import (
        dss_sum_ppermute, make_ppermute_plan,
    )

    cs = build_cubed_sphere(3)   # 54 elements / 2 devices
    mesh = make_mesh(2)
    plan = make_ppermute_plan(cs.gdof, 2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(cs.nelem, 4, 4)))
    ref = dss_sum(x, jnp.asarray(cs.gdof), cs.ndof)
    with mesh:
        out = dss_sum_ppermute(x, plan, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_caar_ppermute_step_matches_dss_step():
    from tinman_sandbox_tpu import analytic_hvcoord, zero_derived
    from tinman_sandbox_tpu.dist import (
        caar_dss_step, caar_ppermute_step, make_ppermute_plan, shard_problem,
    )

    cs = build_cubed_sphere(2)          # 24 elements / 8 devices
    cfg = Config(nelem=cs.nelem, nlev=4)
    st = random_state(cfg, seed=8)
    dv = zero_derived(cfg)
    hv = analytic_hvcoord(cfg)
    g = cs.geometry
    mesh = make_mesh(8)
    plan = make_ppermute_plan(cs.gdof, 8)

    ref_s, ref_d = caar_dss_step(st, dv, g, hv, jnp.asarray(cs.gdof),
                                 cs.ndof, cfg, 0.5, 1.0)
    st_s, dv_s, g_s = shard_problem(mesh, st, dv, g)
    with mesh:
        out_s, out_d = caar_ppermute_step(st_s, dv_s, g_s, hv, plan, mesh,
                                          cfg, 0.5, 1.0)
    for name in ("u", "v", "t", "dp3d"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_s, name)[cfg.np1]),
            np.asarray(getattr(ref_s, name)[cfg.np1]),
            rtol=1e-12, atol=1e-12, err_msg=name,
        )


def test_overlap_step_matches_dss_step():
    """Interior/boundary overlap on the ppermute tier == plain
    caar_dss_step (1e-12, f64, 8-device mesh). ne=4 gives every shard both
    interior and boundary elements; ne=2 has empty interior sets
    (exercises the padding)."""
    from tinman_sandbox_tpu import analytic_hvcoord, zero_derived
    from tinman_sandbox_tpu.dist import caar_dss_step, shard_problem
    from tinman_sandbox_tpu.dist.halo_ppermute import make_ppermute_plan
    from tinman_sandbox_tpu.dist.overlap import (
        caar_ppermute_overlap_step, make_overlap_plan,
    )

    for ne in (4, 2):
        cs = build_cubed_sphere(ne)
        cfg = Config(nelem=cs.nelem, nlev=5)
        st = random_state(cfg, seed=21)
        dv = zero_derived(cfg)
        geom = cs.geometry
        hv = analytic_hvcoord(cfg)
        gdof = jnp.asarray(cs.gdof)

        ref_s, ref_d = caar_dss_step(st, dv, geom, hv, gdof, cs.ndof, cfg,
                                     0.3, 1.0)

        mesh = make_mesh(8)
        plan = make_ppermute_plan(cs.gdof, 8)
        oplan = make_overlap_plan(cs.gdof, 8)
        if ne == 4:
            assert oplan.iw.sum() > 0, "ne=4 should have interior elements"
        st_s, dv_s, geom_s = shard_problem(mesh, st, dv, geom)
        with mesh:
            out_s, out_d = caar_ppermute_overlap_step(
                st_s, dv_s, geom_s, hv, plan, oplan, mesh, cfg, 0.3, 1.0,
            )
        for name in ("u", "v", "t", "dp3d"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_s, name)[cfg.np1]),
                np.asarray(getattr(ref_s, name)[cfg.np1]),
                rtol=1e-12, atol=1e-12, err_msg=f"{name} ne={ne}",
            )
        np.testing.assert_allclose(
            np.asarray(out_d.omega_p), np.asarray(ref_d.omega_p),
            rtol=1e-12, atol=1e-12,
        )
