"""Structured (gather-free) DSS vs the segment-sum reference on real
cubed-sphere grids."""
import numpy as np
import jax.numpy as jnp
import pytest

from tinman_sandbox_tpu.dist import build_cubed_sphere
from tinman_sandbox_tpu.dist.dss import dss_scaled, dss_sum
from tinman_sandbox_tpu.dist.structured_dss import (
    dss_structured,
    dss_structured_scaled,
    make_structured_plan,
)
from tinman_sandbox_tpu.kernels.layout import pack_field, unpack_field

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("ne", [2, 3, 5])
def test_structured_matches_segment_sum(ne):
    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    nlev = 7
    x = RNG.standard_normal((cs.nelem, nlev, 4, 4))

    ref = dss_sum(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof)
    got = unpack_field(dss_structured(pack_field(jnp.asarray(x)), plan),
                       cs.nelem)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)


def test_structured_scaled_matches_and_projects(ne=4):
    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    nlev = 5
    x = RNG.standard_normal((cs.nelem, nlev, 4, 4))
    rsp_rows = pack_field(
        jnp.broadcast_to(cs.geometry.rspheremp[:, None], (cs.nelem, 1, 4, 4))
    )

    ref = dss_scaled(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof,
                     cs.geometry.rspheremp)
    got = unpack_field(
        dss_structured_scaled(pack_field(jnp.asarray(x)), plan, rsp_rows),
        cs.nelem,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)

    # projection: DSS_scaled(spheremp * continuous) == continuous
    cont = np.asarray(
        dss_scaled(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof,
                   cs.geometry.rspheremp)
    )
    smp = pack_field(
        jnp.broadcast_to(cs.geometry.spheremp[:, None], (cs.nelem, 1, 4, 4))
    )
    proj = unpack_field(
        dss_structured_scaled(smp * pack_field(jnp.asarray(cont)), plan,
                              rsp_rows),
        cs.nelem,
    )
    np.testing.assert_allclose(np.asarray(proj), cont, rtol=1e-12, atol=1e-12)


def test_plan_rejects_wrong_ordering():
    cs = build_cubed_sphere(2)
    bad = np.asarray(cs.gdof).copy()
    bad[[0, 5]] = bad[[5, 0]]        # break the contiguous ordering
    with pytest.raises(AssertionError):
        make_structured_plan(bad, 2)


def test_caar_structured_step_matches_gather_step():
    """Fused kernel + structured DSS == fused kernel + alias-gather DSS,
    for all chunk/stack variants (interpret mode, real ne=2 sphere)."""
    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_pallas_packed, caar_dss_structured_packed, make_packed_dss,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars, pack_problem

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)

    p = pack_problem(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    operands = (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
                p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
                p["um1"], p["vm1"], p["tm1"], p["dpm1"],
                p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])

    gdof_rows, rsp_rows_g = make_packed_dss(cs.gdof, g.rspheremp)
    ref = caar_dss_pallas_packed(*operands, gdof_rows, rsp_rows_g,
                                 eb=4, nlev=4, ndof=cs.ndof, interpret=True)

    plan = make_structured_plan(cs.gdof, 2)
    rsp = pack_field(jnp.broadcast_to(
        jnp.asarray(g.rspheremp)[:, None], (cs.nelem, 1, 4, 4)))
    for chunks in (1, 2):
        for stack in (True, False):
            got = caar_dss_structured_packed(
                *operands, plan, rsp, eb=4, nlev=4, interpret=True,
                chunks=chunks, stack_dss=stack)
            for i in range(8):
                np.testing.assert_allclose(
                    np.asarray(got[i]), np.asarray(ref[i]),
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"field {i} chunks={chunks} stack={stack}")


def test_field_wrappers_match_dss(ne=3):
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.structured_dss import (
        dss_project_structured_field, dss_scaled_structured_field,
    )

    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    g = cs.geometry
    x = RNG.standard_normal((cs.nelem, 4, 2, 4, 4))    # extra tracer axis
    ref = dss_scaled(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof,
                     g.rspheremp)
    got = dss_scaled_structured_field(jnp.asarray(x), plan, g.rspheremp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)

    refp = dss_project(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof,
                       g.spheremp, g.rspheremp)
    gotp = dss_project_structured_field(jnp.asarray(x), plan, g.spheremp,
                                        g.rspheremp)
    np.testing.assert_allclose(np.asarray(gotp), np.asarray(refp),
                               rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("ne", [2, 3, 5])
def test_structured_t_matches_segment_sum(ne):
    from tinman_sandbox_tpu.dist.structured_dss import dss_structured_t
    from tinman_sandbox_tpu.kernels.layout import pack_field_t, unpack_field_t

    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    nlev = 7
    x = RNG.standard_normal((cs.nelem, nlev, 4, 4))

    ref = dss_sum(jnp.asarray(x), jnp.asarray(cs.gdof), cs.ndof)
    got = unpack_field_t(dss_structured_t(pack_field_t(jnp.asarray(x)), plan),
                         cs.nelem)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)


def test_caar_structured_t_step_matches_row_step():
    """Transposed assembled step == row-layout assembled step (interpret
    mode, real ne=2 sphere), both stack variants, plus the full-state
    caar_dss_pallas(dss="structured_t") wrapper vs dss="structured"."""
    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_pallas, caar_dss_structured_packed,
        caar_dss_structured_packed_t,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars, pack_problem
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import unpack_field, unpack_field_t

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, 2)

    p = pack_problem(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp_rows = pack_field(jnp.broadcast_to(
        jnp.asarray(g.rspheremp)[:, None], (cs.nelem, 1, 4, 4)))
    ref = caar_dss_structured_packed(
        scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
        p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
        p["um1"], p["vm1"], p["tm1"], p["dpm1"],
        p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"],
        plan, rsp_rows, eb=4, nlev=4, interpret=True)

    pt = pack_problem_t(st, dv, g, hv, cfg)
    rsp_lanes = rsp_rows.reshape(1, -1)
    for stack in (True, False):
        got = caar_dss_structured_packed_t(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], pt["u0"], pt["v0"], pt["t0"], pt["dp0"],
            pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"],
            pt["qdp"], pt["pecnd"], pt["vn0u"], pt["vn0v"], pt["omg"],
            plan, rsp_lanes, eb=4, nlev=4, interpret=True, stack_dss=stack)
        for i in range(8):
            a = np.asarray(unpack_field_t(got[i], cs.nelem))
            b = np.asarray(unpack_field(ref[i], cs.nelem))
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=f"field {i} stack={stack}")

    # full-state wrapper equivalence
    s_row, d_row = caar_dss_pallas(st, dv, g, hv, cs.gdof, cs.ndof, cfg,
                                   0.5, 1.0, interpret=True,
                                   dss="structured", ne=2)
    s_t, d_t = caar_dss_pallas(st, dv, g, hv, cs.gdof, cs.ndof, cfg,
                               0.5, 1.0, interpret=True,
                               dss="structured_t", ne=2)
    for name in ("u", "v", "t", "dp3d"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_t, name)[cfg.np1]),
            np.asarray(getattr(s_row, name)[cfg.np1]),
            rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("ne", [2, 3, 5])
def test_dss_pallas_t_matches_reference(ne):
    """All three transposed-DSS engines (slice / roll / pallas sweep kernel
    + compact fixup) agree on real cubed-sphere grids."""
    from tinman_sandbox_tpu.dist.structured_dss import (
        dss_structured_scaled_t, dss_structured_t_roll)
    from tinman_sandbox_tpu.kernels.dss_pallas import dss_structured_t_pallas

    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    x = jnp.asarray(RNG.standard_normal((6, cs.nelem * 16)), jnp.float32)
    rsp = jnp.asarray(
        np.asarray(cs.geometry.rspheremp, np.float32).reshape(1, -1))

    ref = np.asarray(dss_structured_scaled_t(x, plan, rsp))
    roll = np.asarray(rsp * dss_structured_t_roll(x, plan))
    pall = np.asarray(dss_structured_t_pallas(x, plan, rsp, interpret=True))
    pall_vdt = np.asarray(dss_structured_t_pallas(x, plan, rsp, vdt=True,
                                                  interpret=True))
    np.testing.assert_allclose(pall_vdt, ref, rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(roll, ref, rtol=2e-6, atol=2e-5)
    np.testing.assert_allclose(pall, ref, rtol=2e-6, atol=2e-5)


def test_caar_structured_t4_matches_t():
    """Stacked-state assembled step (one [4*nlev, E16] buffer, single DSS
    pass) == the per-field transposed assembled step (interpret mode)."""
    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t, caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, 2)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)

    ref = caar_dss_structured_packed_t(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], pt["u0"], pt["v0"], pt["t0"], pt["dp0"],
        pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"],
        pt["qdp"], pt["pecnd"], pt["vn0u"], pt["vn0v"], pt["omg"],
        plan, rsp, eb=4, nlev=4, interpret=True)

    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                          axis=0)
    s1, phi, vn0u, vn0v, omg = caar_dss_structured_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=4, nlev=4, interpret=True)

    k = 4
    for i, name in enumerate(("u", "v", "t", "dp3d")):
        np.testing.assert_allclose(
            np.asarray(s1[i * k:(i + 1) * k]), np.asarray(ref[i]),
            rtol=1e-6, atol=1e-6, err_msg=name)
    for a, b in ((phi, ref[4]), (vn0u, ref[5]), (vn0v, ref[6]),
                 (omg, ref[7])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("ne", [2, 3])
def test_caar_t4_fused_extract_matches_unfused(ne):
    """Producer-fused tile extraction (the CAAR kernel writes the DSS
    fixup's transposed affected-tile slab as a slot-mapped extra output,
    kernels.caar_pallas_t.caar_pallas_packed_t4_ext) is BITWISE equal to
    the separate extract_tiles_t dispatch. ne=2 exercises the fused path
    (elem_block=8, e16 % 128 == 0); ne=3 exercises the silent fallback
    (864 lanes are not 128-aligned)."""
    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    cs = build_cubed_sphere(ne)
    eb = 8 if ne % 2 == 0 else 6   # odd ne: 6*ne*ne*16 is not 128-aligned
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=11))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, ne)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                          axis=0)
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp)
    ref = caar_dss_structured_packed_t4(*args, eb=eb, nlev=4,
                                        fuse_extract=False, interpret=True)
    fused = caar_dss_structured_packed_t4(*args, eb=eb, nlev=4,
                                          fuse_extract=True, interpret=True)
    for a, b, name in zip(fused, ref, ("s1", "phi", "vn0u", "vn0v", "omg")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name

    if ne % 2 == 0:
        # the fused kernel's slab itself matches extract_tiles_t
        from tinman_sandbox_tpu.kernels.caar_pallas_t import (
            caar_pallas_packed_t4, caar_pallas_packed_t4_ext,
        )
        from tinman_sandbox_tpu.kernels.dss_pallas import (
            _fixup_arrays_t, extract_tiles_t, ext_slot_arrays,
        )

        e16 = s0.shape[1]
        sf, nt = ext_slot_arrays(plan, e16 // 128)
        out = caar_pallas_packed_t4_ext(
            *args[:7], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], jnp.asarray(sf),
            nt=nt, nlev=4, interpret=True)
        s1_plain = caar_pallas_packed_t4(
            *args[:7], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"],
            eb=8, nlev=4, interpret=True)[0]
        gtiles = _fixup_arrays_t(plan)[0]
        slab_ref = extract_tiles_t(s1_plain, gtiles, interpret=True)
        assert np.array_equal(np.asarray(out[5]), np.asarray(slab_ref))


def test_hypervis_tracer_fused_extract_matches_unfused():
    """Producer-fused tile extraction in the hyperviscosity Laplacian and
    tracer Euler kernels is bitwise equal to the separate extract dispatch
    (interpret mode, ne=2, elem_block=8)."""
    from tinman_sandbox_tpu.dist.step_pallas import (
        apply_hypervis_packed_t, ssprk3_tracer_packed_t,
    )
    from tinman_sandbox_tpu.kernels.layout import META_COLS, pack_meta_t
    from tinman_sandbox_tpu.kernels.layout import block_derivative_ops
    from tinman_sandbox_tpu.grid import dvv_matrix

    ne = 2
    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    nelem, k = cs.nelem, 4
    e16 = nelem * 16
    rsp = jnp.asarray(
        np.asarray(cs.geometry.rspheremp, np.float32).reshape(1, -1))
    meta = jnp.asarray(pack_meta_t(
        cs.geometry, np.zeros((nelem, 4, 4), np.float32), np.float32))
    dxb, dyb = block_derivative_ops(8, dvv_matrix(np.float32), np.float32)
    dxbt, dybt = jnp.asarray(dxb.T), jnp.asarray(dyb.T)

    uvt = jnp.asarray(RNG.standard_normal((3 * k, e16)), jnp.float32)
    hv_args = (dxbt, dybt, meta, uvt, plan, rsp, 1e-4, 0.5)
    a = apply_hypervis_packed_t(*hv_args, eb=8, nlev=k,
                                fuse_extract=True, interpret=True)
    b = apply_hypervis_packed_t(*hv_args, eb=8, nlev=k,
                                fuse_extract=False, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))

    vu = jnp.asarray(RNG.standard_normal((k, e16)), jnp.float32)
    vv = jnp.asarray(RNG.standard_normal((k, e16)), jnp.float32)
    qdp = jnp.asarray(RNG.uniform(0.1, 1.0, (2 * k, e16)), jnp.float32)
    tr_args = (dxbt, dybt, meta, vu, vv, qdp, plan, rsp, 0.01)
    qa = ssprk3_tracer_packed_t(*tr_args, eb=8, nlev=k,
                                fuse_extract=True, interpret=True)
    qb = ssprk3_tracer_packed_t(*tr_args, eb=8, nlev=k,
                                fuse_extract=False, interpret=True)
    assert np.array_equal(np.asarray(qa), np.asarray(qb))


@pytest.mark.parametrize("eb", [8, 4])
def test_ssprk3_fused_matches_explicit_composition(eb):
    """The fused SSPRK3 (single-state RK kernel, combinations folded into
    the sweep's affine output) matches the explicit composition of generic
    assembled stages + XLA convex combinations to f32 FMA-rounding
    precision (XLA contracts a*x + b*y into fused multiply-adds; measured
    rel-max ~2e-7). eb=8 also exercises the producer-fused extraction;
    eb=4 the fallback."""
    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4, ssprk3_packed_t4,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    ne = 2
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=13))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, ne)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.01, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    acc0 = (pt["vn0u"], pt["vn0v"], pt["omg"])
    consts = (pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
              pt["meta"])
    f = s0.dtype

    def stage(u, b, acc):
        sc = scal.at[0, 1].set(scal[0, 1] * f.type(b))
        return caar_dss_structured_packed_t4(
            sc, *consts, u, u, pt["qdp"], pt["pecnd"], *acc, plan, rsp,
            eb=eb, nlev=4, interpret=True)

    u1, _, *acc = stage(s0, 1.0 / 6.0, acc0)
    u2x, _, *acc = stage(u1, 1.0 / 6.0, acc)
    u2 = f.type(0.75) * s0 + f.type(0.25) * u2x
    u3x, phi_r, *acc = stage(u2, 2.0 / 3.0, acc)
    u3 = f.type(1.0 / 3.0) * s0 + f.type(2.0 / 3.0) * u3x
    ref = (u3, phi_r, *acc)

    got = ssprk3_packed_t4(scal, *consts, s0, pt["qdp"], pt["pecnd"],
                           *acc0, plan, rsp, eb=eb, nlev=4, interpret=True)
    for name, a, b in zip(("s1", "phi", "vn0u", "vn0v", "omg"), got, ref):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        assert rel < 1e-6, (name, rel)


def test_ssprk3_packed_t4_matches_field_rk():
    """Packed-Pallas SSPRK3 (3x fused kernel + Pallas DSS, interpret mode)
    == timeloop.rk.ssprk3_step on a CONTINUOUS initial state."""
    import dataclasses

    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.step_pallas import ssprk3_packed_t4
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import unpack_field_t
    from tinman_sandbox_tpu.timeloop.rk import ssprk3_step

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=12))
    gdof = jnp.asarray(cs.gdof)
    g = cast(cs.geometry)
    # make U0 continuous: P U0 = U0 is the ssprk3_packed_t4 contract
    proj = lambda x: np.asarray(dss_project(
        jnp.asarray(x), gdof, cs.ndof, g.spheremp, g.rspheremp), np.float32)
    n0 = cfg.n0
    su, sv, stt, sdp = (np.array(st.u), np.array(st.v), np.array(st.t),
                        np.array(st.dp3d))
    su[n0], sv[n0] = proj(su[n0]), proj(sv[n0])
    stt[n0], sdp[n0] = proj(stt[n0]), proj(sdp[n0])
    st = dataclasses.replace(st, u=su, v=sv, t=stt, dp3d=sdp)
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    dt = 0.02

    rs, rd = ssprk3_step(st, dv, g, hv, cfg, dt, gdof=gdof, ndof=cs.ndof)

    plan = make_structured_plan(cs.gdof, 2)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(dt, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    s1, phi, vn0u, vn0v, omg = ssprk3_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=4, nlev=4, interpret=True)

    k = 4
    np1 = cfg.np1
    for i, (name, ref) in enumerate(
            (("u", rs.u), ("v", rs.v), ("t", rs.t), ("dp3d", rs.dp3d))):
        got = np.asarray(unpack_field_t(s1[i * k:(i + 1) * k], cfg.nelem))
        np.testing.assert_allclose(got, np.asarray(ref[np1]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    for got, ref in ((phi, rd.phi), (vn0u, rd.vn0_u), (vn0v, rd.vn0_v),
                     (omg, rd.omega_p)):
        np.testing.assert_allclose(
            np.asarray(unpack_field_t(got, cfg.nelem)), np.asarray(ref),
            rtol=2e-4, atol=2e-4)


def test_hypervis_packed_t_matches_field():
    """Packed Pallas biharmonic hyperviscosity (weak-Laplacian kernel +
    Pallas DSS, interpret mode) == timeloop.hyperviscosity on the same
    cubed-sphere state."""
    import dataclasses

    import jax

    from tinman_sandbox_tpu import Config, random_state
    from tinman_sandbox_tpu.dist.step_pallas import apply_hypervis_packed_t
    from tinman_sandbox_tpu.kernels.layout import (
        pack_field_t, pack_meta_t, unpack_field_t, block_derivative_ops,
    )
    from tinman_sandbox_tpu.timeloop.hyperviscosity import (
        apply_hyperviscosity,
    )

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=3))
    g = cast(cs.geometry)
    gdof = jnp.asarray(cs.gdof)
    nu, dt = 2.5e-4, 0.1     # O(1) test scales (real nu ~1e15, dt ~100 s)

    ref = apply_hyperviscosity(st, g, gdof, cs.ndof, cfg, nu=nu, dt=dt,
                               subcycle=2)

    plan = make_structured_plan(cs.gdof, 2)
    np1 = cfg.np1
    dxb, dyb = block_derivative_ops(cfg.elem_block, g.dvv, np.float32)
    meta = jnp.asarray(pack_meta_t(g, st.phis, jnp.float32))
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    uvt = jnp.concatenate([
        pack_field_t(jnp.asarray(st.u[np1], jnp.float32)),
        pack_field_t(jnp.asarray(st.v[np1], jnp.float32)),
        pack_field_t(jnp.asarray(st.t[np1], jnp.float32)),
    ], axis=0)
    out = apply_hypervis_packed_t(
        jnp.asarray(dxb).T, jnp.asarray(dyb).T, meta, uvt, plan, rsp,
        nu, dt, eb=cfg.elem_block, nlev=cfg.nlev, subcycle=2,
        interpret=True)

    k = cfg.nlev
    for i, (name, r) in enumerate(
            (("u", ref.u), ("v", ref.v), ("t", ref.t))):
        got = np.asarray(unpack_field_t(out[i * k:(i + 1) * k], cfg.nelem))
        np.testing.assert_allclose(got, np.asarray(r[np1]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_prim_step_packed_t4_matches_field():
    """Full packed prim cadence (dynamics + hypervis + tracers, interpret
    mode) == timeloop.prim.prim_run_step on a continuous initial state."""
    import dataclasses

    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.step_pallas import prim_step_packed_t4
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import pack_field_t, unpack_field_t
    from tinman_sandbox_tpu.timeloop.prim import prim_run_step

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4, qsize=2, dt=0.02)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=5))
    g = cast(cs.geometry)
    gdof = jnp.asarray(cs.gdof)
    proj = lambda x: np.asarray(dss_project(
        jnp.asarray(x), gdof, cs.ndof, g.spheremp, g.rspheremp), np.float32)
    n0, qn0 = cfg.n0, cfg.qn0
    su, sv, stt, sdp, sq = (np.array(st.u), np.array(st.v), np.array(st.t),
                            np.array(st.dp3d), np.array(st.qdp))
    su[n0], sv[n0] = proj(su[n0]), proj(sv[n0])
    stt[n0], sdp[n0] = proj(stt[n0]), proj(sdp[n0])
    sq[qn0] = proj(sq[qn0])
    st = dataclasses.replace(st, u=su, v=sv, t=stt, dp3d=sdp, qdp=sq)
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    nu = 2.5e-4

    rs, rd, rcfg = prim_run_step(st, dv, g, hv, cfg, gdof, cs.ndof, nu=nu,
                                 qsplit=2)

    plan = make_structured_plan(cs.gdof, 2)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(cfg.dt, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    qdp0 = jnp.concatenate([
        pack_field_t(jnp.asarray(st.qdp[qn0, :, q], jnp.float32))
        for q in range(cfg.qsize)], axis=0)
    s1, qdp1, phi, vn0u, vn0v, omg = prim_step_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, qdp0, pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, nu,
        eb=4, nlev=4, qsplit=2, interpret=True)

    k = cfg.nlev
    np1 = cfg.np1
    for i, (name, ref) in enumerate(
            (("u", rs.u), ("v", rs.v), ("t", rs.t), ("dp3d", rs.dp3d))):
        got = np.asarray(unpack_field_t(s1[i * k:(i + 1) * k], cfg.nelem))
        np.testing.assert_allclose(got, np.asarray(ref[np1]),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
    for q in range(cfg.qsize):
        got = np.asarray(unpack_field_t(qdp1[q * k:(q + 1) * k], cfg.nelem))
        np.testing.assert_allclose(
            got, np.asarray(rs.qdp[1 - qn0, :, q]),
            rtol=5e-4, atol=5e-4, err_msg=f"tracer {q}")
    np.testing.assert_allclose(
        np.asarray(unpack_field_t(phi, cfg.nelem)), np.asarray(rd.phi),
        rtol=5e-4, atol=5e-4)


def test_tracer_packed_t_limit_matches_field():
    """Packed SSPRK3 tracer step WITH the monotone limiter (interpret) ==
    timeloop.tracer.ssprk3_tracer_step(limit=True) on continuous qdp."""
    import jax

    from tinman_sandbox_tpu import Config, random_state
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.step_pallas import ssprk3_tracer_packed_t
    from tinman_sandbox_tpu.kernels.layout import (
        block_derivative_ops, pack_field_t, pack_meta_t, unpack_field_t,
    )
    from tinman_sandbox_tpu.timeloop.tracer import ssprk3_tracer_step

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4, qsize=2)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=9))
    g = cast(cs.geometry)
    gdof = jnp.asarray(cs.gdof)
    qdp = np.asarray(dss_project(jnp.asarray(st.qdp[0]), gdof, cs.ndof,
                                 g.spheremp, g.rspheremp), np.float32)
    vu = np.asarray(st.u[0], np.float32)
    vv = np.asarray(st.v[0], np.float32)
    dt = 0.02

    for limit in (False, True):
        ref = ssprk3_tracer_step(jnp.asarray(qdp), jnp.asarray(vu),
                                 jnp.asarray(vv), g, cfg, dt, gdof=gdof,
                                 ndof=cs.ndof, limit=limit)

        plan = make_structured_plan(cs.gdof, 2)
        dxb, dyb = block_derivative_ops(cfg.elem_block, g.dvv, np.float32)
        meta = jnp.asarray(pack_meta_t(g, st.phis, jnp.float32))
        rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
        q0 = jnp.concatenate([pack_field_t(jnp.asarray(qdp[:, q]))
                              for q in range(cfg.qsize)], axis=0)
        out = ssprk3_tracer_packed_t(
            jnp.asarray(dxb).T, jnp.asarray(dyb).T, meta,
            pack_field_t(jnp.asarray(vu)), pack_field_t(jnp.asarray(vv)),
            q0, plan, rsp, dt, eb=cfg.elem_block, nlev=cfg.nlev,
            limit=limit, interpret=True)
        k = cfg.nlev
        for q in range(cfg.qsize):
            got = np.asarray(unpack_field_t(out[q * k:(q + 1) * k],
                                            cfg.nelem))
            np.testing.assert_allclose(
                got, np.asarray(ref[:, q]), rtol=3e-4, atol=3e-4,
                err_msg=f"tracer {q} limit={limit}")


def test_remap_packed_t4_matches_field():
    """Packed vertical remap == ops.remap.vertical_remap on the same
    state (physically monotone hvcoord)."""
    import dataclasses

    import jax

    from tinman_sandbox_tpu import Config, random_state
    from tinman_sandbox_tpu.dist.step_pallas import remap_packed_t4
    from tinman_sandbox_tpu.grid import HybridVCoord
    from tinman_sandbox_tpu.kernels.layout import pack_field_t, unpack_field_t
    from tinman_sandbox_tpu.ops.remap import vertical_remap

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=6, qsize=2)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=4))
    # physically monotone hybrid levels (increasing interface pressure)
    eta = np.linspace(0.0, 1.0, cfg.nlev + 1, dtype=np.float32)
    hv = HybridVCoord(ps0=np.float32(1000.0),
                      hyai=(0.1 * (1 - eta)).astype(np.float32),
                      hybi=eta.astype(np.float32),
                      hyam=None, hybm=None)
    hv = dataclasses.replace(
        hv, hyam=0.5 * (hv.hyai[:-1] + hv.hyai[1:]),
        hybm=0.5 * (hv.hybi[:-1] + hv.hybi[1:]))
    # positive dp3d at np1
    dp = np.abs(np.asarray(st.dp3d)) + 1.0
    st = dataclasses.replace(st, dp3d=dp.astype(np.float32))

    ref = vertical_remap(st, hv, cfg)

    np1, qn0 = cfg.np1, cfg.qn0
    k = cfg.nlev
    s = jnp.concatenate([pack_field_t(jnp.asarray(getattr(st, n)[np1]))
                         for n in ("u", "v", "t", "dp3d")], axis=0)
    qdp = jnp.concatenate([pack_field_t(jnp.asarray(st.qdp[qn0, :, q]))
                           for q in range(cfg.qsize)], axis=0)
    s2, q2 = remap_packed_t4(s, qdp, hv, nelem=cfg.nelem, nlev=k,
                             qsize=cfg.qsize)

    for i, n in enumerate(("u", "v", "t", "dp3d")):
        got = np.asarray(unpack_field_t(s2[i * k:(i + 1) * k], cfg.nelem))
        np.testing.assert_allclose(got, np.asarray(getattr(ref, n)[np1]),
                                   rtol=2e-5, atol=2e-5, err_msg=n)
    for q in range(cfg.qsize):
        got = np.asarray(unpack_field_t(q2[q * k:(q + 1) * k], cfg.nelem))
        np.testing.assert_allclose(got, np.asarray(ref.qdp[qn0, :, q]),
                                   rtol=2e-5, atol=2e-5)


def test_caar_t4_bf16ro_tolerance():
    """Stacked step with bf16 nm1/qdp/pecnd storage stays within the bf16
    round-off envelope of the f32 path (interpret mode)."""
    import jax

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=4)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, 2)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                          axis=0)

    def run(sm1x, qdpx, pecx):
        return caar_dss_structured_packed_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1x, qdpx, pecx,
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
            eb=4, nlev=4, interpret=True)

    ref = run(sm1, pt["qdp"], pt["pecnd"])
    bf = lambda x: jnp.asarray(x, jnp.bfloat16)
    got = run(bf(sm1), bf(pt["qdp"]), bf(pt["pecnd"]))
    for i in range(5):
        a, b = np.asarray(got[i], np.float64), np.asarray(ref[i], np.float64)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        assert rel < 2e-2, (i, rel)       # bf16 has ~8 mantissa bits
        assert np.isfinite(a).all()


def test_energy_diagnostics_packed_matches_field():
    import jax

    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, \
        zero_derived
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.ops.diagnostics import (
        energy_diagnostics, energy_diagnostics_packed_t,
    )

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=5)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=2))
    g = cast(cs.geometry)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    ref = energy_diagnostics(st, g.spheremp, cfg)

    pt = pack_problem_t(st, cast(zero_derived(cfg)), g, hv, cfg)
    s = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    got = energy_diagnostics_packed_t(s, pt["meta"], nlev=cfg.nlev)
    for kk in ("KE", "IE", "PE", "M"):
        np.testing.assert_allclose(float(got[kk]), float(ref[kk]),
                                   rtol=1e-6, err_msg=kk)


def test_tracer_limit_fused_kernel_matches_field():
    """The FUSED limited tracer path (advection + Shu-Osher combination +
    in-kernel limiter + spheremp + slab extraction in ONE Pallas kernel,
    eb=8 fast path) == timeloop.tracer.ssprk3_tracer_step(limit=True).
    The in-kernel group sums differ from the field path's compensated
    sums at the f32 rounding level, hence the tolerance; tracer MASS
    conservation is gated tightly (the fused limiter's final residual
    pass makes it exact w.r.t. its own functional)."""
    import jax

    from tinman_sandbox_tpu import Config, random_state
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.step_pallas import ssprk3_tracer_packed_t
    from tinman_sandbox_tpu.kernels.layout import (
        block_derivative_ops, pack_field_t, pack_meta_t, unpack_field_t,
    )
    from tinman_sandbox_tpu.timeloop.tracer import ssprk3_tracer_step

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=8, qsize=2)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=9))
    g = cast(cs.geometry)
    gdof = jnp.asarray(cs.gdof)
    qdp = np.asarray(dss_project(jnp.asarray(st.qdp[0]), gdof, cs.ndof,
                                 g.spheremp, g.rspheremp), np.float32)
    vu = np.asarray(st.u[0], np.float32)
    vv = np.asarray(st.v[0], np.float32)
    dt = 0.02

    ref = ssprk3_tracer_step(jnp.asarray(qdp), jnp.asarray(vu),
                             jnp.asarray(vv), g, cfg, dt, gdof=gdof,
                             ndof=cs.ndof, limit=True)

    plan = make_structured_plan(cs.gdof, 2)
    dxb, dyb = block_derivative_ops(cfg.elem_block, g.dvv, np.float32)
    meta = jnp.asarray(pack_meta_t(g, st.phis, jnp.float32))
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    q0 = jnp.concatenate([pack_field_t(jnp.asarray(qdp[:, q]))
                          for q in range(cfg.qsize)], axis=0)
    out = ssprk3_tracer_packed_t(
        jnp.asarray(dxb).T, jnp.asarray(dyb).T, meta,
        pack_field_t(jnp.asarray(vu)), pack_field_t(jnp.asarray(vv)),
        q0, plan, rsp, dt, eb=cfg.elem_block, nlev=cfg.nlev,
        limit=True, interpret=True)
    from tinman_sandbox_tpu.fastpath import last_path

    assert last_path.get("ssprk3_tracer_packed_t(limit)", "").startswith(
        "fused"), last_path
    k = cfg.nlev
    sph = np.asarray(g.spheremp, np.float64)[:, None, None]
    for q in range(cfg.qsize):
        got = np.asarray(unpack_field_t(out[q * k:(q + 1) * k], cfg.nelem))
        np.testing.assert_allclose(
            got, np.asarray(ref[:, q]), rtol=2e-4, atol=2e-4,
            err_msg=f"tracer {q}")
        # tracer-mass conservation of the fused limited step: the
        # projected step conserves sum(sph * qdp) globally
        m_got = float((sph * got.astype(np.float64)).sum())
        m_in = float((sph * np.asarray(qdp[:, q], np.float64)).sum())
        assert abs(m_got / m_in - 1.0) < 2e-6, (q, m_got, m_in)


def test_lane_grouped_assembled_matches_fused():
    """caar_dss_structured_packed_t4(lg>1) (lane-grouped kernel +
    standalone compact extraction) == the eb=8 producer-fused path."""
    import jax

    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.dist.structured_dss import rsp_lanes_2f
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=8, elem_block=8)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st, dv = cast(random_state(cfg, seed=5)), cast(zero_derived(cfg))
    g = cast(cs.geometry)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    plan = make_structured_plan(cs.gdof, 2)
    rsp = jnp.asarray(rsp_lanes_2f(g.spheremp, cs.gdof, cs.ndof))
    scal = _scalars(np.float32(0.1), np.float32(1.0), hv)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                          axis=0)
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp)
    ref = caar_dss_structured_packed_t4(*args, eb=8, nlev=8, interpret=True)
    got = caar_dss_structured_packed_t4(*args, eb=8, nlev=8, lg=3,
                                        interpret=True)
    for name, a, b in zip(("s1", "phi", "vn0u", "vn0v", "omg"), got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_prim_step_lane_grouped_matches_default():
    """prim_step_packed_t4(lg=3) (lane-grouped RK/vlap/tracer kernels +
    standalone compact extraction) == the default fused path on the same
    ne=2 problem (interpret)."""
    import jax

    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
    from tinman_sandbox_tpu.dist.step_pallas import prim_step_packed_t4
    from tinman_sandbox_tpu.dist.structured_dss import rsp_lanes_2f
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    cs = build_cubed_sphere(2)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=8, qsize=2)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st, dv = cast(random_state(cfg, seed=11)), cast(zero_derived(cfg))
    g = cast(cs.geometry)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    plan = make_structured_plan(cs.gdof, 2)
    rsp = jnp.asarray(rsp_lanes_2f(g.spheremp, cs.gdof, cs.ndof))
    scal = _scalars(np.float32(0.02), np.float32(1.0), hv)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    qdp0 = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[cfg.qn0, :, q], jnp.float32))
         for q in range(cfg.qsize)], axis=0)
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, qdp0, pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, 2.5e-4)
    ref = prim_step_packed_t4(*args, eb=8, nlev=4, qsplit=1,
                              interpret=True)
    got = prim_step_packed_t4(*args, eb=8, nlev=4, qsplit=1, lg=3,
                              interpret=True)
    for name, a, b in zip(("s1", "qdp", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
