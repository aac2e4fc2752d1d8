"""Face-sharded packed assembled step == single-device packed step.

The multi-chip fast path (dist/sharded_t4.py) must reproduce the
single-chip stacked-state assembled step exactly (same kernels, the only
difference is the all-gathered compact line exchange)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinman_sandbox_tpu import (
    Config, analytic_hvcoord, random_state, zero_derived,
)
from tinman_sandbox_tpu.dist import build_cubed_sphere
from tinman_sandbox_tpu.dist.sharded_t4 import (
    caar_dss_sharded_t4, make_face_mesh,
)
from tinman_sandbox_tpu.dist.step_pallas import caar_dss_structured_packed_t4
from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t


def _setup(ne, nlev, eb):
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=nlev, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
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
    return cs, cfg, plan, pt, scal, rsp, s0, sm1


@pytest.mark.parametrize("ne,nshards,eb", [
    (2, 6, 4), (4, 3, 4), (4, 2, 4),
    (4, 3, 8), (4, 2, 8),   # eb=8: producer-fused tile extraction
])
def test_sharded_t4_matches_single_device(ne, nshards, eb):
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=eb)

    ref = caar_dss_structured_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=eb, nlev=4, interpret=True)

    mesh = make_face_mesh(n=nshards)
    with mesh:
        got = caar_dss_sharded_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh,
            eb=eb, nlev=4, interpret=True)

    names = ("assembled", "phi", "vn0u", "vn0v", "omg")
    for name, a, b in zip(names, got, (ref[0],) + tuple(ref[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


from tinman_sandbox_tpu.dist.banded_t4 import caar_dss_banded_t4
from jax.sharding import Mesh


@pytest.mark.parametrize("ne,m,nshards,eb", [
    (4, 2, 2, 4), (4, 2, 4, 4), (4, 2, 6, 4), (8, 4, 8, 4),
    (4, 2, 4, 8), (8, 4, 8, 8),   # eb=8: producer-fused tile extraction
])
def test_banded_t4_matches_single_device(ne, m, nshards, eb):
    """Band-sharded step (element-row bands, halo-row ppermute + compact
    line all_gather) == single-device packed step."""
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=eb)

    ref = caar_dss_structured_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=eb, nlev=4, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    with mesh:
        got = caar_dss_banded_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m,
            eb=eb, nlev=4, interpret=True)

    names = ("assembled", "phi", "vn0u", "vn0v", "omg")
    for name, a, b in zip(names, got, (ref[0],) + tuple(ref[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("eb", [4, 8])
def test_prim_banded_matches_packed(eb):
    """Band-sharded FULL prim cadence == single-device packed cadence
    (eb=8 exercises the producer-fused extraction in every stage)."""
    nshards, ne, m = 4, 4, 2
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    import dataclasses

    from tinman_sandbox_tpu import analytic_hvcoord, random_state, \
        zero_derived
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.prim_banded import prim_step_banded_t4
    from tinman_sandbox_tpu.dist.step_pallas import prim_step_packed_t4
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=4, elem_block=eb, qsize=2, dt=0.02)
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

    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    plan = make_structured_plan(cs.gdof, ne)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(cfg.dt, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    qdp0 = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[qn0, :, q], jnp.float32))
         for q in range(cfg.qsize)], axis=0)
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, qdp0, pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp)

    ref = prim_step_packed_t4(*args, nu, eb=eb, nlev=4, qsplit=2,
                              interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    with mesh:
        got = prim_step_banded_t4(*args, mesh, m, nu, eb=eb, nlev=4,
                                  qsplit=2, interpret=True)

    for name, a, b in zip(("s1", "qdp", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("ne,m,nshards,lg", [
    (4, 2, 2, 6), (4, 2, 4, 3), (8, 4, 8, 6),
])
def test_banded_t4_lg_bitwise_vs_eb8(ne, m, nshards, lg):
    """The lane-grouped banded shard body (round-5: per-shard lg kernels +
    super-block slot slab) must be BITWISE equal to the eb=8 fused path it
    replaces, at N=2/4/8 on the CPU mesh."""
    from tinman_sandbox_tpu import fastpath

    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=8)
    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m)
    with mesh:
        ref = caar_dss_banded_t4(*args, eb=8, nlev=4, lg=1, interpret=True)
        got = caar_dss_banded_t4(*args, eb=8, nlev=4, lg=lg, interpret=True)
    assert fastpath.last_path["caar_dss_banded_t4"] == \
        f"fused-lg{lg}-compact"
    for name, a, b in zip(("assembled", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"banded lg {name} vs eb8: {err}"
    # lg=0 auto-picks the largest admissible width per shard
    from tinman_sandbox_tpu.dist.banded_t4 import pick_lg

    nblocks = s0.shape[1] // nshards // 128
    auto = caar_dss_banded_t4(*args, eb=8, nlev=4, lg=0, interpret=True)
    assert fastpath.last_path["caar_dss_banded_t4"] == \
        f"fused-lg{pick_lg(nblocks)}-compact"
    err = float(np.max(np.abs(np.asarray(auto[0]) - np.asarray(ref[0]))))
    assert err == 0.0


def test_prim_banded_lg_bitwise_vs_eb8():
    """The FULL band-sharded prim cadence with per-shard lane-grouping
    (dynamics + hypervis + tracer all lg) is bitwise equal to the dense
    eb=8 fused cadence."""
    from tinman_sandbox_tpu import fastpath

    nshards, ne, m = 4, 4, 2
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    from tinman_sandbox_tpu.dist.prim_banded import prim_step_banded_t4
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=8)
    qn0 = 0
    from tinman_sandbox_tpu import Config, random_state

    cfg2 = Config(nelem=cs.nelem, nlev=4, elem_block=8, qsize=2)
    st = jax.tree.map(lambda x: np.asarray(x, np.float32),
                      random_state(cfg2, seed=5))
    qdp0 = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[qn0, :, q], jnp.float32))
         for q in range(2)], axis=0)
    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, qdp0, pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m, 2.5e-4)
    with mesh:
        ref = prim_step_banded_t4(*args, eb=8, nlev=4, qsplit=1, lg=1,
                                  interpret=True)
        got = prim_step_banded_t4(*args, eb=8, nlev=4, qsplit=1, lg=3,
                                  interpret=True)
    assert fastpath.last_path["prim_banded_t4"] == "fused-lg3-compact"
    for name, a, b in zip(("s1", "qdp", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"banded prim lg {name} vs eb8: {err}"


def test_sharded_t4_lg_bitwise_vs_eb8():
    """The face-sharded shard body with per-shard lane-grouping is
    bitwise equal to its dense eb=8 fused path (fps=3 shards)."""
    from tinman_sandbox_tpu import fastpath

    nshards = 2
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(4, nlev=4, eb=8)
    mesh = make_face_mesh(n=nshards)
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh)
    with mesh:
        ref = caar_dss_sharded_t4(*args, eb=8, nlev=4, lg=1, interpret=True)
        got = caar_dss_sharded_t4(*args, eb=8, nlev=4, lg=6, interpret=True)
    assert fastpath.last_path["caar_dss_sharded_t4"] == "fused-lg6-compact"
    for name, a, b in zip(("assembled", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"sharded lg {name} vs eb8: {err}"


def test_banded_vmem_ne120_scale():
    """ne120-class band decompositions fit the sweep kernel's VMEM model
    (ROADMAP round-3: pod-slice numbers are unavailable, so the fit is
    proven from the kernel's own block accounting), and inadmissible
    decompositions raise."""
    from tinman_sandbox_tpu.dist.banded_t4 import banded_vmem_report

    # plausible pod-slice shapes for ne=120, nlev=72, qsize=35 (the
    # reference's tracer-heavy config, level_vectorized config.h.in)
    for m, N in [(2, 12), (4, 8), (4, 24), (12, 24), (30, 36), (60, 72)]:
        r = banded_vmem_report(120, m, N, nlev=72, qsize=35)
        assert r["fits"], r
        assert r["per_stage"]["dynamics"]["bk"] % 8 == 0
        assert r["lanes_per_shard"] * N == 6 * 120 * 120 * 16
        # every chunk's extended block is 128-lane aligned when multi-chunk
        assert r["cps"] == 1 or r["bl"] % 128 == 0

    # the single-chip ne120 face block (nf=1) also fits — cross-check the
    # same model against the face-sharded path's largest lane block
    from tinman_sandbox_tpu.kernels.dss_pallas import (
        SWEEP_VMEM_CAP, fit_block_k, sweep_vmem_bytes,
    )
    face = 120 * 120 * 16
    bk = fit_block_k(4 * 72, face, 16)
    assert sweep_vmem_bytes(bk, face) <= SWEEP_VMEM_CAP

    # inadmissible: multi-chunk without 128-aligned band lanes
    with pytest.raises(AssertionError):
        banded_vmem_report(12, 4, 8, nlev=4)     # bl=576, cps=3
    with pytest.raises(AssertionError):
        banded_vmem_report(120, 7, 6, nlev=72)   # m does not divide ne


@pytest.mark.parametrize("ne,m,nshards,eb", [(16, 4, 8, 4)])
def test_banded_t4_multichunk_scale(ne, m, nshards, eb):
    """cps=3 band chunks per shard at a larger grid (1536 elements) — the
    decomposition shape an ne120 pod slice would use, at test scale."""
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=eb)

    ref = caar_dss_structured_packed_t4(
        scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
        pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
        pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
        eb=eb, nlev=4, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    with mesh:
        got = caar_dss_banded_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m,
            eb=eb, nlev=4, interpret=True)

    names = ("assembled", "phi", "vn0u", "vn0v", "omg")
    for name, a, b in zip(names, got, (ref[0],) + tuple(ref[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_packed_cadence_soak():
    """50-step soak of the fused packed cadence (dynamics + hypervis +
    limited tracers + remap cadence) on a real ne=2 sphere: finite state,
    mass conserved through every stage."""
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "examples", "packed_cadence.py"),
         "--ne", "2",
         "--nlev", "6", "--steps", "50", "--cpu", "--qsplit", "1",
         "--rsplit", "5"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "finite=True" in r.stdout


@pytest.mark.parametrize("ne,m,nshards", [(4, 2, 4), (8, 4, 8)])
def test_banded_t4_overlap_bitwise(ne, m, nshards):
    """The OVERLAPPED banded step (merge-free sweep + in-place fix-tile
    patch; the line collectives feed only the patch, so XLA hides them
    behind the sweep — SCALING_MODEL.md claim 2) is BITWISE equal to the
    fused merged path."""
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=8)
    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m)
    with mesh:
        ref = caar_dss_banded_t4(*args, eb=8, nlev=4, interpret=True)
        got = caar_dss_banded_t4(*args, eb=8, nlev=4, overlap=True,
                                 interpret=True)
    for name, a, b in zip(("assembled", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"banded overlap {name}: {err}"


def test_prim_banded_overlap_bitwise():
    """The FULL band-sharded prim cadence with the overlapped DSS
    decomposition in every stage (dynamics mix, in-place hypervis
    update, tracer mix) is bitwise equal to the merged cadence."""
    nshards, ne, m = 4, 4, 2
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    from tinman_sandbox_tpu import Config, random_state
    from tinman_sandbox_tpu.dist.prim_banded import prim_step_banded_t4
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=8)
    cfg2 = Config(nelem=cs.nelem, nlev=4, elem_block=8, qsize=2)
    st = jax.tree.map(lambda x: np.asarray(x, np.float32),
                      random_state(cfg2, seed=5))
    qdp0 = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[0, :, q], jnp.float32))
         for q in range(2)], axis=0)
    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, qdp0, pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m, 2.5e-4)
    with mesh:
        ref = prim_step_banded_t4(*args, eb=8, nlev=4, qsplit=1,
                                  interpret=True)
        got = prim_step_banded_t4(*args, eb=8, nlev=4, qsplit=1,
                                  overlap=True, interpret=True)
    for name, a, b in zip(("s1", "qdp", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"banded prim overlap {name}: {err}"


@pytest.mark.parametrize("nshards", [2, 3])
def test_sharded_t4_overlap_bitwise(nshards):
    """The OVERLAPPED face-sharded step (merge-free face sweep +
    in-place fix-tile patch) is bitwise equal to the fused merged path."""
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(4, nlev=4, eb=8)
    mesh = make_face_mesh(n=nshards)
    args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh)
    with mesh:
        ref = caar_dss_sharded_t4(*args, eb=8, nlev=4, interpret=True)
        got = caar_dss_sharded_t4(*args, eb=8, nlev=4, overlap=True,
                                  interpret=True)
    for name, a, b in zip(("assembled", "phi", "vn0u", "vn0v", "omg"),
                          got, ref):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"face-sharded overlap {name}: {err}"


def test_prim_banded_chained_soak():
    """10 CHAINED steps of the band-sharded prim cadence (lane-grouped
    shard bodies) stay bitwise equal to the single-device packed chain —
    slab/slot bookkeeping must hold under state reuse, not just one
    step."""
    nshards, ne, m, nsteps = 4, 4, 2, 10
    if len(jax.devices()) < nshards:
        pytest.skip("needs %d devices" % nshards)
    from tinman_sandbox_tpu import Config, random_state
    from tinman_sandbox_tpu.dist.prim_banded import prim_step_banded_t4
    from tinman_sandbox_tpu.dist.step_pallas import prim_step_packed_t4
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    cs, cfg, plan, pt, scal, rsp, s0, sm1 = _setup(ne, nlev=4, eb=8)
    cfg2 = Config(nelem=cs.nelem, nlev=4, elem_block=8, qsize=2)
    st = jax.tree.map(lambda x: np.asarray(x, np.float32),
                      random_state(cfg2, seed=5))
    qdp0 = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[0, :, q], jnp.float32))
         for q in range(2)], axis=0)
    mesh = Mesh(np.asarray(jax.devices()[:nshards]), ("e",))
    base = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"])
    acc = (pt["vn0u"], pt["vn0v"], pt["omg"])

    s_a, q_a, acc_a = s0, qdp0, acc
    s_b, q_b, acc_b = s0, qdp0, acc
    with mesh:
        for _ in range(nsteps):
            s_a, q_a, _, *acc_a = prim_step_banded_t4(
                *base, s_a, q_a, pt["pecnd"], *acc_a, plan, rsp, mesh, m,
                2.5e-4, eb=8, nlev=4, qsplit=1, interpret=True)
            s_b, q_b, _, *acc_b = prim_step_packed_t4(
                *base, s_b, q_b, pt["pecnd"], *acc_b, plan, rsp,
                2.5e-4, eb=8, nlev=4, qsplit=1, interpret=True)
    for name, a, b in (("s", s_a, s_b), ("qdp", q_a, q_b)):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert err == 0.0, f"chained banded {name} step-{nsteps}: {err}"
    assert np.isfinite(np.asarray(s_a)).all()
