"""Transposed-layout ([nlev, E16]) fused CAAR kernel vs the XLA path."""
import dataclasses

import jax
import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_hvcoord,
    random_geometry,
    random_state,
    zero_derived,
)
from tinman_sandbox_tpu.kernels import caar_xla
from tinman_sandbox_tpu.kernels.caar_pallas_t import caar_pallas_t
from tinman_sandbox_tpu.kernels.layout import pack_field_t, unpack_field_t


def _setup(nelem=16, nlev=12, seed=3, eb=8):
    cfg = Config(nelem=nelem, nlev=nlev, elem_block=eb)
    cast = lambda tree: jax.tree.map(lambda x: np.asarray(x, np.float32), tree)
    st = cast(random_state(cfg, seed=seed))
    dv = cast(zero_derived(cfg))
    geom = cast(random_geometry(cfg, seed=seed + 1))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    return cfg, st, dv, geom, hv


def test_pack_unpack_t_roundtrip():
    x = np.random.default_rng(0).normal(size=(5, 7, 4, 4)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(unpack_field_t(pack_field_t(x), 5)), x
    )
    assert pack_field_t(x).shape == (7, 80)


def _compare(cfg, st, dv, geom, hv, moist, **kw):
    ps, pd = caar_pallas_t(st, dv, geom, hv, cfg, 0.1, 0.5, moist=moist,
                           interpret=True, **kw)
    xs, xd = caar_xla(st, dv, geom, hv, cfg, np.float32(0.1), np.float32(0.5),
                      moist=moist)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(ps, name)[cfg.np1])
        b = np.asarray(getattr(xs, name)[cfg.np1])
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)
    for name in ("vn0_u", "vn0_v", "phi", "omega_p"):
        a = np.asarray(getattr(pd, name))
        b = np.asarray(getattr(xd, name))
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)


def test_caar_pallas_t_matches_xla_moist():
    _compare(*_setup(nelem=16, nlev=12, eb=8), moist=True)


def test_caar_pallas_t_matches_xla_dry():
    _compare(*_setup(nelem=8, nlev=7, eb=4, seed=9), moist=False)


def test_caar_pallas_t_multiblock_eb_variants():
    _compare(*_setup(nelem=6, nlev=9, eb=2, seed=13), moist=True)


def test_pallas_t_rsplit0_matches_xla():
    """rsplit=0 transposed variant: vertical mass flux, vertical advection,
    dp3d interface stencil (on sublanes), eta_dot_dpdn accumulator."""
    cfg, st, dv, geom, hv = _setup(nelem=16, nlev=12, eb=8)
    cfg = dataclasses.replace(cfg, rsplit=0)
    dv = dataclasses.replace(
        dv, eta_dot_dpdn=np.asarray(
            np.random.default_rng(5).normal(
                size=(cfg.nelem, cfg.nlev + 1, 4, 4)), np.float32),
    )
    ref_s, ref_d = caar_xla(st, dv, geom, hv, cfg, 0.5, 0.7)
    out_s, out_d = caar_pallas_t(st, dv, geom, hv, cfg, 0.5, 0.7,
                                 interpret=True)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(out_s, name)[cfg.np1])
        b = np.asarray(getattr(ref_s, name)[cfg.np1])
        scale = np.max(np.abs(b))
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)
    a, b = np.asarray(out_d.eta_dot_dpdn), np.asarray(ref_d.eta_dot_dpdn)
    scale = np.max(np.abs(b)) + 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-6)


def test_t_layout_matches_row_layout_exactly():
    """Both packed layouts run the same fp ops per gridpoint; outputs agree
    to fp-roundoff-tight tolerance (different matmul association order)."""
    from tinman_sandbox_tpu.kernels.caar_pallas import caar_pallas

    cfg, st, dv, geom, hv = _setup(nelem=16, nlev=12, eb=8, seed=42)
    rs, rd = caar_pallas(st, dv, geom, hv, cfg, 0.1, 0.5, interpret=True)
    ts, td = caar_pallas_t(st, dv, geom, hv, cfg, 0.1, 0.5, interpret=True)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(ts, name)[cfg.np1])
        b = np.asarray(getattr(rs, name)[cfg.np1])
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-6,
                                   err_msg=name)


def test_bf16_storage_t_tolerances():
    from tinman_sandbox_tpu.kernels.caar_pallas_t import caar_pallas_t as cpt

    cfg, st, dv, geom, hv = _setup(nelem=16, nlev=12, eb=8)
    ref_s, _ = cpt(st, dv, geom, hv, cfg, 0.5, 1.0, interpret=True,
                   storage="f32")
    for storage, rtol in (("bf16_aux", 1e-4), ("bf16_ro", 1.5e-2)):
        out_s, _ = cpt(st, dv, geom, hv, cfg, 0.5, 1.0, interpret=True,
                       storage=storage)
        for name in ("u", "v", "t", "dp3d"):
            a = np.asarray(getattr(out_s, name)[cfg.np1])
            b = np.asarray(getattr(ref_s, name)[cfg.np1])
            scale = np.max(np.abs(b))
            np.testing.assert_allclose(a / scale, b / scale, atol=rtol,
                                       err_msg=f"{name} {storage}")


def test_run_leapfrog_pallas_t_matches_xla_leapfrog():
    from tinman_sandbox_tpu.kernels.caar_pallas_t import run_leapfrog_pallas_t
    from tinman_sandbox_tpu.timeloop import run_leapfrog

    cfg, st, dv, geom, hv = _setup(nelem=8, nlev=6, eb=4, seed=33)
    cfg = Config(nelem=8, nlev=6, elem_block=4, dt=0.05)
    ps, pd, pc = run_leapfrog_pallas_t(st, dv, geom, hv, cfg, nsteps=7,
                                       interpret=True)
    xs, xd, xc = run_leapfrog(st, dv, geom, hv, cfg, nsteps=7)
    assert (pc.n0, pc.np1, pc.nm1) == (xc.n0, xc.np1, xc.nm1)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(ps, name))
        b = np.asarray(getattr(xs, name))
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=name)
    a, b = np.asarray(pd.omega_p), np.asarray(xd.omega_p)
    scale = np.max(np.abs(b)) + 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)


def test_run_leapfrog_pallas_t_rejects_rsplit0():
    import dataclasses

    import pytest

    from tinman_sandbox_tpu.kernels.caar_pallas_t import run_leapfrog_pallas_t

    cfg, st, dv, geom, hv = _setup(nelem=8, nlev=4, eb=4)
    cfg = dataclasses.replace(cfg, rsplit=0)
    with pytest.raises(NotImplementedError):
        run_leapfrog_pallas_t(st, dv, geom, hv, cfg, 2, interpret=True)


def test_lane_grouped_t4_bitwise_matches_t4():
    """caar_pallas_packed_t4_lg (lg 128-lane groups per grid step, built
    for the ne120 kernel-at-scale ledger) must be BITWISE equal to the
    eb=8 stacked kernel — same per-group math, shorter grid."""
    import jax.numpy as jnp

    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import (
        caar_pallas_packed_t4,
        caar_pallas_packed_t4_lg,
        caar_pallas_packed_t4_rk,
        pack_problem_t,
    )

    cfg, st, dv, geom, hv = _setup(nelem=64, nlev=8, eb=8)
    p = pack_problem_t(st, dv, geom, hv, cfg)
    scal = _scalars(np.float32(0.1), np.float32(1.0), hv)
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    sm1 = jnp.concatenate([p["um1"], p["vm1"], p["tm1"], p["dpm1"]], axis=0)
    com = (scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
           p["meta"])
    tail = (p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])
    ref = caar_pallas_packed_t4(*com, s0, sm1, *tail, eb=8, nlev=8,
                                interpret=True)
    for lg in (2, 4):
        got = caar_pallas_packed_t4_lg(*com, s0, sm1, *tail, nlev=8, lg=lg,
                                       interpret=True)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # single-state mode vs the RK kernel
    ref_rk = caar_pallas_packed_t4_rk(*com, s0, *tail, eb=8, nlev=8,
                                      interpret=True)
    got_rk = caar_pallas_packed_t4_lg(*com, s0, s0, *tail, nlev=8, lg=2,
                                      single=True, interpret=True)
    for a, b in zip(ref_rk, got_rk):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
