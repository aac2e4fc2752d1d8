"""Fused Pallas CAAR kernel (interpret mode on CPU) vs the XLA path / oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_hvcoord,
    random_geometry,
    random_state,
    zero_derived,
)
from tinman_sandbox_tpu.kernels import caar_xla
from tinman_sandbox_tpu.kernels.caar_pallas import caar_pallas
from tinman_sandbox_tpu.kernels.layout import (
    block_derivative_ops,
    pack_field,
    scan_matrices,
    unpack_field,
)


def _setup(nelem=16, nlev=12, seed=3, eb=8):
    cfg = Config(nelem=nelem, nlev=nlev, elem_block=eb)
    cast = lambda tree: jax.tree.map(lambda x: np.asarray(x, np.float32), tree)
    st = cast(random_state(cfg, seed=seed))
    dv = cast(zero_derived(cfg))
    geom = cast(random_geometry(cfg, seed=seed + 1))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    return cfg, st, dv, geom, hv


def test_pack_unpack_roundtrip():
    x = np.random.default_rng(0).normal(size=(5, 7, 4, 4)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(unpack_field(pack_field(x), 5)), x)


def test_block_derivative_ops_match_einsum():
    from tinman_sandbox_tpu.grid import dvv_matrix
    from tinman_sandbox_tpu.ops.sphere import _dx, _dy

    dvv = dvv_matrix(np.float32)
    dxb, dyb = block_derivative_ops(2, dvv, np.float32)
    x = np.random.default_rng(1).normal(size=(2, 6, 4, 4)).astype(np.float32)
    packed = np.asarray(pack_field(x))          # [32, 6]
    np.testing.assert_allclose(
        np.asarray(unpack_field(jnp.asarray(dxb @ packed), 2)),
        np.asarray(_dx(jnp.asarray(dvv), jnp.asarray(x))),
        rtol=2e-6, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(unpack_field(jnp.asarray(dyb @ packed), 2)),
        np.asarray(_dy(jnp.asarray(dvv), jnp.asarray(x))),
        rtol=2e-6, atol=2e-6,
    )


def test_scan_matrices():
    a_inc, a_str, b_str = scan_matrices(5, np.float64)
    x = np.random.default_rng(2).normal(size=(3, 5))
    np.testing.assert_allclose(x @ a_inc, np.cumsum(x, axis=1), atol=1e-12)
    np.testing.assert_allclose(
        x @ a_str, np.cumsum(x, axis=1) - x, atol=1e-12
    )
    rev = np.cumsum(x[:, ::-1], axis=1)[:, ::-1] - x
    np.testing.assert_allclose(x @ b_str, rev, atol=1e-12)


def _compare(cfg, st, dv, geom, hv, moist):
    ps, pd = caar_pallas(st, dv, geom, hv, cfg, 0.1, 0.5, moist=moist,
                         interpret=True)
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


def test_caar_pallas_matches_xla_moist():
    _compare(*_setup(nelem=16, nlev=12, eb=8), moist=True)


def test_caar_pallas_matches_xla_dry():
    _compare(*_setup(nelem=8, nlev=7, eb=4, seed=9), moist=False)


def test_caar_pallas_multiblock_eb_variants():
    # nelem not a multiple of 128 sublanes; several blocks; eb=2
    _compare(*_setup(nelem=6, nlev=9, eb=2, seed=13), moist=True)


def test_benchmark_loop_pallas_matches_xla_loop():
    from tinman_sandbox_tpu.kernels.caar_pallas import benchmark_loop_pallas
    from tinman_sandbox_tpu.timeloop import benchmark_loop

    cfg, st, dv, geom, hv = _setup(nelem=8, nlev=6, eb=4, seed=21)
    # interpret mode is driven through the packed kernel; on CPU tests the
    # pallas_call inside jit runs interpreted only if requested -> use 2 steps
    import tinman_sandbox_tpu.kernels.caar_pallas as cp

    orig = cp.caar_pallas_packed
    try:
        cp.caar_pallas_packed = lambda *a, **k: orig(
            *a, **{**k, "interpret": True}
        )
        ps, pd = benchmark_loop_pallas(st, dv, geom, hv, cfg,
                                       np.float32(0.05), np.float32(1.0),
                                       nsteps=2)
    finally:
        cp.caar_pallas_packed = orig
    xs, xd = benchmark_loop(st, dv, geom, hv, cfg, np.float32(0.05),
                            np.float32(1.0), nsteps=2)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(ps, name)[cfg.np1])
        b = np.asarray(getattr(xs, name)[cfg.np1])
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)
    a, b = np.asarray(pd.omega_p), np.asarray(xd.omega_p)
    scale = np.max(np.abs(b)) + 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-6)


def test_run_leapfrog_pallas_matches_xla_leapfrog():
    import jax.numpy as jnp
    from tinman_sandbox_tpu.kernels.caar_pallas import run_leapfrog_pallas
    from tinman_sandbox_tpu.timeloop import run_leapfrog

    cfg, st, dv, geom, hv = _setup(nelem=8, nlev=6, eb=4, seed=33)
    cfg = Config(nelem=8, nlev=6, elem_block=4, dt=0.05)
    ps, pd, pc = run_leapfrog_pallas(st, dv, geom, hv, cfg, nsteps=3,
                                     interpret=True)
    xs, xd, xc = run_leapfrog(st, dv, geom, hv, cfg, nsteps=3)
    assert (pc.n0, pc.np1, pc.nm1) == (xc.n0, xc.np1, xc.nm1)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(ps, name))
        b = np.asarray(getattr(xs, name))
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=name)
    a, b = np.asarray(pd.omega_p), np.asarray(xd.omega_p)
    scale = np.max(np.abs(b)) + 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


def test_run_leapfrog_pallas_chunked_matches_unchunked():
    from tinman_sandbox_tpu.kernels.caar_pallas import run_leapfrog_pallas

    cfg, st, dv, geom, hv = _setup(nelem=8, nlev=6, eb=4, seed=51)
    cfg = Config(nelem=8, nlev=6, elem_block=4, dt=0.02)
    # interpret path is per-step; compare 7 steps (2 full cycles + 1 tail)
    # against the XLA leapfrog to cover the chunk boundary logic
    from tinman_sandbox_tpu.timeloop import run_leapfrog

    ps, pd, pc = run_leapfrog_pallas(st, dv, geom, hv, cfg, nsteps=7,
                                     interpret=True)
    xs, xd, xc = run_leapfrog(st, dv, geom, hv, cfg, nsteps=7)
    assert (pc.n0, pc.np1, pc.nm1) == (xc.n0, xc.np1, xc.nm1)
    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(ps, name))
        b = np.asarray(getattr(xs, name))
        scale = np.max(np.abs(b)) + 1.0
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=name)


def test_pallas_rsplit0_matches_xla():
    """The rsplit=0 (full eta-coordinate) kernel variant matches caar_xla:
    vertical mass flux, vertical advection tendencies, dp3d interface-flux
    stencil, and the eta_dot_dpdn accumulator."""
    import dataclasses

    from tinman_sandbox_tpu.kernels.caar_pallas import caar_pallas
    from tinman_sandbox_tpu.kernels.caar_xla import caar_xla

    cfg, st, dv, geom, hv = _setup(nelem=16, nlev=12, eb=8)
    cfg = dataclasses.replace(cfg, rsplit=0)
    dv = dataclasses.replace(
        dv, eta_dot_dpdn=np.asarray(
            np.random.default_rng(5).normal(
                size=(cfg.nelem, cfg.nlev + 1, 4, 4)), np.float32),
    )
    ref_s, ref_d = caar_xla(st, dv, geom, hv, cfg, 0.5, 0.7)
    out_s, out_d = caar_pallas(st, dv, geom, hv, cfg, 0.5, 0.7,
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


def test_packed_loops_reject_rsplit0():
    """The packed benchmark/leapfrog loops stay rsplit>0-only and must
    fail loudly."""
    import dataclasses

    import pytest

    from tinman_sandbox_tpu.kernels.caar_pallas import run_leapfrog_pallas

    cfg, st, dv, geom, hv = _setup(nelem=8, nlev=4, eb=4)
    cfg = dataclasses.replace(cfg, rsplit=0)
    with pytest.raises(NotImplementedError):
        run_leapfrog_pallas(st, dv, geom, hv, cfg, 2, interpret=True)


def test_bf16_storage_tolerances():
    """Mixed-precision HBM storage (pack_problem storage=): compute stays
    f32, read-only operands stored bf16. Documented tolerances vs the f32
    path: bf16_aux (qdp+pecnd) ~1e-4 relative; bf16_ro (+nm1 fields)
    ~=bf16 mantissa on the state, ~1e-2 relative."""
    from tinman_sandbox_tpu.kernels.caar_pallas import caar_pallas

    cfg, st, dv, geom, hv = _setup(nelem=16, nlev=12, eb=8)
    ref_s, ref_d = caar_pallas(st, dv, geom, hv, cfg, 0.5, 1.0,
                               interpret=True, storage="f32")
    for storage, rtol in (("bf16_aux", 1e-4), ("bf16_ro", 1.5e-2)):
        out_s, out_d = caar_pallas(st, dv, geom, hv, cfg, 0.5, 1.0,
                                   interpret=True, storage=storage)
        for name in ("u", "v", "t", "dp3d"):
            a = np.asarray(getattr(out_s, name)[cfg.np1])
            b = np.asarray(getattr(ref_s, name)[cfg.np1])
            scale = np.max(np.abs(b))
            np.testing.assert_allclose(a / scale, b / scale, atol=rtol,
                                       err_msg=f"{name} {storage}")
