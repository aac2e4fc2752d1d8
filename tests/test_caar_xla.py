"""The jitted XLA CAAR must match the f64 oracle (and hence the golden gate)."""
import jax
import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_derived,
    analytic_geometry,
    analytic_hvcoord,
    analytic_state,
    random_geometry,
    random_state,
    zero_derived,
)
from tinman_sandbox_tpu.golden import golden_caar
from tinman_sandbox_tpu.kernels import caar_xla
from tinman_sandbox_tpu.ref import caar_ref


def _to_jax(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def test_caar_xla_matches_oracle_analytic():
    cfg = Config(nelem=3, nlev=72)
    st, dv = analytic_state(cfg), analytic_derived(cfg)
    geom, hv = analytic_geometry(cfg), analytic_hvcoord(cfg)

    ref_s, ref_d = caar_ref(st, dv, geom, hv, cfg, dt2=1.0, eta_ave_w=1.0)
    xla_s, xla_d = caar_xla(st, dv, geom, hv, cfg, 1.0, 1.0)

    for name in ("u", "v", "t", "dp3d"):
        a = np.asarray(getattr(xla_s, name)[cfg.np1])
        b = np.asarray(getattr(ref_s, name)[cfg.np1])
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10, err_msg=name)
    for name in ("vn0_u", "vn0_v", "phi", "omega_p"):
        np.testing.assert_allclose(
            np.asarray(getattr(xla_d, name)),
            np.asarray(getattr(ref_d, name)),
            rtol=1e-10, atol=1e-12, err_msg=name,
        )


def test_caar_xla_passes_golden_gate():
    cfg = Config(nelem=3, nlev=72)
    st, dv = analytic_state(cfg), analytic_derived(cfg)
    geom, hv = analytic_geometry(cfg), analytic_hvcoord(cfg)
    xla_s, _ = caar_xla(st, dv, geom, hv, cfg, 1.0, 1.0)
    gold = golden_caar()
    assert np.max(np.abs(np.asarray(xla_s.t[cfg.np1, 0]) - gold["T"])) < 1e-6
    assert np.max(np.abs(np.asarray(xla_s.u[cfg.np1, 0]) - gold["v1"])) < 1e-5
    assert np.max(np.abs(np.asarray(xla_s.v[cfg.np1, 0]) - gold["v2"])) < 1e-5


def test_caar_xla_matches_oracle_random():
    cfg = Config(nelem=5, nlev=13)
    st = random_state(cfg, seed=11)
    dv = zero_derived(cfg)
    geom = random_geometry(cfg, seed=12)
    hv_cfg = analytic_hvcoord(cfg)

    ref_s, _ = caar_ref(st, dv, geom, hv_cfg, cfg, dt2=0.5, eta_ave_w=0.25)
    xla_s, _ = caar_xla(st, dv, geom, hv_cfg, cfg, 0.5, 0.25)
    for name in ("u", "v", "t", "dp3d"):
        np.testing.assert_allclose(
            np.asarray(getattr(xla_s, name)[cfg.np1]),
            np.asarray(getattr(ref_s, name)[cfg.np1]),
            rtol=1e-9, atol=1e-10, err_msg=name,
        )


def test_caar_xla_dry_path():
    cfg = Config(nelem=2, nlev=8)
    st = random_state(cfg, seed=2)
    dv = zero_derived(cfg)
    geom = random_geometry(cfg, seed=3)
    hv = analytic_hvcoord(cfg)
    ref_s, _ = caar_ref(st, dv, geom, hv, cfg, moist=False)
    xla_s, _ = caar_xla(st, dv, geom, hv, cfg, 1.0, 1.0, moist=False)
    np.testing.assert_allclose(
        np.asarray(xla_s.t[cfg.np1]), np.asarray(ref_s.t[cfg.np1]), rtol=1e-10
    )
