"""rsplit=0 (eta-coordinate) path: eta_dot_dpdn, preq_vertadv, full CAAR."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_hvcoord,
    random_geometry,
    random_state,
    zero_derived,
)
from tinman_sandbox_tpu.grid import HybridVCoord
from tinman_sandbox_tpu.kernels import caar_xla
from tinman_sandbox_tpu.ops import eta_dot_dpdn_rsplit0, preq_vertadv


def _hv_with_hybi(cfg):
    """hvcoord with a nontrivial hybi ramp (the analytic one has hybi=0)."""
    hv = analytic_hvcoord(cfg)
    hybi = np.linspace(0.0, 1.0, cfg.nlev + 1)
    return HybridVCoord(ps0=hv.ps0, hyai=hv.hyai, hybi=hybi,
                        hyam=hv.hyam, hybm=0.5 * (hybi[:-1] + hybi[1:]))


def test_eta_dot_dpdn_reference_loop():
    rng = np.random.default_rng(0)
    nlev = 7
    divdp = rng.normal(size=(3, nlev, 4, 4))
    hybi = np.linspace(0.0, 1.0, nlev + 1) ** 1.5
    eta, sdot = eta_dot_dpdn_rsplit0(jnp.asarray(divdp), hybi)
    eta = np.asarray(eta)
    # scalar transliteration of routine_extracted.F90:224-254
    expect = np.zeros((3, nlev + 1, 4, 4))
    for e in range(3):
        for i in range(4):
            for j in range(4):
                s = 0.0
                for k in range(nlev):
                    s += divdp[e, k, i, j]
                    expect[e, k + 1, i, j] = s
                for k in range(nlev):
                    expect[e, k + 1, i, j] = (
                        hybi[k + 1] * s - expect[e, k + 1, i, j]
                    )
                expect[e, 0, i, j] = 0.0
                expect[e, nlev, i, j] = 0.0
    np.testing.assert_allclose(eta, expect, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sdot)[:, 0], divdp.sum(axis=1), rtol=1e-12
    )


def test_preq_vertadv_reference_stencil():
    rng = np.random.default_rng(1)
    nlev = 6
    t = rng.normal(size=(2, nlev, 4, 4))
    u = rng.normal(size=(2, nlev, 4, 4))
    v = rng.normal(size=(2, nlev, 4, 4))
    eta = rng.normal(size=(2, nlev + 1, 4, 4))
    rpdel = rng.uniform(0.5, 2.0, size=(2, nlev, 4, 4))
    tv, uv, vv = preq_vertadv(
        jnp.asarray(t), jnp.asarray(u), jnp.asarray(v), jnp.asarray(eta),
        jnp.asarray(rpdel),
    )

    def ref(x):
        out = np.zeros_like(x)
        for e in range(2):
            for i in range(4):
                for j in range(4):
                    facp = 0.5 * rpdel[e, 0, i, j] * eta[e, 1, i, j]
                    out[e, 0, i, j] = facp * (x[e, 1, i, j] - x[e, 0, i, j])
                    for k in range(1, nlev - 1):
                        facp = 0.5 * rpdel[e, k, i, j] * eta[e, k + 1, i, j]
                        facm = 0.5 * rpdel[e, k, i, j] * eta[e, k, i, j]
                        out[e, k, i, j] = (
                            facp * (x[e, k + 1, i, j] - x[e, k, i, j])
                            + facm * (x[e, k, i, j] - x[e, k - 1, i, j])
                        )
                    facm = 0.5 * rpdel[e, nlev - 1, i, j] * eta[e, nlev - 1, i, j]
                    out[e, nlev - 1, i, j] = facm * (
                        x[e, nlev - 1, i, j] - x[e, nlev - 2, i, j]
                    )
        return out

    np.testing.assert_allclose(np.asarray(tv), ref(t), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(uv), ref(u), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vv), ref(v), rtol=1e-12, atol=1e-12)


def test_caar_rsplit0_column_mass():
    """The interface-flux stencil telescopes: column-integrated dp3d update
    is identical between the Lagrangian and eta-coordinate paths, while the
    per-level updates differ."""
    cfg0 = Config(nelem=3, nlev=10, rsplit=0)
    cfg1 = Config(nelem=3, nlev=10, rsplit=1)
    st = random_state(cfg0, seed=3)
    dv = zero_derived(cfg0)
    geom = random_geometry(cfg0, seed=4)
    hv = _hv_with_hybi(cfg0)

    s0, d0 = caar_xla(st, dv, geom, hv, cfg0, 0.1, 1.0)
    s1, d1 = caar_xla(st, dv, geom, hv, cfg1, 0.1, 1.0)

    col0 = np.asarray(s0.dp3d[cfg0.np1]).sum(axis=1)
    col1 = np.asarray(s1.dp3d[cfg1.np1]).sum(axis=1)
    # per-level updates differ by the dt2*delta(eta) term (small — divdp is
    # rrearth-scaled), but column sums telescope to equality
    lvl_diff = np.max(np.abs(
        np.asarray(s0.dp3d[cfg0.np1]) - np.asarray(s1.dp3d[cfg1.np1])
    ))
    assert lvl_diff > 1e-10
    np.testing.assert_allclose(col0, col1, rtol=0, atol=lvl_diff / 100)
    t_diff = np.max(np.abs(
        np.asarray(s0.t[cfg0.np1]) - np.asarray(s1.t[cfg1.np1])
    ))
    assert t_diff > 1e-10
    # eta accumulates only on the rsplit=0 path, with zero boundaries
    eta = np.asarray(d0.eta_dot_dpdn)
    assert np.max(np.abs(eta)) > 0
    np.testing.assert_array_equal(eta[:, 0], np.zeros_like(eta[:, 0]))
    np.testing.assert_array_equal(eta[:, -1], np.zeros_like(eta[:, -1]))
    assert np.max(np.abs(np.asarray(d1.eta_dot_dpdn))) == 0
