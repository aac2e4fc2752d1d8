"""Conservative vertical remap: identity, conservation, monotonicity,
PLM > PCM accuracy, and the full-state wrapper."""
import numpy as np
import jax.numpy as jnp

from tinman_sandbox_tpu import Config, random_state
from tinman_sandbox_tpu.grid import HybridVCoord
from tinman_sandbox_tpu.ops.remap import reference_dp, remap_column, vertical_remap


def _dps(nlev, seed=0, shape=(2, 4, 4)):
    rng = np.random.default_rng(seed)
    e, i, j = shape
    dp_src = rng.uniform(5.0, 15.0, (e, nlev, i, j))
    # target with same column totals
    w = rng.uniform(0.5, 1.5, (e, nlev, i, j))
    dp_tgt = w / w.sum(axis=1, keepdims=True) * dp_src.sum(axis=1,
                                                           keepdims=True)
    return jnp.asarray(dp_src), jnp.asarray(dp_tgt)


def test_identity_when_grids_match():
    dp, _ = _dps(9)
    q = jnp.asarray(np.random.default_rng(1).normal(size=dp.shape))
    for scheme in ("pcm", "plm", "ppm"):
        out = remap_column(q, dp, dp, scheme=scheme)
        np.testing.assert_allclose(np.asarray(out), np.asarray(q),
                                   rtol=1e-12, atol=1e-12)


def test_conservation_and_monotonicity():
    dp_src, dp_tgt = _dps(12, seed=3)
    q = jnp.asarray(np.random.default_rng(4).uniform(200, 300,
                                                     size=dp_src.shape))
    for scheme in ("pcm", "plm", "ppm"):
        out = remap_column(q, dp_src, dp_tgt, scheme=scheme)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(out * dp_tgt, axis=1)),
            np.asarray(jnp.sum(q * dp_src, axis=1)),
            rtol=1e-12,
        )
        assert np.asarray(out).max() <= float(q.max()) + 1e-10
        assert np.asarray(out).min() >= float(q.min()) - 1e-10


def test_plm_beats_pcm_on_smooth_profile():
    nlev = 32
    dp_src = jnp.full((1, nlev, 4, 4), 10.0)
    shift = jnp.asarray(
        np.sin(np.linspace(0, 2 * np.pi, nlev))[None, :, None, None]
    )
    dp_tgt = dp_src + shift  # same totals (sin sums ~ 0 over full period)
    dp_tgt = dp_tgt * (jnp.sum(dp_src, 1, keepdims=True)
                       / jnp.sum(dp_tgt, 1, keepdims=True))
    x = jnp.cumsum(dp_src, axis=1) - 0.5 * dp_src
    q = jnp.sin(x / 60.0)
    # analytic cell averages on the target grid for the smooth q(x)
    ti = jnp.concatenate([jnp.zeros_like(dp_tgt[:, :1]),
                          jnp.cumsum(dp_tgt, 1)], 1)
    exact = (-jnp.cos(ti[:, 1:] / 60.0) + jnp.cos(ti[:, :-1] / 60.0)) * 60.0 \
        / dp_tgt
    e = {}
    for scheme in ("pcm", "plm", "ppm"):
        out = remap_column(q, dp_src, dp_tgt, scheme=scheme)
        e[scheme] = float(jnp.max(jnp.abs(out - exact)))
    assert e["plm"] < 0.5 * e["pcm"], e


def _real_hv(nlev, p_top=500.0, p0=100000.0):
    etai = np.linspace(p_top / p0, 1.0, nlev + 1)
    b = ((etai - etai[0]) / (1.0 - etai[0])) ** 1.3
    a = etai - b
    return HybridVCoord(ps0=p0, hyai=a, hybi=b,
                        hyam=0.5 * (a[:-1] + a[1:]),
                        hybm=0.5 * (b[:-1] + b[1:]))


def test_vertical_remap_state_wrapper():
    cfg = Config(nelem=2, nlev=10)
    hv = _real_hv(cfg.nlev)
    st = random_state(cfg, seed=7)
    # make dp3d[np1] a perturbed-but-positive Lagrangian column
    rng = np.random.default_rng(8)
    ps = rng.uniform(9.5e4, 1.05e5, (cfg.nelem, 4, 4))
    dp_ref = np.asarray(reference_dp(hv, jnp.asarray(ps)))
    pert = rng.uniform(0.9, 1.1, dp_ref.shape)
    dp_lag = dp_ref * pert
    dp_lag *= (dp_ref.sum(1, keepdims=True) / dp_lag.sum(1, keepdims=True))
    dp3d = np.asarray(st.dp3d).copy()
    dp3d[cfg.np1] = dp_lag
    import dataclasses

    st = dataclasses.replace(st, dp3d=dp3d)

    out = vertical_remap(st, hv, cfg)
    np1, qn0 = cfg.np1, cfg.qn0
    # dp3d is back on reference levels, same column mass
    np.testing.assert_allclose(
        np.asarray(out.dp3d[np1]).sum(1), dp_lag.sum(1), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.dp3d[np1]), dp_ref, rtol=1e-10
    )
    # momentum / T*dp / tracer mass conserved
    for name in ("u", "v", "t"):
        before = (np.asarray(getattr(st, name))[np1] * dp_lag).sum(1)
        after = (np.asarray(getattr(out, name))[np1]
                 * np.asarray(out.dp3d[np1])).sum(1)
        np.testing.assert_allclose(after, before, rtol=1e-11, err_msg=name)
    q_before = np.asarray(st.qdp)[qn0].sum(2)
    q_after = np.asarray(out.qdp)[qn0].sum(2)
    np.testing.assert_allclose(q_after, q_before, rtol=1e-11)
