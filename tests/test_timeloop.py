"""Time-integration layer: benchmark loop, leapfrog rotation, tracer step,
dp3d invariant, checkpoint round-trip."""
import dataclasses

import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_geometry,
    analytic_hvcoord,
    random_geometry,
    random_state,
    zero_derived,
)
from tinman_sandbox_tpu.kernels import caar_xla
from tinman_sandbox_tpu.timeloop import (
    advance_qdp,
    benchmark_loop,
    check_dp3d,
    euler_step,
    leapfrog_step,
    load_checkpoint,
    rotated,
    run_leapfrog,
    save_checkpoint,
)


def _setup(nelem=3, nlev=10, seed=5):
    cfg = Config(nelem=nelem, nlev=nlev)
    st = random_state(cfg, seed=seed)
    dv = zero_derived(cfg)
    geom = random_geometry(cfg, seed=seed + 1)
    hv = analytic_hvcoord(cfg)
    return cfg, st, dv, geom, hv


def test_benchmark_loop_equals_unrolled_calls():
    cfg, st, dv, geom, hv = _setup()
    s_loop, d_loop = benchmark_loop(st, dv, geom, hv, cfg, 0.1, 0.5, nsteps=4)
    s_ref, d_ref = st, dv
    for _ in range(4):
        s_ref, d_ref = caar_xla(s_ref, d_ref, geom, hv, cfg, 0.1, 0.5)
    np.testing.assert_allclose(
        np.asarray(s_loop.t), np.asarray(s_ref.t), rtol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(d_loop.omega_p), np.asarray(d_ref.omega_p), rtol=1e-13
    )


def test_rotation_cycles_with_period_three():
    cfg = Config()
    c1 = rotated(cfg)
    c3 = rotated(rotated(c1))
    assert (c1.n0, c1.np1, c1.nm1) == (cfg.np1, cfg.nm1, cfg.n0)
    assert (c3.n0, c3.np1, c3.nm1) == (cfg.n0, cfg.np1, cfg.nm1)
    # all three levels distinct at every phase
    c = cfg
    for _ in range(3):
        assert len({c.n0, c.np1, c.nm1}) == 3
        c = rotated(c)


def test_leapfrog_advances_all_time_levels():
    cfg, st, dv, geom, hv = _setup(nlev=6)
    s0 = np.asarray(st.t).copy()
    st1, dv1, cfg1 = leapfrog_step(st, dv, geom, hv, cfg, 1.0, 1.0)
    # only np1 written in step 1
    t1 = np.asarray(st1.t)
    assert not np.allclose(t1[cfg.np1], s0[cfg.np1])
    np.testing.assert_array_equal(t1[cfg.n0], s0[cfg.n0])
    # after rotation the new n0 is what was just written
    assert cfg1.n0 == cfg.np1
    st3, _, cfg3 = run_leapfrog(st, dv, geom, hv, cfg, nsteps=3)
    assert (cfg3.n0, cfg3.np1, cfg3.nm1) == (cfg.n0, cfg.np1, cfg.nm1)
    assert not np.allclose(np.asarray(st3.t), s0)


def test_check_dp3d():
    cfg, st, dv, geom, hv = _setup()
    ok, mn = check_dp3d(st, cfg)
    assert bool(ok) and float(mn) > 0
    bad_dp = np.asarray(st.dp3d).copy()
    bad_dp[cfg.np1] = -1.0
    bad = dataclasses.replace(st, dp3d=bad_dp)
    ok2, _ = check_dp3d(bad, cfg)
    assert not bool(ok2)


def test_euler_step_matches_manual_divergence():
    from tinman_sandbox_tpu.ops import divergence_sphere
    import jax.numpy as jnp
    from tinman_sandbox_tpu.constants import CONSTANTS

    cfg, st, dv, geom, hv = _setup(nelem=2, nlev=5)
    dt = 7.0
    qdp = st.qdp[cfg.qn0]
    out = euler_step(qdp, st.u[cfg.n0], st.v[cfg.n0], geom, cfg, dt)
    rr = CONSTANTS.rrearth
    expect = np.asarray(qdp).copy()
    for iq in range(cfg.qsize):
        div = divergence_sphere(
            st.u[cfg.n0] * qdp[:, iq],
            st.v[cfg.n0] * qdp[:, iq],
            geom.dvv,
            geom.dinv[:, None],
            geom.metdet[:, None],
            geom.rmetdet[:, None],
            rr,
        )
        expect[:, iq] -= dt * np.asarray(div)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-12)


def test_advance_qdp_writes_other_time_level():
    cfg, st, dv, geom, hv = _setup(nelem=2, nlev=5)
    st2 = advance_qdp(st, geom, cfg, dt=1.0)
    np.testing.assert_array_equal(
        np.asarray(st2.qdp[cfg.qn0]), np.asarray(st.qdp[cfg.qn0])
    )
    assert not np.allclose(
        np.asarray(st2.qdp[1 - cfg.qn0]), np.asarray(st.qdp[1 - cfg.qn0])
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg, st, dv, geom, hv = _setup(nelem=2, nlev=4)
    st1, dv1, cfg1 = run_leapfrog(st, dv, geom, hv, cfg, nsteps=1)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, st1, dv1, cfg1, step=1)
    st2, dv2, cfg2, step = load_checkpoint(path, cfg)
    assert step == 1 and (cfg2.n0, cfg2.np1, cfg2.nm1) == (cfg1.n0, cfg1.np1, cfg1.nm1)
    np.testing.assert_array_equal(np.asarray(st2.t), np.asarray(st1.t))
    np.testing.assert_array_equal(np.asarray(dv2.phi), np.asarray(dv1.phi))
    # resuming from the checkpoint matches an uninterrupted run
    sa, da, cfga = run_leapfrog(st1, dv1, geom, hv, cfg1, nsteps=2)
    sb, db, cfgb = run_leapfrog(st2, dv2, geom, hv, cfg2, nsteps=2)
    np.testing.assert_array_equal(np.asarray(sa.t), np.asarray(sb.t))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    cfg, st, dv, geom, hv = _setup(nelem=2, nlev=4)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, st, dv, cfg, step=0)
    other = Config(nelem=2, nlev=8)
    try:
        load_checkpoint(path, other)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError on nlev mismatch")


def test_orbax_async_checkpoint_roundtrip(tmp_path):
    """Orbax-backed async checkpoint next to the .npz path: save without
    blocking, wait, restore, bitwise state equality + time-level indices."""
    import dataclasses

    from tinman_sandbox_tpu import Config, random_state, zero_derived
    from tinman_sandbox_tpu.timeloop import (
        finish_async_checkpoints, load_checkpoint_orbax, save_checkpoint_orbax,
    )

    cfg = dataclasses.replace(Config(nelem=4, nlev=6), n0=2, np1=0, nm1=1)
    st = random_state(cfg, seed=3)
    dv = zero_derived(cfg)
    path = str(tmp_path / "ck_orbax")
    save_checkpoint_orbax(path, st, dv, cfg, step=17)
    finish_async_checkpoints()

    st2, dv2, cfg2, step = load_checkpoint_orbax(path, Config(nelem=4, nlev=6))
    assert step == 17
    assert (cfg2.n0, cfg2.np1, cfg2.nm1) == (2, 0, 1)
    np.testing.assert_array_equal(np.asarray(st2.t), np.asarray(st.t))
    np.testing.assert_array_equal(np.asarray(st2.qdp), np.asarray(st.qdp))
    np.testing.assert_array_equal(np.asarray(dv2.omega_p), np.asarray(dv.omega_p))

    import pytest

    with pytest.raises(ValueError):
        load_checkpoint_orbax(path, Config(nelem=5, nlev=6))


def test_packed_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from tinman_sandbox_tpu.timeloop import (
        load_packed_checkpoint, save_packed_checkpoint,
    )

    rng = np.random.default_rng(3)
    s = rng.standard_normal((16, 384)).astype(np.float32)
    q = rng.standard_normal((8, 384)).astype(np.float32)
    acc = tuple(rng.standard_normal((4, 384)).astype(np.float32)
                for _ in range(3))
    p = str(tmp_path / "packed.npz")
    save_packed_checkpoint(p, s, q, acc, step=17)
    s2, q2, acc2, step = load_packed_checkpoint(p)
    assert step == 17
    np.testing.assert_array_equal(s2, s)
    np.testing.assert_array_equal(q2, q)
    for a, b in zip(acc2, acc):
        np.testing.assert_array_equal(a, b)
