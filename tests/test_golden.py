"""Golden regression gate: the f64 oracle must reproduce test_mod.F90's arrays.

Mirrors the reference driver (fortran/main.F90): analytic init with nelemd=3,
dt2=1, eta_ave_w=1, then compare element 1's T/u/v at np1 against the
transcribed golden values. The reference loop runs 10,000 iterations without
rotating time levels, so one step suffices (see tinman_sandbox_tpu/golden.py).
"""
import numpy as np

from tinman_sandbox_tpu import (
    Config,
    analytic_derived,
    analytic_geometry,
    analytic_hvcoord,
    analytic_state,
)
from tinman_sandbox_tpu.golden import golden_caar
from tinman_sandbox_tpu.ref import caar_ref


def test_oracle_matches_golden():
    cfg = Config(nelem=3, nlev=72)
    state = analytic_state(cfg)
    derived = analytic_derived(cfg)
    geom = analytic_geometry(cfg)
    hv = analytic_hvcoord(cfg)

    new_state, _ = caar_ref(state, derived, geom, hv, cfg, dt2=1.0, eta_ave_w=1.0)

    gold = golden_caar()
    t_np1 = np.asarray(new_state.t[cfg.np1, 0])     # [nlev, np, np] (i, j)
    u_np1 = np.asarray(new_state.u[cfg.np1, 0])
    v_np1 = np.asarray(new_state.v[cfg.np1, 0])

    # The reference prints maxval(abs(diff)) and expects ~0 (main.F90:271-273).
    # A scalar transliteration with Fortran's exact fp-op order is *bitwise*
    # identical to this oracle; the residual ~4e-13 relative difference vs the
    # golden arrays comes from the golden-generating compiler's FMA/rounding
    # choices, so the gate is a tight relative tolerance, not exact zero.
    assert np.max(np.abs(t_np1 - gold["T"])) < 1e-7      # |T| ~ 2e3..7e3
    assert np.max(np.abs(u_np1 - gold["v1"])) < 1e-6     # |v| ~ 1e1..2e2
    assert np.max(np.abs(v_np1 - gold["v2"])) < 1e-6


def test_oracle_idempotent_over_iterations():
    """Re-running CAAR without time-level rotation reproduces identical np1
    (the property that makes the reference's 10,000-iteration golden check a
    single-step check)."""
    cfg = Config(nelem=2, nlev=12)
    state = analytic_state(cfg)
    derived = analytic_derived(cfg)
    geom = analytic_geometry(cfg)
    hv = analytic_hvcoord(cfg)

    s1, d1 = caar_ref(state, derived, geom, hv, cfg)
    s2, _ = caar_ref(s1, d1, geom, hv, cfg)
    np.testing.assert_array_equal(s1.t[cfg.np1], s2.t[cfg.np1])
    np.testing.assert_array_equal(s1.dp3d[cfg.np1], s2.dp3d[cfg.np1])


import pytest


@pytest.mark.slow
def test_canonical_10000_iteration_golden_loop():
    """The literal reference run: loopmax=10,000 CAAR calls with nelemd=3
    and NO time-level rotation (fortran/main.F90:201-210, kinds.F90:28),
    then the golden comparison of element 1 (main.F90:241-274). The
    idempotence test above proves mathematically that one step suffices;
    this executes the canonical loop end-to-end anyway (~15 s CPU)."""
    cfg = Config(nelem=3, nlev=72)
    state = analytic_state(cfg)
    derived = analytic_derived(cfg)
    geom = analytic_geometry(cfg)
    hv = analytic_hvcoord(cfg)

    for _ in range(10_000):
        state, derived = caar_ref(state, derived, geom, hv, cfg,
                                  dt2=1.0, eta_ave_w=1.0)

    gold = golden_caar()
    assert np.max(np.abs(np.asarray(state.t[cfg.np1, 0]) - gold["T"])) < 1e-7
    assert np.max(np.abs(np.asarray(state.u[cfg.np1, 0]) - gold["v1"])) < 1e-6
    assert np.max(np.abs(np.asarray(state.v[cfg.np1, 0]) - gold["v2"])) < 1e-6
