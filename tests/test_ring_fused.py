"""Ring-fused producer+sweep kernels (kernels/ring_fused.py).

The ring path computes the CAAR (or tracer Euler) update and the DSS
sweeps in ONE Pallas dispatch via a VMEM ring buffer with lagged grouped
emission, then patches the cube-edge tiles in place
(merge_patch_pallas). Gated BITWISE against the compact two-dispatch
path — the emission replicates `_sweep_kernel_t`'s expressions and the
patch places exact fixup values.

Measured verdict (2026-08-19, v5e): wins at ne120 (23.3 vs 24.1 ms
assembled — the s1 round-trip it eliminates is 3.2 GB/step) but loses
at ne30 (1656 vs 1549 us) and compiles prohibitively slowly for tall
q35 tracer stacks: the emission's wide window rolls are VMEM-bound, so
most of the HBM saving is re-spent in-core. Kept as an A/B variant;
the compact two-dispatch path stays the default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinman_sandbox_tpu import (
    Config, analytic_hvcoord, random_state, zero_derived,
)
from tinman_sandbox_tpu.dist.cubed_sphere import build_cubed_sphere
from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan


@pytest.mark.parametrize("ne", [2, 4])
def test_ring_matches_compact(ne):
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_ring_t4, caar_dss_structured_packed_t4,
        ssprk3_packed_t4, ssprk3_ring_t4,
        ssprk3_tracer_packed_t, ssprk3_tracer_ring_t,
    )

    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=8, elem_block=8)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st, dv = cast(random_state(cfg, seed=3)), cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, ne)
    p = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.05, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    k = cfg.nlev
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    sm1 = jnp.concatenate([p["um1"], p["vm1"], p["tm1"], p["dpm1"]], axis=0)
    com = (scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
           p["meta"])

    a = caar_dss_ring_t4(*com, s0, sm1, p["qdp"], p["pecnd"], p["vn0u"],
                         p["vn0v"], p["omg"], plan, rsp, ne=ne, nlev=k,
                         interpret=True)
    b = caar_dss_structured_packed_t4(
        *com, s0, sm1, p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"],
        p["omg"], plan, rsp, eb=8, nlev=k, interpret=True)
    for x, y, nm in zip(a, b, ("s1", "phi", "vn0u", "vn0v", "omg")):
        assert np.array_equal(np.asarray(x), np.asarray(y)), nm

    a = ssprk3_ring_t4(*com, s0, p["qdp"], p["pecnd"], p["vn0u"],
                       p["vn0v"], p["omg"], plan, rsp, ne=ne, nlev=k,
                       interpret=True)
    b = ssprk3_packed_t4(*com, s0, p["qdp"], p["pecnd"], p["vn0u"],
                         p["vn0v"], p["omg"], plan, rsp, eb=8, nlev=k,
                         interpret=True)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))

    qdp3 = jnp.concatenate([p["qdp"] * (1.0 + 0.1 * i) for i in range(3)],
                           axis=0)
    qa = ssprk3_tracer_ring_t(p["dxbt"], p["dybt"], p["meta"], s0, s0,
                              qdp3, plan, rsp, jnp.float32(0.05), ne=ne,
                              nlev=k, wind_rows=(0, 1), interpret=True)
    qb = ssprk3_tracer_packed_t(p["dxbt"], p["dybt"], p["meta"], s0, s0,
                                qdp3, plan, rsp, jnp.float32(0.05), eb=8,
                                nlev=k, wind_rows=(0, 1), interpret=True)
    assert np.array_equal(np.asarray(qa), np.asarray(qb))


def test_merge_patch_matches_scatter():
    """merge_patch_pallas == XLA scatter of the fixup values (with and
    without the affine mix on the patched lanes)."""
    from tinman_sandbox_tpu.kernels.dss_pallas import (
        _compact_arrays, _fixup_arrays, fix_vals3, merge_patch_pallas,
    )

    rng = np.random.default_rng(3)
    ne, k = 4, 16
    cs = build_cubed_sphere(ne)
    plan = make_structured_plan(cs.gdof, ne)
    e16 = cs.nelem * 16
    rsp = jnp.asarray(
        np.asarray(cs.geometry.rspheremp, np.float32).reshape(1, -1))
    (m_rows, q, *_rest) = _compact_arrays(plan)
    nt = q.shape[0] // m_rows
    w = jnp.asarray(rng.standard_normal((k, e16)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((nt * m_rows, k))
                     .astype(np.float32))
    vals3 = fix_vals3(xs, rsp, plan)
    out = merge_patch_pallas(w, vals3, plan, interpret=True)

    idx_uniq = _fixup_arrays(plan)[2]
    rows_uniq = _compact_arrays(plan)[8]
    ref = np.asarray(w).copy()
    v = np.asarray(vals3).reshape(nt * m_rows, k)
    ref[:, idx_uniq] = v[rows_uniq].T
    assert np.array_equal(np.asarray(out), ref)

    mx = jnp.asarray(rng.standard_normal((k, e16)).astype(np.float32))
    ca, cb = np.float32(0.75), np.float32(0.25)
    out = merge_patch_pallas(w, vals3, plan, mix=(mx, ca, cb),
                             interpret=True)
    ref = np.asarray(w).copy()
    ref[:, idx_uniq] = (ca * np.asarray(mx)[:, idx_uniq]
                        + cb * v[rows_uniq].T)
    # the compiled ca*mx + cb*placed fuses to an FMA (single rounding);
    # the numpy reference rounds twice — 1-ulp envelope. The ring-vs-
    # compact production gate above stays BITWISE (both sides compile
    # the same expression).
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
