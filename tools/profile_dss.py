"""Breakdown timing of the structured Pallas DSS epilogue at ne30.

Times, on the real TPU, each stage of dss_structured_t_pallas on the
stacked [4*nlev, e16] field:
  kernel_t4   — the fused CAAR kernel alone (chained)
  sweep_only  — the Pallas sweep+merge pass with a zero fixup buffer
  fixup_only  — the XLA compact gather/junction/pair/corner computation
  scatter     — vals -> tile-dense zeros buffer
  full_dss    — dss_structured_t_pallas end to end
  full_step   — caar_dss_structured_packed_t4 (chained)

Timing discipline: the axon tunnel's block_until_ready returns early, so
every measurement is (time of N iterations chained through a device
readback) with a warm-up; the fixed ~25-40 ms readback cost is removed by
the two-point marginal slope (N1 vs N2).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n1=30, n2=90):
    """Marginal µs/iter via two-point slope; fn(n) must chain n iters and
    end with a device->host readback."""
    fn(4)  # warm
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(4)
    t2 = time.perf_counter(); fn(n2); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n2 - n1) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=30)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--eb", type=int, default=8)
    args = ap.parse_args()

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.cubed_sphere import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import (
        caar_pallas_packed_t4, pack_problem_t,
    )
    from tinman_sandbox_tpu.kernels.dss_pallas import (
        _fixup_arrays, _fixup_arrays_t, dss_fixup_tiles_t,
        dss_structured_t_pallas, dss_sweeps_pallas_t, extract_tiles_t,
    )

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, elem_block=args.eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, args.ne)
    p = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    k = args.nlev
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    sm1 = jnp.concatenate([p["um1"], p["vm1"], p["tm1"], p["dpm1"]], axis=0)
    const = (scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
             p["meta"])
    rb = lambda x: float(jnp.sum(x[:, ::512]))

    # --- kernel only, chained
    @jax.jit
    def k_step(s0, sm1, acc):
        s1, phi, a, b, c = caar_pallas_packed_t4(
            *const, s0, sm1, p["qdp"], p["pecnd"], *acc,
            eb=args.eb, nlev=k)
        return s1, s0, (a, b, c)

    def run_kernel(n):
        a, b, acc = s0, sm1, (p["vn0u"], p["vn0v"], p["omg"])
        for _ in range(n):
            a, b, acc = k_step(a, b, acc)
        rb(a)
    print("kernel_t4      %8.1f us" % timed(run_kernel))

    # --- full step, chained
    @jax.jit
    def f_step(s0, sm1, acc):
        s1, phi, a, b, c = caar_dss_structured_packed_t4(
            *const, s0, sm1, p["qdp"], p["pecnd"], *acc, plan, rsp,
            eb=args.eb, nlev=k)
        return s1, s0, (a, b, c)

    def run_full(n):
        a, b, acc = s0, sm1, (p["vn0u"], p["vn0v"], p["omg"])
        for _ in range(n):
            a, b, acc = f_step(a, b, acc)
        rb(a)
    print("full_step_t4   %8.1f us" % timed(run_full))

    # --- DSS end to end, chained on itself
    @jax.jit
    def d_step(x):
        return dss_structured_t_pallas(x, plan, rsp)

    def run_dss(n):
        x = s0
        for _ in range(n):
            x = d_step(x)
        rb(x)
    print("full_dss       %8.1f us" % timed(run_dss))

    # --- sweep-only (zero fixup operands), chained
    _, _, _, tiles, nf, dense_idx, dense_mask = _fixup_arrays(plan)
    wd = (6 // nf) * len(tiles) * 128
    vd0 = jnp.zeros((4 * k, wd), jnp.float32)
    dm = jnp.asarray(dense_mask)

    @jax.jit
    def s_step(x):
        return dss_sweeps_pallas_t(x, rsp, vd0, dm, plan.ne, tiles, nf)

    def run_sweep(n):
        x = s0
        for _ in range(n):
            x = s_step(x)
        rb(x)
    print("sweep_only     %8.1f us" % timed(run_sweep))

    # --- tile extraction + transposed fixup, chained via a cheap mix-in
    gtiles, _, _ = _fixup_arrays_t(plan)

    @jax.jit
    def x_step(x):
        xd_t = extract_tiles_t(x, gtiles)
        vals = dss_fixup_tiles_t(xd_t, rsp, plan)
        return x.at[:, :1].add(jnp.sum(vals, axis=0)[:, None] * 1e-30)

    def run_fix(n):
        x = s0
        for _ in range(n):
            x = x_step(x)
        rb(x)
    print("extract+fixup  %8.1f us (incl. one tiny .at add)" % timed(run_fix))

    # --- scatter into zeros, chained
    vals0 = dss_fixup_tiles_t(extract_tiles_t(s0, gtiles), rsp, plan).T
    di = jnp.asarray(dense_idx)

    @jax.jit
    def sc_step(vals):
        vd = jnp.zeros((4 * k, wd), jnp.float32).at[
            :, di].set(vals, unique_indices=True)
        return vals + 1e-30 * vd[:, : vals.shape[1]]

    def run_sc(n):
        v = vals0
        for _ in range(n):
            v = sc_step(v)
        rb(v)
    print("scatter_zeros  %8.1f us (incl. mix-in)" % timed(run_sc))

    # --- COMPACT path stages (kernels/dss_pallas.py::_compact_arrays)
    from tinman_sandbox_tpu.kernels.dss_pallas import (
        _compact_arrays, _fixup_from_rows, dss_sweeps_pallas_ct,
    )

    (m_rows, q, rlc, rcc, di_c, wd_c, wr, p_tbl,
     _) = _compact_arrays(plan)
    vd_c0 = jnp.zeros((4 * k, wd_c), jnp.float32)
    p_j = jnp.asarray(p_tbl)

    @jax.jit
    def cs_step(x):
        return dss_sweeps_pallas_ct(x, rsp, vd_c0, dm, p_j, plan.ne,
                                    tiles, nf, m_rows)

    def run_csweep(n):
        x = s0
        for _ in range(n):
            x = cs_step(x)
        rb(x)
    print("c_sweep_only   %8.1f us (compact vd, zero fixup)"
          % timed(run_csweep))

    qn = np.asarray(q, np.float32)
    xs0 = jnp.asarray(
        (qn.reshape(-1, m_rows, 128) @ np.asarray(
            extract_tiles_t(s0, gtiles)).reshape(-1, 128, 4 * k)
         ).reshape(-1, 4 * k))
    dic_j = jnp.asarray(di_c)

    @jax.jit
    def cf_step(xs):
        vals = _fixup_from_rows(xs, rsp, plan, rlc, rcc)
        vd = jnp.zeros((4 * k, wd_c), jnp.float32).at[
            :, dic_j].set(vals.T, unique_indices=True)
        return xs + 1e-30 * vd[:, :1].T[:1]

    def run_cfix(n):
        xs = xs0
        for _ in range(n):
            xs = cf_step(xs)
        rb(xs)
    print("c_fixup+scat   %8.1f us (incl. mix-in)" % timed(run_cfix))


if __name__ == "__main__":
    main()
