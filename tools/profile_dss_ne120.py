#!/usr/bin/env python3
"""ne120-scale DSS epilogue breakdown (on-device packed init — the
unpacked [tl, 86400, 72, 4, 4] state that profile_dss.py builds would be
~8 GB on host; random_packed_problem_t skips it, CLAUDE.md gotcha).

Times, chained with device readbacks (marginal two-point slope):
  kernel_t4   — pair CAAR kernel alone
  full_step   — caar_dss_structured_packed_t4 (compact epilogue)
  full_dense  — same with compact=False
  c_sweep     — compact sweep+merge alone (zero vals)
  c_fixup     — compact fixup + scatter alone
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


def timed(fn, n1=8, n2=24):
    fn(2)
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(2)
    t2 = time.perf_counter(); fn(n2); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n2 - n1) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=120)
    ap.add_argument("--nlev", type=int, default=72)
    args = ap.parse_args()

    from tinman_sandbox_tpu import Config
    from tinman_sandbox_tpu.dist.cubed_sphere import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.dist.structured_dss import (
        make_structured_plan, rsp_lanes_2f,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import (
        caar_pallas_packed_t4, random_packed_problem_t,
    )
    from tinman_sandbox_tpu.kernels.dss_pallas import (
        _compact_arrays, _fixup_arrays, _fixup_from_rows,
        dss_sweeps_pallas_ct,
    )
    from tinman_sandbox_tpu import analytic_hvcoord

    ne, k = args.ne, args.nlev
    cs = build_cubed_sphere(ne)
    cfg = Config(nelem=cs.nelem, nlev=k, elem_block=8)
    geom = jax.tree.map(lambda x: np.asarray(x, np.float32), cs.geometry)
    p = random_packed_problem_t(cfg, seed=7, geom=geom)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    scal = _scalars(0.5, 1.0, hv)
    plan = make_structured_plan(cs.gdof, ne)
    rsp = jnp.asarray(rsp_lanes_2f(geom.spheremp, cs.gdof, cs.ndof))
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    sm1 = jnp.concatenate([p["um1"], p["vm1"], p["tm1"], p["dpm1"]], axis=0)
    const = (scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"],
             p["bstrt"], p["meta"])
    rb = lambda x: float(jnp.sum(x[:, ::2048]))

    def k_step(a, b, acc, qdp, pecnd):
        s1, phi, x, y, z = caar_pallas_packed_t4(
            *const, a, b, qdp, pecnd, *acc, eb=8, nlev=k)
        return s1, a, (x, y, z)

    def run_kernel(n, fn):
        # clone the starting buffers: the step DONATES its state args, so
        # the masters must never be passed in directly
        a, b = s0 * 1.0, sm1 * 1.0
        acc = (p["vn0u"] * 1.0, p["vn0v"] * 1.0, p["omg"] * 1.0)
        for _ in range(n):
            a, b, acc = fn(a, b, acc, p["qdp"], p["pecnd"])
        rb(a)

    # donate the chained buffers: three live [4k, 1.38M] states
    # otherwise exhaust ne120 HBM (bench.py does the same)
    kj = jax.jit(k_step, donate_argnums=(0, 1, 2))
    print("kernel_t4    %9.1f us" % timed(lambda n: run_kernel(n, kj)),
          flush=True)

    def f_step(compact):
        def step(a, b, acc, qdp, pecnd):
            s1, phi, x, y, z = caar_dss_structured_packed_t4(
                *const, a, b, qdp, pecnd, *acc, plan, rsp,
                eb=8, nlev=k, compact=compact)
            return s1, a, (x, y, z)
        return jax.jit(step, donate_argnums=(0, 1, 2))

    fc = f_step(True)
    print("full_compact %9.1f us" % timed(lambda n: run_kernel(n, fc)),
          flush=True)
    fd = f_step(False)
    print("full_dense   %9.1f us" % timed(lambda n: run_kernel(n, fd)),
          flush=True)

    (m_rows, q, rlc, rcc, di_c, wd_c, wr, p_tbl,
     _) = _compact_arrays(plan)
    tiles, nf = _fixup_arrays(plan)[3], _fixup_arrays(plan)[4]
    dm = jnp.asarray(_fixup_arrays(plan)[6])
    vd0 = jnp.zeros((4 * k, wd_c), jnp.float32)
    pj = jnp.asarray(p_tbl)

    @jax.jit
    def cs_step(x):
        return dss_sweeps_pallas_ct(x, rsp, vd0, dm, pj, ne, tiles, nf,
                                    m_rows)

    def run_cs(n):
        x = s0
        for _ in range(n):
            x = cs_step(x)
        rb(x)
    print("c_sweep      %9.1f us" % timed(run_cs), flush=True)

    xs0 = jnp.zeros((q.shape[0], 4 * k), jnp.float32) + 1.0
    dic = jnp.asarray(di_c)

    @jax.jit
    def cf_step(xs):
        vals = _fixup_from_rows(xs, rsp, plan, rlc, rcc)
        vd = jnp.zeros((4 * k, wd_c), jnp.float32).at[
            :, dic].set(vals.T, unique_indices=True)
        return xs + 1e-30 * vd[:1, :1]

    def run_cf(n):
        xs = xs0
        for _ in range(n):
            xs = cf_step(xs)
        rb(xs)
    print("c_fixup+scat %9.1f us" % timed(run_cf), flush=True)


if __name__ == "__main__":
    main()
