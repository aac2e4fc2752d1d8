#!/usr/bin/env python3
"""Full benchmark sweep — every headline surface, one JSON report.

Covers the reference's benchmark matrix (SURVEY §6): CAAR Pallas + XLA at
the canonical 1024x72 workload, the single-element config, the tracer-heavy
EulerStep config (QSIZE_D=35), and the saxpby triad. All timings end with a
device readback (the axon tunnel's block_until_ready returns early).

    python tools/bench_all.py [--out BENCH_LOCAL.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain_time(fn, init, n, reps=4):
    """Marginal per-step seconds: slope between n- and 3n-step chained
    loops, which cancels the ~30 ms fixed readback/sync latency of the
    remote-TPU tunnel."""
    import jax.numpy as jnp

    out = fn(init)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out) * 0)

    def run(steps):
        x = init
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(x)
        xx = x[0] if isinstance(x, tuple) else x
        float(jnp.sum(xx[:: max(1, xx.shape[0] // 4)]))
        return time.perf_counter() - t0

    best_n, best_3n = float("inf"), float("inf")
    for _ in range(reps):
        best_n = min(best_n, run(n))
        best_3n = min(best_3n, run(3 * n))
    return max((best_3n - best_n) / (2 * n), 1e-9)


def bench_caar(nelem, nlev, eb=8):
    import jax
    import numpy as np

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_geometry, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import (
        _scalars, caar_pallas_packed, pack_problem,
    )

    cfg = Config(nelem=nelem, nlev=nlev, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st, dv = cast(random_state(cfg, seed=7)), cast(zero_derived(cfg))
    geom = cast(random_geometry(cfg, seed=8))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    p = pack_problem(st, dv, geom, hv, cfg)
    scal = _scalars(0.1, 1.0, hv)
    const = (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
             p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
             p["um1"], p["vm1"], p["tm1"], p["dpm1"], p["qdp"], p["pecnd"])

    def step(acc):
        o = caar_pallas_packed(*const, *acc, eb=eb, nlev=nlev)
        return (o[5], o[6], o[7])

    per = _chain_time(step, (p["vn0u"], p["vn0v"], p["omg"]), n=150)
    return {"us_per_step": round(per * 1e6, 1),
            "gridpoints_per_s": round(nelem * nlev * 16 / per, 0)}


def bench_tracer(nelem=128, nlev=72, qsize=35, eb=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu import Config, random_geometry, random_state
    from tinman_sandbox_tpu.kernels.layout import (
        block_derivative_ops, pack_field, pack_meta,
    )
    from tinman_sandbox_tpu.kernels.tracer_pallas import euler_step_pallas_packed

    cfg = Config(nelem=nelem, nlev=nlev, qsize=qsize, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=1))
    geom = cast(random_geometry(cfg, seed=2))
    dxb, dyb = block_derivative_ops(eb, geom.dvv, jnp.float32)
    meta = pack_meta(geom, jnp.zeros((nelem, 4, 4), jnp.float32))
    qt = jnp.transpose(jnp.asarray(st.qdp[0]), (0, 3, 4, 1, 2)).reshape(
        nelem * 16, qsize * nlev)
    vu = pack_field(jnp.asarray(st.u[0]))
    vv = pack_field(jnp.asarray(st.v[0]))
    scal = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(1e-4)

    def step(q):
        return euler_step_pallas_packed(scal, dxb, dyb, meta, vu, vv, q,
                                        eb=eb, nlev=nlev, qsize=qsize)

    per = _chain_time(step, qt, n=100)
    return {"us_per_step": round(per * 1e6, 1),
            "tracer_gridpoints_per_s": round(nelem * nlev * 16 * qsize / per, 0)}


def bench_ne30_dss(nlev=72):
    """ne30-class (5400 elements) CAAR + DSS assembly on one chip (the
    BASELINE.md '1 host with halo exchange' config at single-chip scale)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
    from tinman_sandbox_tpu.dist import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_pallas_packed, make_packed_dss,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars, pack_problem

    cs = build_cubed_sphere(30)
    cfg = Config(nelem=cs.nelem, nlev=nlev, elem_block=8)
    cast = lambda t: jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x, np.float32)), t)
    st, dv = cast(random_state(cfg, seed=3)), cast(zero_derived(cfg))
    geom = cast(cs.geometry)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    p = pack_problem(st, dv, geom, hv, cfg)
    scal = _scalars(1e-3, 0.01, hv)
    gr, rr = make_packed_dss(jnp.asarray(cs.gdof), geom.rspheremp)
    const = (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
             p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
             p["um1"], p["vm1"], p["tm1"], p["dpm1"], p["qdp"], p["pecnd"])

    def step(acc):
        o = caar_dss_pallas_packed(*const, *acc, gr, rr, eb=8, nlev=nlev,
                                   ndof=cs.ndof)
        return (o[5], o[6], o[7])

    per = _chain_time(step, (p["vn0u"], p["vn0v"], p["omg"]), n=10)
    return {"nelem": cs.nelem, "us_per_step": round(per * 1e6, 1),
            "gridpoints_per_s": round(cs.nelem * nlev * 16 / per, 0)}


def bench_saxpby(rows=8192, cols=4096):
    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu.kernels.saxpby import saxpby

    x = jnp.asarray(np.random.default_rng(0).normal(size=(rows, cols)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(rows, cols)),
                    jnp.float32)

    def step(x):
        return saxpby(0.999, 0.001, x, y)

    per = _chain_time(step, x, n=50)
    return {"gb_per_s": round(3 * rows * cols * 4 / per / 1e9, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    report = {
        "backend": jax.default_backend(),
        "caar_1024x72": bench_caar(1024, 72),
        "caar_single_element_26lev": bench_caar(8, 26, eb=8),
        "tracer_128x72_q35": bench_tracer(),
        "ne30_caar_dss_5400elem": bench_ne30_dss(),
        "saxpby_triad": bench_saxpby(),
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
