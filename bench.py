#!/usr/bin/env python3
"""Headline benchmark: CAAR throughput in gridpoint-updates/s on one chip.

Mirrors the reference's benchmark discipline (kokkos_init.cpp:108-134):
warm-up call excluded, fence -> time -> fence around the measured loop, the
canonical batched workload (1024 elements x 72 levels x 16 GLL, f32 fast
path), wall seconds for num_exec CAAR evaluations, one kernel dispatch per
iteration chained through the derived accumulators.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the reference's own cxx/basic benchmark
compiled -O3 on this container's host CPU (BASELINE_MEASURED.json).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nelem", type=int, default=1024)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--nexec", type=int, default=720)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--eb", type=int, default=8, help="elements per Pallas block")
    ap.add_argument("--pallas", action="store_true", default=None,
                    help="force the fused Pallas CAAR kernel")
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    ap.add_argument("--chunk", type=int, default=20,
                    help="CAAR steps unrolled per dispatch (amortizes the "
                         "per-dispatch latency, ~200-300 us on this tunnel)")
    args = ap.parse_args()

    import jax

    from tinman_sandbox_tpu import (
        Config,
        analytic_hvcoord,
        random_geometry,
        random_state,
        zero_derived,
    )
    dtype = np.dtype(args.dtype)
    cfg = Config(nelem=args.nelem, nlev=args.nlev, dtype=args.dtype,
                 elem_block=args.eb)
    if args.nelem >= 16384 and dtype == np.float32:
        # large grids: generate the multi-GB state on device (staging host
        # arrays through the tunnel takes minutes at this size)
        import jax.numpy as jnp

        from tinman_sandbox_tpu.state import Derived, random_state_device

        state = random_state_device(cfg, seed=7)
        z = lambda s: jnp.zeros(s, jnp.float32)
        s3 = (cfg.nelem, cfg.nlev, 4, 4)
        derived = Derived(vn0_u=z(s3), vn0_v=z(s3), phi=z(s3), omega_p=z(s3),
                          eta_dot_dpdn=z((cfg.nelem, cfg.nlev + 1, 4, 4)),
                          pecnd=z(s3))
    else:
        cast = lambda tree: jax.tree.map(lambda x: np.asarray(x, dtype), tree)
        state = cast(random_state(cfg, seed=7))
        derived = cast(zero_derived(cfg))
    cast_g = lambda tree: jax.tree.map(lambda x: np.asarray(x, dtype), tree)
    geom = cast_g(random_geometry(cfg, seed=8))
    hv = analytic_hvcoord(cfg).astype(dtype)

    kernel = "xla"
    use_pallas = args.pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            from tinman_sandbox_tpu.kernels import caar_pallas_available

            if caar_pallas_available():
                kernel = "pallas"
        except ImportError:
            pass

    dt2, eta = dtype.type(0.1), dtype.type(1.0)

    # Per-call dispatch chained through the derived accumulators — the
    # reference's own methodology (one parallel_for dispatch per iteration,
    # kokkos_init.cpp:123-134; time levels stay fixed so each call reads the
    # same prognostic state, exactly like the reference loop).
    if kernel == "pallas":
        from tinman_sandbox_tpu.kernels.caar_pallas import (
            _scalars, caar_pallas_packed, pack_problem,
        )

        p = pack_problem(state, derived, geom, hv, cfg)
        scal = _scalars(dt2, eta, hv)
        const = (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
                 p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
                 p["um1"], p["vm1"], p["tm1"], p["dpm1"],
                 p["qdp"], p["pecnd"])

        chunk = max(1, args.chunk)

        @jax.jit
        def multi(acc):
            for _ in range(chunk):
                o = caar_pallas_packed(*const, *acc, eb=cfg.elem_block,
                                       nlev=cfg.nlev)
                acc = (o[5], o[6], o[7])
            return acc, o

        def run(nsteps):
            import jax.numpy as jnp

            nchunks = -(-nsteps // chunk)
            acc = (p["vn0u"], p["vn0v"], p["omg"])
            for _ in range(nchunks):
                acc, o = multi(acc)
            # device-to-host readback forces REAL completion (through the
            # remote-TPU tunnel block_until_ready can return early)
            float(jnp.sum(o[0][:: max(1, o[0].shape[0] // 8)]))
            return nchunks * chunk
    else:
        from tinman_sandbox_tpu.timeloop import benchmark_loop

        def run(nsteps):
            s, d = benchmark_loop(state, derived, geom, hv, cfg, dt2, eta,
                                  nsteps=nsteps)
            float(s.t[cfg.np1, 0, 0, 0, 0])
            return nsteps

    run(2)  # warm-up + compile (excluded, kokkos_init.cpp:108 analog)

    best = float("inf")
    executed = args.nexec
    for _ in range(args.reps):
        t0 = time.perf_counter()
        executed = run(args.nexec)
        best = min(best, time.perf_counter() - t0)

    points = args.nelem * args.nlev * 16 * executed
    gps = points / best

    baseline = None
    bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")
    if os.path.exists(bp):
        with open(bp) as f:
            baseline = json.load(f).get("baseline_gridpoints_per_s")

    print(json.dumps({
        "metric": "caar_gridpoint_updates_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoints/s",
        "vs_baseline": round(gps / baseline, 2) if baseline else None,
        "config": f"{args.nelem}x{args.nlev}x16 {args.dtype} nexec={args.nexec} kernel={kernel}",
        "seconds": round(best, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
