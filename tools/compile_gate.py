#!/usr/bin/env python3
"""Precise compile-time gate for the composed prim cadence (VERDICT r2
item 7): time jit(...).lower() and .compile() of the FULL prim step
separately from data setup and first dispatch. Run twice with the same
JAX_COMPILATION_CACHE_DIR — the second process's .compile() measures the
persistent-cache reload (the bench warmup_s conflates compile with the
first-dispatch data movement through the axon tunnel, which no cache can
remove).

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_gate \
        python tools/compile_gate.py [--ne 30] [--steps 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=30)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--qsize", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5,
                    help="lax.scan length (compile time is scan-length-"
                         "invariant; this matches bench --scan chunks)")
    ap.add_argument("--lg", type=int, default=0,
                    help="lane-group width for the cadence (the r4+ "
                         "bench default path; 0 = dense)")
    ap.add_argument("--limit", action="store_true",
                    help="tracer limiter ON (the production path)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import prim_step_packed_t4
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    t0 = time.perf_counter()
    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, dtype="float32")
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    state = cast(random_state(cfg, seed=7))
    p = pack_problem_t(state, cast(zero_derived(cfg)), cast(cs.geometry),
                       analytic_hvcoord(cfg).astype(np.float32), cfg)
    scal = _scalars(np.float32(0.1), np.float32(1.0),
                    analytic_hvcoord(cfg).astype(np.float32))
    plan = make_structured_plan(cs.gdof, args.ne)
    rsp = jnp.asarray(cs.geometry.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    qdp = p["qdp"] if args.qsize <= 1 else jnp.concatenate(
        [p["qdp"] * (1.0 + 0.01 * q) for q in range(args.qsize)], axis=0)
    cst = (p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
           p["meta"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])
    setup_s = time.perf_counter() - t0

    import jax.lax as lax

    def chain(s0, qdp, cst):
        dxbt, dybt, ainct, astrt, bstrt, meta, pec, vu, vv, om = cst

        def one(carry, _):
            s, q = carry
            s1, q1, phi, a, b, c = prim_step_packed_t4(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta, s, q, pec,
                vu, vv, om, plan, rsp, nu=1e15, eb=cfg.elem_block,
                nlev=args.nlev, lg=args.lg, limit_tracers=args.limit,
                interpret=args.cpu)
            return (s1, q1), phi[0, 0]

        (s, q), _ = lax.scan(one, (s0, qdp), None, length=args.steps)
        return s, q

    fn = jax.jit(chain)
    t0 = time.perf_counter()
    lowered = fn.lower(s0, qdp, cst)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(s0, qdp, cst)
    float(jnp.sum(out[0][::512]))
    first_exec_s = time.perf_counter() - t0

    print(json.dumps({
        "gate": "prim_compile",
        "ne": args.ne, "qsize": args.qsize, "steps": args.steps,
        "lg": args.lg, "limit": bool(args.limit),
        "cache_dir": cache_dir,
        "setup_s": round(setup_s, 1),
        "lower_s": round(lower_s, 1),
        "compile_s": round(compile_s, 1),
        "first_exec_s": round(first_exec_s, 1),
    }))


if __name__ == "__main__":
    main()
