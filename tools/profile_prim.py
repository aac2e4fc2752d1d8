#!/usr/bin/env python3
"""Component breakdown of the packed prim cadence on the real TPU.

Times the three stages of `prim_step_packed_t4` separately (honest chaining
inside each loop, device->host readback to close every timing) so the
composed `bench.py --ne N --prim` number can be attributed:

  1. SSPRK3 dynamics (ssprk3_packed_t4)
  2. biharmonic hyperviscosity (apply_hypervis_packed_t)
  3. one SSPRK3 tracer substep (ssprk3_tracer_packed_t) at --qsize

    python tools/profile_prim.py --ne 30 --qsize 35 --nexec 30
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=30)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--qsize", type=int, default=35)
    ap.add_argument("--nexec", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--nu", type=float, default=1e15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import (
        apply_hypervis_packed_t, ssprk3_packed_t4, ssprk3_tracer_packed_t,
    )
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, dtype="float32")
    cast = lambda tree: jax.tree.map(lambda x: np.asarray(x, np.float32),
                                     tree)
    state = cast(random_state(cfg, seed=7))
    derived = cast(zero_derived(cfg))
    geom = cast(cs.geometry)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    p = pack_problem_t(state, derived, geom, hv, cfg)
    scal = _scalars(np.float32(0.1), np.float32(1.0), hv)
    plan = make_structured_plan(cs.gdof, args.ne)
    rsp = jnp.asarray(geom.rspheremp, jnp.float32).reshape(1, cfg.nelem * 16)
    k = args.nlev
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    qdp = p["qdp"] if args.qsize <= 1 else jnp.concatenate(
        [p["qdp"] * (1.0 + 0.01 * q) for q in range(args.qsize)], axis=0)
    eb = cfg.elem_block
    gp = cfg.nelem * 16 * args.nlev

    def timed(name, loop_fn, loop_args, per_call_gp):
        # operands MUST be jit ARGUMENTS — a nullary closure bakes the
        # multi-GB buffers in as program constants and the remote compile
        # serializes them through the tunnel (CLAUDE.md gotcha)
        loop = jax.jit(loop_fn)
        out = loop(*loop_args)            # compile + warm
        jax.block_until_ready(out)
        float(jnp.sum(out[0][::512]))     # force real completion
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            nch = -(-args.nexec // args.chunk)
            for _ in range(nch):
                out = loop(*loop_args)
            float(jnp.sum(out[0][::512]))
            best = min(best, (time.perf_counter() - t0)
                       / (nch * args.chunk))
        print(json.dumps({name: {
            "us_per_call": round(best * 1e6, 1),
            "ggp_per_s": round(per_call_gp / best / 1e9, 2)}}), flush=True)
        return best

    cst = (p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
           p["meta"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])

    def dyn_loop(s0, qdp, cst):
        dxbt, dybt, ainct, astrt, bstrt, meta, pec, vu, vv, om = cst
        s = s0
        for _ in range(args.chunk):
            s, phi, u1, v1, o1 = ssprk3_packed_t4(
                scal, dxbt, dybt, ainct, astrt, bstrt, meta, s,
                qdp, pec, vu, vv, om, plan, rsp, eb=eb, nlev=k)
        return s, phi

    def hv_loop(s0, cst):
        dxbt, dybt, meta = cst[0], cst[1], cst[5]
        s = s0
        for _ in range(args.chunk):
            s = apply_hypervis_packed_t(
                dxbt, dybt, meta, s, plan, rsp,
                args.nu, jnp.float32(0.1), eb=eb, nlev=k)
        return (s,)

    def trc_loop(s0, qdp, cst):
        dxbt, dybt, meta = cst[0], cst[1], cst[5]
        q = qdp
        for _ in range(args.chunk):
            q = ssprk3_tracer_packed_t(
                dxbt, dybt, meta, s0, s0, q, plan, rsp,
                jnp.float32(0.1), eb=eb, nlev=k, wind_rows=(0, 1))
        return (q,)

    t_dyn = timed("ssprk3_dynamics", dyn_loop, (s0, qdp, cst), gp)
    t_hv = timed("hyperviscosity", hv_loop, (s0, cst), gp)
    t_trc = timed(f"tracers_q{args.qsize}", trc_loop, (s0, qdp, cst),
                  gp * args.qsize)

    # sub-stage split: fused Euler kernel alone vs DSS epilogue alone
    from tinman_sandbox_tpu.kernels.dss_pallas import (
        dss_structured_t_pallas_pre, ext_slot_arrays,
    )
    from tinman_sandbox_tpu.kernels.tracer_pallas_t import (
        tracer_euler_pallas_packed_t_ext,
    )
    e16 = qdp.shape[1]
    sf, nt = ext_slot_arrays(plan, e16 // 128)
    sfj = jnp.asarray(sf)
    tscal = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(0.1)

    def tk_loop(s0, qdp, cst):
        dxbt, dybt, meta = cst[0], cst[1], cst[5]
        q, xd = qdp, None
        for _ in range(args.chunk):
            q, xd = tracer_euler_pallas_packed_t_ext(
                tscal, dxbt, dybt, meta, s0, s0, q, sfj, nt=nt, nlev=k,
                wind_rows=(0, 1))
        return q, xd

    def td_loop(q0, xd0, qdp):
        q, xd = q0, xd0
        for _ in range(args.chunk):
            q = dss_structured_t_pallas_pre(
                q, xd, plan, rsp, mix=(qdp, np.float32(0.75),
                                       np.float32(0.25)))
        return (q,)

    t_tk = timed(f"tracer_kernel_q{args.qsize}", tk_loop, (s0, qdp, cst),
                 gp * args.qsize)
    q0, xd0 = jax.jit(tracer_euler_pallas_packed_t_ext,
                      static_argnames=("nt", "nlev", "wind_rows"))(
        tscal, p["dxbt"], p["dybt"], p["meta"], s0, s0, qdp, sfj,
        nt=nt, nlev=k, wind_rows=(0, 1))
    t_td = timed(f"tracer_dss_q{args.qsize}", td_loop, (q0, xd0, qdp),
                 gp * args.qsize)
    print(json.dumps({"sum_us": round((t_dyn + t_hv + t_trc) * 1e6, 1),
                      "ne": args.ne, "qsize": args.qsize,
                      "note": "composed bench.py --prim adds nothing else; "
                              "diff vs composed = dispatch/fusion slack"}),
          flush=True)


if __name__ == "__main__":
    main()
