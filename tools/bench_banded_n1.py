"""On-chip cost of the banded shard BODY at N=1 (degenerate mesh).

No pod slice exists, so the banded multi-chip cadence cannot be timed
across real chips — but its per-shard PROGRAM can: on a 1-device mesh
the collectives degenerate (self-ppermute, identity gather) and what
remains is exactly the per-shard body the weak-scaling model prices
(SCALING_MODEL.md "compute bytes/shard"): lane-grouped CAAR kernel +
[band|next|prev] extension + affine fixup + banded compact sweep.
Comparing against the single-chip fused step on the same grid measures
the banded FORMULATION's overhead (halo-extension copies, per-chunk
variant masks, affine vals selection) — the model assumes it is small.

    python tools/bench_banded_n1.py [--ne 30] [--m 5] [--nexec 40]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=30)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--m", type=int, default=5)
    ap.add_argument("--nexec", type=int, default=40)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--prim", action="store_true",
                    help="also time the FULL banded prim cadence "
                         "(dynamics + hypervis + tracer) vs the packed "
                         "single-chip cadence")
    ap.add_argument("--qsize", type=int, default=1)
    ap.add_argument("--tag", default="banded_n1_r5")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.banded_t4 import caar_dss_banded_t4
    from tinman_sandbox_tpu.dist.cubed_sphere import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, elem_block=8)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, args.ne)
    pt = pack_problem_t(st, dv, g, hv, cfg)
    scal = _scalars(0.5, 1.0, hv)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                          axis=0)
    k = args.nlev
    e16 = s0.shape[1]
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("e",))
    rb = lambda x: float(jnp.sum(x[:, ::512]))

    def timed(fn, n1, n2):
        fn(3)
        t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
        fn(3)
        t2 = time.perf_counter(); fn(n2); t3 = time.perf_counter()
        return ((t3 - t2) - (t1 - t0)) / (n2 - n1) * 1e6

    def banded(n):
        s, smm = s0, sm1
        with mesh:
            for _ in range(n):
                out = caar_dss_banded_t4(
                    scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
                    pt["bstrt"], pt["meta"], s, smm, pt["qdp"], pt["pecnd"],
                    pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh,
                    args.m, eb=8, nlev=k)
                s, smm = out[0], s
        return rb(s)

    def single(n):
        s, smm = s0, sm1
        for _ in range(n):
            out = caar_dss_structured_packed_t4(
                scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
                pt["bstrt"], pt["meta"], s, smm, pt["qdp"], pt["pecnd"],
                pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
                eb=8, nlev=k)
            s, smm = out[0], s
        return rb(s)

    n1, n2 = args.nexec // 3, args.nexec
    res = {}
    for name, fn in (("single_chip_fused", single),
                     ("banded_body_n1", banded)):
        best = min(timed(fn, n1, n2) for _ in range(args.reps))
        res[name] = round(best, 1)
        print(f"{name:20s} {best:9.1f} us/step", flush=True)

    if args.prim:
        from tinman_sandbox_tpu.dist.prim_banded import prim_step_banded_t4
        from tinman_sandbox_tpu.dist.step_pallas import prim_step_packed_t4
        from tinman_sandbox_tpu.kernels.layout import pack_field_t

        qdp0 = jnp.concatenate(
            [pack_field_t(jnp.asarray(st.qdp[cfg.qn0, :, q], jnp.float32))
             for q in range(args.qsize)], axis=0)
        scal_p = _scalars(0.02, 1.0, hv)
        nu = 2.5e-4
        base = (scal_p, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
                pt["bstrt"], pt["meta"])
        acc = (pt["vn0u"], pt["vn0v"], pt["omg"])

        def prim_single(n):
            s, q = s0, qdp0
            for _ in range(n):
                s, q, phi, a, b, c = prim_step_packed_t4(
                    *base, s, q, pt["pecnd"], *acc, plan, rsp, nu,
                    eb=8, nlev=k, qsplit=1)
            return rb(s)

        def prim_banded_n1(n):
            s, q = s0, qdp0
            with mesh:
                for _ in range(n):
                    s, q, phi, a, b, c = prim_step_banded_t4(
                        *base, s, q, pt["pecnd"], *acc, plan, rsp, mesh,
                        args.m, nu, eb=8, nlev=k, qsplit=1)
            return rb(s)

        def prim_banded_ov(n):
            s, q = s0, qdp0
            with mesh:
                for _ in range(n):
                    s, q, phi, a, b, c = prim_step_banded_t4(
                        *base, s, q, pt["pecnd"], *acc, plan, rsp, mesh,
                        args.m, nu, eb=8, nlev=k, qsplit=1, overlap=True)
            return rb(s)

        np1_, np2_ = max(3, args.nexec // 6), max(9, args.nexec // 2)
        for name, fn in (("prim_single_chip", prim_single),
                         ("prim_banded_n1", prim_banded_n1),
                         ("prim_banded_n1_overlap", prim_banded_ov)):
            best = min(timed(fn, np1_, np2_) for _ in range(args.reps))
            res[name] = round(best, 1)
            print(f"{name:22s} {best:9.1f} us/step", flush=True)
    res["overhead_pct"] = round(
        100.0 * (res["banded_body_n1"] / res["single_chip_fused"] - 1.0), 1)
    from tinman_sandbox_tpu import fastpath

    lp = os.path.join(HERE, "BENCH_LOCAL.json")
    local = json.load(open(lp)) if os.path.exists(lp) else {}
    local[args.tag] = {
        "date": time.strftime("%Y-%m-%d"),
        "config": f"ne{args.ne}x{k} m={args.m} N=1 marginal-slope "
                  f"nexec={args.nexec}",
        "path": dict(fastpath.last_path),
        **res,
    }
    with open(lp, "w") as f:
        json.dump(local, f, indent=1)
    print(json.dumps({args.tag: res}))


if __name__ == "__main__":
    main()
