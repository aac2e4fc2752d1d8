"""Stage-level decomposition of the fused in-kernel tracer limiter
(VERDICT r4 item 3: turn "~1 us/block above the algorithmic floor" into
arithmetic).

Times, on the real TPU, the SSPRK3 tracer stage (the limiter's host) at
the reference's QSIZE_D=35 x nlev=72 shape under a ladder of configs
whose DIFFERENCES isolate each limiter stage:

  nolimit              — advection + DSS only (the stage's bytes floor)
  iters=0              — + bounds reduce (group min/max), 2-limb mass
                         sums, and the exact-conservation residual pass
                         (the clip loop never runs)
  iters=1              — + one clip+redistribute iteration
  iters=2 (default)    — + the second iteration (production config)
  iters=2 transpose2   — the r4-untested packed single-back-transpose
                         group min/max candidate
  iters=2 roll         — the butterfly min/max (reference point)

The limiter adds ZERO HBM traffic (all stages run in-VMEM on the kernel
block), so every marginal here is pure in-core time; the floor question
is whether the per-iteration marginal matches its VPU pass count.

Timing discipline: the axon tunnel's block_until_ready returns early, so
each measurement chains N stage calls through a device readback and the
fixed ~25-40 ms sync is removed by the two-point marginal slope.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n1=10, n2=30):
    fn(3)  # warm (compile + first exec)
    t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
    fn(3)
    t2 = time.perf_counter(); fn(n2); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n2 - n1) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=30)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--qsize", type=int, default=35)
    ap.add_argument("--lg", type=int, default=0,
                    help="lane-group width for the nolimit stage (0 auto)")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.dist.cubed_sphere import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import ssprk3_tracer_packed_t
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, elem_block=8,
                 qsize=args.qsize)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=8))
    dv = cast(zero_derived(cfg))
    hv = analytic_hvcoord(cfg).astype(np.float32)
    g = cast(cs.geometry)
    plan = make_structured_plan(cs.gdof, args.ne)
    p = pack_problem_t(st, dv, g, hv, cfg)
    rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
    k = args.nlev
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    qdp0 = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[cfg.qn0, :, q], jnp.float32))
         for q in range(args.qsize)], axis=0)
    dt = jnp.float32(0.02)
    e16 = s0.shape[1]
    nblocks = e16 // 128
    rb = lambda x: float(jnp.sum(x[:, ::512]))

    def make(limit, iters=2, strategy="transpose", lg=0):
        def run(n):
            q = qdp0
            for _ in range(n):
                q = ssprk3_tracer_packed_t(
                    p["dxbt"], p["dybt"], p["meta"], s0, s0, q, plan, rsp,
                    dt, eb=8, nlev=k, limit=limit, wind_rows=(0, 1),
                    lg=lg, limit_iters=iters, limit_strategy=strategy)
            return rb(q)
        return run

    qk = args.qsize * args.nlev
    print(f"# q{args.qsize} tracer stage, ne{args.ne} x {args.nlev} "
          f"({e16} lanes, {nblocks} blocks, qk={qk})", flush=True)
    res = {}
    configs = [
        ("nolimit", dict(limit=False, lg=args.lg)),
        ("limit_i0", dict(limit=True, iters=0)),
        ("limit_i1", dict(limit=True, iters=1)),
        ("limit_i2", dict(limit=True, iters=2)),
        ("limit_i2_t2", dict(limit=True, iters=2, strategy="transpose2")),
        ("limit_i1_t2", dict(limit=True, iters=1, strategy="transpose2")),
        ("limit_i2_roll", dict(limit=True, iters=2, strategy="roll")),
    ]
    for name, kw in configs:
        us = timed(make(**kw))
        res[name] = us
        print(f"{name:16s} {us/1000.0:9.3f} ms/stage-call "
              f"({us/nblocks/3.0:6.3f} us/block/SSP-stage)", flush=True)

    # marginals: each limiter stage isolated by differences (3 SSP stages
    # per call; per-block = / nblocks / 3)
    pb = lambda a, b: (res[a] - res[b]) / nblocks / 3.0
    dec = {
        "bounds+sums+residual_us_per_block": pb("limit_i0", "nolimit"),
        "iteration1_us_per_block": pb("limit_i1", "limit_i0"),
        "iteration2_us_per_block": pb("limit_i2", "limit_i1"),
        "minmax_transpose2_delta_us_per_block":
            pb("limit_i2_t2", "limit_i2"),
        "minmax_roll_delta_us_per_block": pb("limit_i2_roll", "limit_i2"),
    }
    print("\n# decomposition (us/block/SSP-stage):")
    for kk, v in dec.items():
        print(f"  {kk:44s} {v:+7.3f}")
    out = dict(shape=f"ne{args.ne}x{args.nlev} q{args.qsize}",
               nblocks=nblocks, stage_us=res, decomposition=dec)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
