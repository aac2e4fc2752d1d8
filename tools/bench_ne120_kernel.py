#!/usr/bin/env python3
"""ne120 CAAR kernel-at-scale A/B ledger (VERDICT r3 item 1).

At 86,400 elements the eb=8 transposed kernel measured ~500 GB/s vs
599 GB/s at 1,024 elements. Candidate causes and the variant that tests
each one (all honest-chained: np1 feeds the next step's n0 under buffer
donation, the methodology that produced the 16.7 ms round-3 number):

  * per-grid-step fixed overhead (10,800 blocks vs 128)  -> lg=2/4/8
    lane-grouped kernel: same 128-lane MXU shapes and fp-op order, grid
    length / lg (kernels/caar_pallas_t.py::caar_pallas_packed_t4_lg);
  * MXU utilisation at wider blocks                      -> eb=16
    (doubles the per-lane dot flops: [72,256]@[256,256] block-diag);
  * dispatch-boundary effects                            -> chunk=1 vs 10
    (steps unrolled per jit dispatch).

Usage:  python tools/bench_ne120_kernel.py [--ne 120] [--nexec 30]
        [--reps 2] [--chunk 10] [--variants eb8 lg4 ...]

Appends results to BENCH_LOCAL.json under "ne120_kernel_ab_r4".
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps stacks
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=120)
    ap.add_argument("--nelem", type=int, default=None,
                    help="raw element count override (e.g. 1024, the "
                         "headline config) instead of 6*ne^2")
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--nexec", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--tag", default="ne120_kernel_ab_r4")
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from functools import partial

    from tinman_sandbox_tpu import Config
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import (
        caar_pallas_packed_t4, caar_pallas_packed_t4_lg,
        random_packed_problem_t,
    )

    nelem = args.nelem or 6 * args.ne * args.ne
    k = args.nlev
    cfg = Config(nelem=nelem, nlev=k, elem_block=8, dtype="float32")
    p = random_packed_problem_t(cfg, seed=7)
    from tinman_sandbox_tpu import analytic_hvcoord

    hv = analytic_hvcoord(cfg).astype(jnp.float32)
    scal = _scalars(jnp.float32(0.1), jnp.float32(1.0), hv)
    s0 = jnp.concatenate([p["u0"], p["v0"], p["t0"], p["dp0"]], axis=0)
    sm1 = jnp.concatenate([p["um1"], p["vm1"], p["tm1"], p["dpm1"]], axis=0)
    com = (scal, p["dxbt"], p["dybt"], p["ainct"], p["astrt"], p["bstrt"],
           p["meta"])
    fixed = (p["qdp"], p["pecnd"])
    acc0 = (p["vn0u"], p["vn0v"], p["omg"])
    # free the per-field views
    for key in ("u0", "v0", "t0", "dp0", "um1", "vm1", "tm1", "dpm1"):
        del p[key]
    e16 = s0.shape[1]
    print(f"# nelem={nelem} elem x {k} lev ({e16} lanes), "
          f"backend={jax.default_backend()}, chunk={args.chunk}",
          flush=True)

    # eb=16 needs its own block-diagonal derivative operators
    from tinman_sandbox_tpu.kernels.layout import block_derivative_ops
    from tinman_sandbox_tpu.grid import dvv_matrix
    import numpy as np

    def com_eb(eb):
        dxb, dyb = block_derivative_ops(eb, dvv_matrix(np.float32),
                                        np.float32)
        return (scal, jnp.asarray(dxb).T, jnp.asarray(dyb).T,
                p["ainct"], p["astrt"], p["bstrt"], p["meta"])

    def make_run(one, chunk, cst):
        # cst (derivative operators + meta + qdp/pecnd, ~1 GB at ne120)
        # MUST ride as jit arguments: a closure bakes them into the HLO as
        # constants and the client serializes the whole blob per compile
        # (observed: >15 min client-CPU-bound "compile" per variant)
        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def multi(cst, s0, sm1, acc):
            for _ in range(chunk):
                o = one(cst, s0, sm1, acc)
                s0, sm1 = o[0], s0
                acc = (o[2], o[3], o[4])
            return s0, sm1, acc, o[1]

        def run(nsteps, st):
            nchunks = -(-nsteps // chunk)
            for _ in range(nchunks):
                st = multi(cst, *st[:3])
            # device->host readback (axon block_until_ready returns early)
            float(jnp.sum(st[3][:, :: max(1, e16 // 8)]))
            return nchunks * chunk, st

        return run

    cst0 = com + fixed                   # 9-tuple jit argument
    variants = {}
    variants["eb8"] = lambda: make_run(
        lambda t, a, b, c: caar_pallas_packed_t4(
            *t[:7], a, b, t[7], t[8], *c, eb=8, nlev=k),
        args.chunk, cst0)
    variants["eb16"] = lambda: make_run(
        lambda t, a, b, c: caar_pallas_packed_t4(
            *t[:7], a, b, t[7], t[8], *c, eb=16, nlev=k),
        args.chunk, com_eb(16) + fixed)
    for lg in (2, 3, 4, 5, 6, 8):
        variants[f"lg{lg}"] = (lambda lg: lambda: make_run(
            lambda t, a, b, c: caar_pallas_packed_t4_lg(
                *t[:7], a, b, t[7], t[8], *c, nlev=k, lg=lg),
            args.chunk, cst0))(lg)
    variants["eb8_chunk1"] = lambda: make_run(
        lambda t, a, b, c: caar_pallas_packed_t4(
            *t[:7], a, b, t[7], t[8], *c, eb=8, nlev=k), 1, cst0)

    names = args.variants or list(variants)
    results = {}
    for name in names:
        try:
            run = variants[name]()
            st = (s0, sm1, acc0, s0[:k])
            print(f"{name}: warmup...", flush=True)
            t0 = time.perf_counter()
            _, st = run(2, st)
            warm = time.perf_counter() - t0
            best = float("inf")
            done = args.nexec
            for _ in range(args.reps):
                t0 = time.perf_counter()
                done, st = run(args.nexec, st)
                best = min(best, time.perf_counter() - t0)
            # chained state is donated away; rebuild for the next variant
            s0n, sm1n = st[0], st[1]
            us = best / done * 1e6
            nbytes = 22 * e16 * k * 4
            gbs = nbytes * done / best / 1e9
            results[name] = {"us_per_step": round(us, 1),
                             "gb_per_s": round(gbs, 1),
                             "warmup_s": round(warm, 1)}
            print(f"{name:12s} {us:9.1f} us/step  {gbs:6.1f} GB/s "
                  f"(warm {warm:.0f}s)", flush=True)
            del st, s0n, sm1n
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(f"{name:12s} ERROR {str(e)[:200]}", flush=True)
        # donation consumed s0/sm1/acc0: rebuild fresh copies
        p2 = random_packed_problem_t(cfg, seed=7)
        s0 = jnp.concatenate([p2["u0"], p2["v0"], p2["t0"], p2["dp0"]],
                             axis=0)
        sm1 = jnp.concatenate([p2["um1"], p2["vm1"], p2["tm1"], p2["dpm1"]],
                              axis=0)
        acc0 = (p2["vn0u"], p2["vn0v"], p2["omg"])
        del p2

    lp = os.path.join(HERE, "BENCH_LOCAL.json")
    local = json.load(open(lp)) if os.path.exists(lp) else {}
    local[args.tag] = {
        "date": time.strftime("%Y-%m-%d"),
        "config": f"ne{args.ne} {nelem}x{k} chunk={args.chunk} "
                  f"nexec={args.nexec} honest-chained donated",
        **results,
    }
    with open(lp, "w") as f:
        json.dump(local, f, indent=1)
    print(json.dumps({args.tag: results}))


if __name__ == "__main__":
    main()
