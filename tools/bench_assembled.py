#!/usr/bin/env python3
"""One-process sweep of the ne30 ASSEMBLED-step variants on the real TPU.

Runs the fused CAAR kernel + DSS epilogue for several assembly strategies
(structured sweeps vs alias gather; chunked dispatch; bf16 storage) with
per-variant best-of-reps timing. Sharing one process keeps the jit cache
warm across variants that reuse the same kernel shape (remote compiles are
minutes each through the tunnel).

    python tools/bench_assembled.py --ne 30 --nexec 100 --reps 2
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
    ap.add_argument("--nexec", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--eb", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=10,
                    help="steps unrolled per jit dispatch")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
    from tinman_sandbox_tpu.dist import build_cubed_sphere
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_pallas_packed, caar_dss_structured_packed, make_packed_dss,
    )
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas import (
        _scalars, caar_pallas_packed, pack_problem,
    )
    from tinman_sandbox_tpu.kernels.layout import pack_field

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, elem_block=args.eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st, dv = cast(random_state(cfg, seed=7)), cast(zero_derived(cfg))
    geom = cast(cs.geometry)
    hv = analytic_hvcoord(cfg).astype(np.float32)
    print(f"# ne={args.ne}: {cfg.nelem} elements x {args.nlev} levels, "
          f"eb={args.eb}, backend={jax.default_backend()}", flush=True)

    plan = make_structured_plan(cs.gdof, args.ne)
    gdof_rows, rsp_g = make_packed_dss(cs.gdof, geom.rspheremp)
    rsp = pack_field(jnp.broadcast_to(
        jnp.asarray(geom.rspheremp, jnp.float32)[:, None],
        (cfg.nelem, 1, 4, 4)))
    scal = _scalars(np.float32(0.1), np.float32(1.0), hv)

    def operands(storage):
        p = pack_problem(st, dv, geom, hv, cfg, storage=storage)
        return (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
                p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
                p["um1"], p["vm1"], p["tm1"], p["dpm1"],
                p["qdp"], p["pecnd"]), (p["vn0u"], p["vn0v"], p["omg"])

    ops_f32, acc0 = operands("f32")

    def v_kernel_only(ops, acc):
        return caar_pallas_packed(*ops, *acc, eb=args.eb, nlev=args.nlev)

    def v_structured(ops, acc):
        return caar_dss_structured_packed(*ops, *acc, plan, rsp,
                                          eb=args.eb, nlev=args.nlev)

    def v_structured_c5(ops, acc):
        return caar_dss_structured_packed(*ops, *acc, plan, rsp,
                                          eb=args.eb, nlev=args.nlev,
                                          chunks=5)

    def v_structured_nostack(ops, acc):
        return caar_dss_structured_packed(*ops, *acc, plan, rsp,
                                          eb=args.eb, nlev=args.nlev,
                                          stack_dss=False)

    def v_gather(ops, acc):
        return caar_dss_pallas_packed(*ops, *acc, gdof_rows, rsp_g,
                                      eb=args.eb, nlev=args.nlev,
                                      ndof=cs.ndof)

    ops_bf16 = None

    def v_structured_bf16(ops, acc):
        return caar_dss_structured_packed(*ops, *acc, plan, rsp,
                                          eb=args.eb, nlev=args.nlev)

    def v_structured_bf16_c5(ops, acc):
        return caar_dss_structured_packed(*ops, *acc, plan, rsp,
                                          eb=args.eb, nlev=args.nlev,
                                          chunks=5)

    def v_kernel_only_c5(ops, acc):
        e16 = ops[7].shape[0]
        rows = e16 // 5
        outs = []
        for c in range(5):
            sl = slice(c * rows, (c + 1) * rows)
            outs.append(caar_pallas_packed(
                ops[0], *ops[1:6], ops[6][sl],
                *(ops[i][sl] for i in range(7, 17)),
                *(a[sl] for a in acc), eb=args.eb, nlev=args.nlev))
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(8))

    # -- transposed-layout variants (kernels/caar_pallas_t.py) --
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas_t import (
        caar_pallas_packed_t, pack_problem_t,
    )

    pt = pack_problem_t(st, dv, geom, hv, cfg)
    ops0_t = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
              pt["bstrt"], pt["meta"], pt["u0"], pt["v0"], pt["t0"],
              pt["dp0"], pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"],
              pt["qdp"], pt["pecnd"])
    acc0_t = (pt["vn0u"], pt["vn0v"], pt["omg"])
    rsp_t = jnp.asarray(geom.rspheremp, jnp.float32).reshape(1, -1)

    def v_t_kernel_only(ops, acc):
        return caar_pallas_packed_t(*ops, *acc, eb=args.eb, nlev=args.nlev)

    def v_t_structured(ops, acc):
        return caar_dss_structured_packed_t(*ops, *acc, plan, rsp_t,
                                            eb=args.eb, nlev=args.nlev)

    def v_t_structured_slice(ops, acc):
        return caar_dss_structured_packed_t(*ops, *acc, plan, rsp_t,
                                            eb=args.eb, nlev=args.nlev,
                                            impl="slice")

    def v_t_structured_roll(ops, acc):
        return caar_dss_structured_packed_t(*ops, *acc, plan, rsp_t,
                                            eb=args.eb, nlev=args.nlev,
                                            impl="roll")

    def v_t_structured_nostack(ops, acc):
        return caar_dss_structured_packed_t(*ops, *acc, plan, rsp_t,
                                            eb=args.eb, nlev=args.nlev,
                                            stack_dss=False)

    # stacked-state variant: prognostics in ONE [4*nlev, E16] buffer, one
    # DSS pass, no concat/split. ops layout: (const[0:7], s0, sm1, qdp,
    # pecnd); the rotation in multi() handles both layouts via slicing.
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4,
    )

    s0_0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    sm1_0 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"], pt["dpm1"]],
                            axis=0)
    ops0_t4 = ops0_t[:7] + (s0_0, sm1_0, pt["qdp"], pt["pecnd"])

    def v_t4_structured(ops, acc):
        return caar_dss_structured_packed_t4(*ops, *acc, plan, rsp_t,
                                             eb=args.eb, nlev=args.nlev)

    # bf16 read-only storage on the stacked path: nm1 state + qdp + pecnd
    # in bf16 (the kernel upcasts in VMEM), f32 compute and outputs
    bf = lambda x: jnp.asarray(x, jnp.bfloat16)
    ops0_t4_bf16 = ops0_t[:7] + (s0_0, bf(sm1_0), bf(pt["qdp"]),
                                 bf(pt["pecnd"]))

    def v_t4_structured_bf16ro(ops, acc):
        return caar_dss_structured_packed_t4(*ops, *acc, plan, rsp_t,
                                             eb=args.eb, nlev=args.nlev)

    def v_t4_structured_vdt(ops, acc):
        # transposed vals buffer: XLA row-scatter + in-kernel flip
        return caar_dss_structured_packed_t4(*ops, *acc, plan, rsp_t,
                                             eb=args.eb, nlev=args.nlev,
                                             vdt=True)

    def v_t4_structured_nofuse(ops, acc):
        # A/B control: separate extract_tiles_t dispatch instead of the
        # producer-fused slab output
        return caar_dss_structured_packed_t4(*ops, *acc, plan, rsp_t,
                                             eb=args.eb, nlev=args.nlev,
                                             fuse_extract=False)

    def v_t4_structured_densevd(ops, acc):
        # A/B control: producer-fused but 128-DENSE slab + tile-dense vals
        # (compact fix-lane layout is the default since round 3)
        return caar_dss_structured_packed_t4(*ops, *acc, plan, rsp_t,
                                             eb=args.eb, nlev=args.nlev,
                                             compact=False)

    variants = {
        "kernel_only": v_kernel_only,
        "t_kernel_only": v_t_kernel_only,
        "t_structured": v_t_structured,          # impl=pallas (default)
        "t_structured_slice": v_t_structured_slice,
        "t_structured_roll": v_t_structured_roll,
        "t_structured_nostack": v_t_structured_nostack,
        "t4_structured": v_t4_structured,        # fused + compact default
        "t4_structured_nofuse": v_t4_structured_nofuse,
        "t4_structured_densevd": v_t4_structured_densevd,
        "t4_structured_bf16ro": v_t4_structured_bf16ro,
        "t4_structured_vdt": v_t4_structured_vdt,
        "kernel_only_chunks5": v_kernel_only_c5,
        "structured": v_structured,
        "structured_chunks5": v_structured_c5,
        "structured_nostack": v_structured_nostack,
        "gather": v_gather,
        "structured_bf16ro": v_structured_bf16,
        "structured_bf16ro_chunks5": v_structured_bf16_c5,
    }
    names = args.variants or list(variants)

    results = {}
    for name in names:
        fn = variants[name]
        if "bf16" in name and ops_bf16 is None:
            ops_bf16, _ = operands("bf16_ro")
        chunk = max(1, args.chunk)

        import functools

        # HONEST chaining: the assembled np1 fields must feed the next
        # step's n0 (leapfrog rotation), otherwise XLA dead-code-eliminates
        # the DSS epilogue for every unrolled iteration but the last and the
        # sweep reports kernel-only numbers (the round-2 1851/1528 us
        # entries were inflated this way). Kernel-only variants have no
        # epilogue, so the same rotation keeps them comparable.
        t4 = name.startswith("t4_")

        @functools.partial(jax.jit, static_argnames=())
        def multi(ops, acc, fn=fn, t4=t4):
            for _ in range(chunk):
                o = fn(ops, acc)
                if t4:
                    # stacked layout: (consts, s0, sm1, qdp, pecnd);
                    # keep the nm1 slot's storage dtype (bf16_ro variants)
                    ops = ops[:7] + (o[0], jnp.asarray(ops[7],
                                                       ops[8].dtype)) \
                        + ops[9:11]
                    acc = (o[2], o[3], o[4])
                else:
                    # rotate: np1 -> n0, n0 -> nm1 (cast to the nm1 slots'
                    # storage dtype so bf16_ro variants stay dtype-stable)
                    nm1 = tuple(jnp.asarray(x, d.dtype)
                                for x, d in zip(ops[7:11], ops[11:15]))
                    ops = ops[:7] + tuple(o[:4]) + nm1 + ops[15:17]
                acc = (o[5], o[6], o[7]) if not t4 else acc
            return ops, acc, o

        def run(nsteps):
            nchunks = -(-nsteps // chunk)
            ops = (ops0_t4_bf16 if "bf16" in name else ops0_t4) if t4 \
                else ops0_t if name.startswith("t_") else \
                (ops_bf16 if "bf16" in name else ops_f32)
            acc = acc0_t if (name.startswith("t_") or t4) else acc0
            for _ in range(nchunks):
                ops, acc, o = multi(ops, acc)
            float(jnp.sum(o[0][:: max(1, o[0].shape[0] // 8)]))  # readback
            return nchunks * chunk

        t0 = time.time()
        try:
            run(2 * chunk)   # compile + warm
        except NotImplementedError as e:
            # e.g. the vdt vals layout cannot lower on TPU
            results[name] = {"skipped": str(e)}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        print(f"# {name}: compiled in {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = run(args.nexec)
            best = min(best, (time.perf_counter() - t0) / n)
        gps = cfg.nelem * args.nlev * 16 / best
        results[name] = {"us_per_step": round(best * 1e6, 1),
                         "ggp_per_s": round(gps / 1e9, 2)}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"sweep": results, "nelem": cfg.nelem,
                      "nlev": args.nlev, "eb": args.eb,
                      "nexec": args.nexec}), flush=True)


if __name__ == "__main__":
    main()
