"""Command-line driver — the reference's benchmark mains as one CLI.

Covers the flag surface of cxx/basic/main.cpp:36-91 (--tinman-num-elems /
--tinman-num-exec / --tinman-dump-res), fortran/main.F90:15-20 (positional
nelemd), and kokkos_init.cpp:87-103, plus framework-specific options
(kernel selection, dtype, cubed-sphere mode, checkpointing).

    python -m tinman_sandbox_tpu --num-elems 32 --num-exec 720
    python -m tinman_sandbox_tpu --ne 8 --dss --num-exec 100 --leapfrog
"""
from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tinman_sandbox_tpu",
        description="TPU-native HOMME CAAR dynamical-core sandbox",
    )
    ap.add_argument("--num-elems", "--tinman-num-elems", type=int, default=10,
                    dest="num_elems")
    ap.add_argument("--num-exec", "--tinman-num-exec", type=int, default=1,
                    dest="num_exec")
    ap.add_argument("--dump-res", "--tinman-dump-res", default="no",
                    choices=("yes", "no"), dest="dump_res")
    ap.add_argument("--ne", type=int, default=None,
                    help="cubed-sphere resolution (overrides --num-elems)")
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--qsize", type=int, default=1)
    ap.add_argument("--dt", type=float, default=600.0)
    ap.add_argument("--dtype", default="float64",
                    help="float64 (oracle, CPU) or float32 (fast path)")
    ap.add_argument("--kernel", default="auto",
                    choices=("auto", "xla", "pallas"))
    ap.add_argument("--layout", default="t", choices=("t", "row"),
                    help="Pallas packed layout: 't' = transposed [nlev, E16]"
                         " (padding-free, ~1.5x faster; default), 'row' = "
                         "[E16, nlev]")
    ap.add_argument("--init", default="analytic",
                    choices=("analytic", "random"),
                    help="analytic = golden-comparable init (main.F90:103-154)")
    ap.add_argument("--leapfrog", action="store_true",
                    help="rotate time levels each step (real integration)")
    ap.add_argument("--dss", action="store_true",
                    help="assemble shared dofs each step (needs --ne)")
    ap.add_argument("--prim", action="store_true",
                    help="full prim cadence (SSPRK3 dynamics + biharmonic "
                         "hyperviscosity via --hypervis-nu + SSPRK3 "
                         "tracers); fused packed Pallas path when the "
                         "kernel resolves to pallas, else timeloop.prim")
    ap.add_argument("--rk", action="store_true",
                    help="SSPRK3 integration instead of the CAAR apply")
    ap.add_argument("--hypervis-nu", type=float, default=0.0,
                    help="biharmonic hyperviscosity coefficient (needs --ne)")
    ap.add_argument("--diag", action="store_true",
                    help="print global energy/mass diagnostics")
    ap.add_argument("--checkpoint", default=None,
                    help="write a checkpoint here at the end (*.npz = "
                         "atomic npz; any other path = orbax async dir)")
    ap.add_argument("--restore", default=None,
                    help="resume from this checkpoint (.npz or orbax dir)")
    ap.add_argument("--timing-file", default=None,
                    help="write named-region timer summary (Timing.dat analog)")
    ap.add_argument("--golden-check", action="store_true",
                    help="compare element 1 vs test_mod.F90 golden arrays")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
        if jax.default_backend() == "tpu":
            print(" --- float64 on TPU uses emulation; CPU recommended for the oracle path")

    from . import (
        Config, analytic_derived, analytic_geometry, analytic_hvcoord,
        analytic_state, random_geometry, random_state, zero_derived,
    )
    from .ops.norms import dump_results, print_results_2norm
    from .profiling import timers

    dtype = np.dtype(args.dtype)
    cs = None
    if args.ne is not None:
        from .dist import build_cubed_sphere

        cs = build_cubed_sphere(args.ne)
        nelem = cs.nelem
    else:
        nelem = args.num_elems
    cfg = Config(nelem=nelem, nlev=args.nlev, qsize=args.qsize, dt=args.dt,
                 dtype=args.dtype)

    cast = lambda tree: jax.tree.map(lambda x: np.asarray(x, dtype), tree)
    if args.init == "analytic":
        state, derived = cast(analytic_state(cfg)), cast(analytic_derived(cfg))
    else:
        state, derived = cast(random_state(cfg, seed=7)), cast(zero_derived(cfg))
    geom = cast(cs.geometry) if cs is not None else (
        cast(analytic_geometry(cfg)) if args.init == "analytic"
        else cast(random_geometry(cfg, seed=8))
    )
    hv = analytic_hvcoord(cfg).astype(dtype)

    step = 0
    if args.restore:
        if args.restore.endswith(".npz"):
            from .timeloop import load_checkpoint as _load
        else:
            from .timeloop import load_checkpoint_orbax as _load

        state, derived, cfg, step = _load(args.restore, cfg)
        print(f" --- restored step {step} from {args.restore}")

    pallas_interpret = False
    if args.kernel == "pallas" and jax.default_backend() != "tpu":
        # compiled pallas_call has no CPU lowering; interpret mode keeps the
        # flag usable (slowly) off-TPU instead of crashing
        print(" --- pallas on a non-TPU backend: using interpret mode")
        pallas_interpret = True
    use_pallas = args.kernel == "pallas" or (
        args.kernel == "auto" and jax.default_backend() == "tpu"
        and args.dtype == "float32" and not args.rk
    )
    pallas_dss = args.dss and use_pallas and nelem % cfg.elem_block == 0
    prim_packed = (args.prim and use_pallas and args.layout == "t"
                   and args.dtype == "float32"
                   and nelem % cfg.elem_block == 0)
    mode = ("prim-packed(ssprk3+hypervis+tracers)" if prim_packed
            else "prim(ssprk3+hypervis+tracers)" if args.prim
            else "ssprk3+dss" if args.rk
            else "pallas+structured-dss" if pallas_dss
            else "caar+dss" if args.dss
            else "pallas" if use_pallas else "xla")
    print(f" --- {args.num_exec} executions on {nelem} elements x {cfg.nlev} "
          f"levels ({mode} kernel, {args.dtype})")
    print_results_2norm(state, "Initial")

    dt2 = dtype.type(1.0 if args.init == "analytic" else args.dt)
    eta = dtype.type(1.0)

    import jax.numpy as jnp

    from .kernels import caar_xla
    from .timeloop import check_dp3d, rotated

    if (args.dss or args.rk or args.hypervis_nu or args.prim) and cs is None:
        print("error: --dss/--rk/--prim/--hypervis-nu require --ne",
              file=sys.stderr)
        return 1

    if args.prim and args.leapfrog:
        print("error: --prim manages its own time-level cadence; drop "
              "--leapfrog", file=sys.stderr)
        return 1

    if args.prim and not prim_packed:
        from .timeloop.prim import prim_run_step

        gdof = jnp.asarray(cs.gdof)
        # prim_run_step returns the rotated cfg; track it across the loop
        # (the freshest time level after the loop is the LAST-USED np1)
        prim_cfg = {"c": cfg, "used": cfg}

        def one_step(s, d, c):
            prim_cfg["used"] = prim_cfg["c"]
            s, d, c2 = prim_run_step(s, d, geom, hv, prim_cfg["c"], gdof,
                                     cs.ndof, nu=args.hypervis_nu)
            prim_cfg["c"] = c2
            return s, d
    elif args.prim:
        import dataclasses as _dc

        from .dist.step_pallas import prim_step_packed_t4
        from .dist.structured_dss import make_structured_plan
        from .kernels.caar_pallas import _scalars as _scal
        from .kernels.caar_pallas_t import pack_problem_t
        from .kernels.layout import pack_field_t, unpack_field_t

        plan = make_structured_plan(cs.gdof, cs.ne)
        pt = pack_problem_t(state, derived, geom, hv, cfg)
        scal_p = _scal(args.dt, 1.0, hv)
        from .dist.structured_dss import rsp_lanes_2f
        rsp_p = jnp.asarray(rsp_lanes_2f(geom.spheremp, cs.gdof, cs.ndof))
        prim_chain = {
            "s": jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]],
                                 axis=0),
            "q": jnp.concatenate(
                [pack_field_t(jnp.asarray(state.qdp[cfg.qn0, :, q],
                                          jnp.float32))
                 for q in range(cfg.qsize)], axis=0),
            "acc": (pt["vn0u"], pt["vn0v"], pt["omg"]),
        }

        def one_step(s, d, c):
            # chain entirely in the packed layout; unpack once at the end
            # (prim_finalize) — per-step unpacking would cost more than
            # the step itself
            s1, q1, phi, a, b, cc = prim_step_packed_t4(
                scal_p, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
                pt["bstrt"], pt["meta"], prim_chain["s"], prim_chain["q"],
                pt["pecnd"], *prim_chain["acc"], plan, rsp_p,
                args.hypervis_nu, eb=cfg.elem_block, nlev=cfg.nlev,
                interpret=pallas_interpret)
            prim_chain.update(s=s1, q=q1, acc=(a, b, cc), phi=phi)
            return s, d

        def prim_finalize(s, d, c):
            k = cfg.nlev
            s1, q1 = prim_chain["s"], prim_chain["q"]
            a, b, cc = prim_chain["acc"]
            unp = lambda x: unpack_field_t(x, cfg.nelem).astype(s.u.dtype)
            s = _dc.replace(
                s,
                u=jnp.asarray(s.u).at[c.np1].set(unp(s1[0:k])),
                v=jnp.asarray(s.v).at[c.np1].set(unp(s1[k:2 * k])),
                t=jnp.asarray(s.t).at[c.np1].set(unp(s1[2 * k:3 * k])),
                dp3d=jnp.asarray(s.dp3d).at[c.np1].set(unp(s1[3 * k:])),
                qdp=jnp.asarray(s.qdp).at[1 - c.qn0].set(jnp.stack(
                    [unp(q1[q * k:(q + 1) * k])
                     for q in range(cfg.qsize)], axis=1)),
            )
            d = _dc.replace(d, phi=unp(prim_chain["phi"]), vn0_u=unp(a),
                            vn0_v=unp(b), omega_p=unp(cc))
            return s, d
    elif args.rk:
        from .timeloop.rk import ssprk3_step

        gdof = jnp.asarray(cs.gdof)
        # RK is a real integration: always honor --dt (dt2=1.0 is only the
        # golden-comparison convention for the raw CAAR apply)
        rk_dt = dtype.type(args.dt)

        def one_step(s, d, c):
            return ssprk3_step(s, d, geom, hv, c, rk_dt, gdof=gdof,
                               ndof=cs.ndof)
    elif pallas_dss:
        from .dist.step_pallas import caar_dss_pallas

        dss_kind = "structured_t" if args.layout == "t" else "structured"

        def one_step(s, d, c):
            return caar_dss_pallas(s, d, geom, hv, cs.gdof, cs.ndof, c,
                                   dt2, eta, interpret=pallas_interpret,
                                   dss=dss_kind, ne=cs.ne)
    elif args.dss:
        from .dist import caar_dss_step

        gdof = jnp.asarray(cs.gdof)

        def one_step(s, d, c):
            return caar_dss_step(s, d, geom, hv, gdof, cs.ndof, c, dt2, eta)
    elif use_pallas:
        if args.layout == "t":
            from .kernels.caar_pallas_t import caar_pallas_t as _caar_fast
        else:
            from .kernels.caar_pallas import caar_pallas as _caar_fast

        def one_step(s, d, c):
            return _caar_fast(s, d, geom, hv, c, dt2, eta,
                              interpret=pallas_interpret)
    else:
        def one_step(s, d, c):
            return caar_xla(s, d, geom, hv, c, dt2, eta)

    if args.hypervis_nu and not args.prim:
        # --prim applies hyperviscosity inside its cadence
        from .timeloop.hyperviscosity import apply_hyperviscosity

        gdof_h = jnp.asarray(cs.gdof)

    if args.diag:
        from .ops.diagnostics import energy_diagnostics

        d0 = energy_diagnostics(state, geom.spheremp, cfg)
        print(" --- initial diagnostics: " + "  ".join(
            f"{k}={float(v):.6e}" for k, v in d0.items()))

    # warm-up (compile), excluded like the reference's burn-in (main.cpp:108)
    if prim_packed:
        prim_chain0 = dict(prim_chain)
    one_step(state, derived, cfg)
    if prim_packed:
        prim_chain.clear()
        prim_chain.update(prim_chain0)   # warm-up must not advance the chain
    elif args.prim:
        prim_cfg["c"] = prim_cfg["used"] = cfg

    timers.start("main loop")
    t0 = time.perf_counter()
    c = cfg
    for _ in range(args.num_exec):
        timers.start("caar compute")
        state, derived = one_step(state, derived, c)
        timers.stop("caar compute")
        if args.hypervis_nu and not args.prim:
            with timers.region("hyperviscosity"):
                state = apply_hyperviscosity(
                    state, geom, gdof_h, cs.ndof, c, nu=args.hypervis_nu,
                    dt=args.dt,
                )
        if args.leapfrog:
            c = rotated(c)
    if prim_packed:
        state, derived = prim_finalize(state, derived, c)
    elif args.prim:
        c = prim_cfg["used"]
    jax.block_until_ready((state, derived))
    wall = time.perf_counter() - t0
    timers.stop("main loop")
    step += args.num_exec

    if args.diag:
        d1 = energy_diagnostics(state, geom.spheremp, cfg,
                                tl=c.n0 if args.leapfrog else c.np1)
        print(" --- final diagnostics:   " + "  ".join(
            f"{k}={float(v):.6e}" for k, v in d1.items()))

    print_results_2norm(state, "Final")
    # after the final rotation the freshest level is c.n0, not c.np1
    import dataclasses as _dc
    c_chk = _dc.replace(c, np1=c.n0) if args.leapfrog else c
    ok, mn = check_dp3d(state, c_chk)
    if not bool(ok):
        print(f" --- WARNING: dp3d positivity violated (min {float(mn):.3e})")

    if args.golden_check and args.init == "analytic" and not args.leapfrog:
        from .golden import golden_caar

        gold = golden_caar()
        t_diff = float(np.max(np.abs(np.asarray(state.t[c.np1, 0]) - gold["T"])))
        u_diff = float(np.max(np.abs(np.asarray(state.u[c.np1, 0]) - gold["v1"])))
        v_diff = float(np.max(np.abs(np.asarray(state.v[c.np1, 0]) - gold["v2"])))
        print(f" --- golden diffs: T {t_diff:.3e}  u {u_diff:.3e}  v {v_diff:.3e}")

    gps = nelem * cfg.nlev * 16 * args.num_exec / wall
    print(f" ---> compute_and_apply_rhs execution total time: {wall:.9f} s "
          f"({gps/1e6:.1f} Mgridpoints/s)")

    if args.dump_res == "yes":
        for p in dump_results(state, c):
            print(f" --- dumped {p}")
    if args.checkpoint:
        if args.checkpoint.endswith(".npz"):
            from .timeloop import save_checkpoint

            save_checkpoint(args.checkpoint, state, derived, c, step)
        else:
            from .timeloop import save_checkpoint_orbax

            save_checkpoint_orbax(args.checkpoint, state, derived, c, step,
                                  wait=True)
        print(f" --- checkpoint written to {args.checkpoint}")
    if args.timing_file:
        timers.summary(args.timing_file)
        print(f" --- timing summary written to {args.timing_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
