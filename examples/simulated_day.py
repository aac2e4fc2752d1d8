#!/usr/bin/env python3
"""One simulated day of the full model cadence — the reference's canonical
workload (kokkos_init.cpp:97-99: 86,400 s / 600 s step = 144 steps x RK
stages) run as an actual integration instead of a repeated kernel call:

  ne=8 cubed sphere (384 elements) x 26 levels, SSPRK3 dynamics with DSS
  assembly, biharmonic hyperviscosity, qsplit=2 limited tracer transport,
  energy/mass diagnostics every 24 steps, checkpoint at the end.

    python examples/simulated_day.py [--ne 8] [--nlev 26] [--steps 144]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=8)
    ap.add_argument("--nlev", type=int, default=26)
    ap.add_argument("--steps", type=int, default=144)
    ap.add_argument("--dt", type=float, default=600.0)
    ap.add_argument("--nu", type=float, default=1e15)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast compiles for smokes)")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu import Config, zero_derived
    from tinman_sandbox_tpu.config import NP, NUM_TIME_LEVELS, QDP_TIME_LEVELS
    from tinman_sandbox_tpu.dist import build_cubed_sphere
    from tinman_sandbox_tpu.grid import HybridVCoord
    from tinman_sandbox_tpu.ops.diagnostics import energy_diagnostics
    from tinman_sandbox_tpu.ops.remap import reference_dp
    from tinman_sandbox_tpu.profiling import timers
    from tinman_sandbox_tpu.state import State
    from tinman_sandbox_tpu.timeloop import check_dp3d, prim_run_step

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, dt=args.dt)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)
    print(f"cubed sphere ne={args.ne}: {cs.nelem} elements, {cs.ndof} dofs, "
          f"{args.nlev} levels; dt={args.dt}s x {args.steps} steps")

    # real hybrid coordinate (p_top = 5 hPa .. ps0 = 1000 hPa)
    p0, p_top = 1.0e5, 500.0
    etai = np.linspace(p_top / p0, 1.0, args.nlev + 1)
    b = ((etai - etai[0]) / (1.0 - etai[0])) ** 1.3
    a = etai - b
    hv = HybridVCoord(ps0=p0, hyai=a, hybi=b,
                      hyam=0.5 * (a[:-1] + a[1:]),
                      hybm=0.5 * (b[:-1] + b[1:]))

    # resting isothermal atmosphere + a smooth warm bubble (gravity-wave
    # test): the continuous fields are trivially DSS-continuous
    ps = jnp.full((cs.nelem, NP, NP), p0)
    dp_ref = reference_dp(hv, ps)                       # [e, nlev, np, np]
    bubble = 0.5 * jnp.asarray(
        np.exp(-((cs.lat - 0.0) ** 2 + (cs.lon - 1.0) ** 2) / 0.05)
    )[:, None]                                          # +0.5 K perturbation
    t_init = 280.0 + bubble
    tile = lambda x: jnp.broadcast_to(x, (NUM_TIME_LEVELS,) + x.shape).copy()
    zeros3 = jnp.zeros((NUM_TIME_LEVELS, cs.nelem, args.nlev, NP, NP))
    st = State(
        u=zeros3, v=zeros3,
        t=tile(t_init * jnp.ones_like(dp_ref)),
        dp3d=tile(dp_ref),
        ps_v=tile(ps),
        phis=jnp.zeros((cs.nelem, NP, NP)),
        qdp=jnp.full((QDP_TIME_LEVELS, cs.nelem, cfg.qsize, args.nlev,
                      NP, NP), 1e-3) * dp_ref[None, :, None],
    )
    dv = zero_derived(cfg)

    d0 = energy_diagnostics(st, g.spheremp, cfg)
    print("initial:", "  ".join(f"{k}={float(v):.6e}" for k, v in d0.items()))

    c = cfg
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        with timers.region("prim_run_step"):
            st, dv, c = prim_run_step(st, dv, g, hv, c, gdof, cs.ndof,
                                      nu=args.nu, qsplit=2,
                                      limit_tracers=True,
                                      remap=(step % 3 == 0))
        if step % 24 == 0:
            d = energy_diagnostics(st, g.spheremp, cfg, tl=c.n0)
            ok, mn = check_dp3d(st, dataclasses.replace(c, np1=c.n0))
            print(f"step {step:4d}: "
                  + "  ".join(f"{k}={float(v):.6e}" for k, v in d.items())
                  + ("" if bool(ok) else f"  [dp3d min {float(mn):.2e}!]"))
    jax.block_until_ready(st.t)
    wall = time.perf_counter() - t0

    d1 = energy_diagnostics(st, g.spheremp, cfg, tl=c.n0)
    drift = abs(float(d1["M"]) / float(d0["M"]) - 1.0)
    print(f"final:   "
          + "  ".join(f"{k}={float(v):.6e}" for k, v in d1.items()))
    print(f"mass drift: {drift:.2e}; wall {wall:.1f}s "
          f"({cs.nelem * args.nlev * 16 * args.steps / wall / 1e6:.1f} Mgp/s)")
    assert np.isfinite(np.asarray(st.t)).all(), "state blew up"
    if args.checkpoint:
        from tinman_sandbox_tpu.timeloop import save_checkpoint

        save_checkpoint(args.checkpoint, st, dv, c, args.steps)
        print("checkpoint:", args.checkpoint)


if __name__ == "__main__":
    main()
