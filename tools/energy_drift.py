#!/usr/bin/env python3
"""Long-run energy/mass drift tracking over the full assembled cadence.

ROADMAP verification item: integrate the complete prim_run_step cadence
(SSPRK3 dynamics + DSS + hyperviscosity + limited tracers + periodic
vertical remap) for multiple simulated days on a real cubed sphere and
record the global diagnostics (ops/diagnostics.py: IE/KE/M) at fixed
intervals into a committed JSON artifact (ENERGY_DRIFT.json).

The reference has no such harness (its loop repeats one kernel); the
model analog is HOMME's prim energy budget printout. Initial condition:
resting isothermal atmosphere + warm bubble (examples/simulated_day.py).

    python tools/energy_drift.py --steps 720 --every 72 --cpu
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=4)
    ap.add_argument("--nlev", type=int, default=8)
    ap.add_argument("--steps", type=int, default=720,
                    help="720 x 600 s = 5 simulated days")
    ap.add_argument("--every", type=int, default=72)
    ap.add_argument("--dt", type=float, default=600.0)
    ap.add_argument("--nu", type=float, default=1e15)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
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
    from tinman_sandbox_tpu.state import State
    from tinman_sandbox_tpu.timeloop import check_dp3d, prim_run_step

    cs = build_cubed_sphere(args.ne)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, dt=args.dt)
    g = cs.geometry
    gdof = jnp.asarray(cs.gdof)

    p0, p_top = 1.0e5, 500.0
    etai = np.linspace(p_top / p0, 1.0, args.nlev + 1)
    b = ((etai - etai[0]) / (1.0 - etai[0])) ** 1.3
    a = etai - b
    hv = HybridVCoord(ps0=p0, hyai=a, hybi=b,
                      hyam=0.5 * (a[:-1] + a[1:]),
                      hybm=0.5 * (b[:-1] + b[1:]))

    ps = jnp.full((cs.nelem, NP, NP), p0)
    dp_ref = reference_dp(hv, ps)
    bubble = 0.5 * jnp.asarray(
        np.exp(-((cs.lat - 0.0) ** 2 + (cs.lon - 1.0) ** 2) / 0.05)
    )[:, None]
    tile = lambda x: jnp.broadcast_to(x, (NUM_TIME_LEVELS,) + x.shape).copy()
    zeros3 = jnp.zeros((NUM_TIME_LEVELS, cs.nelem, args.nlev, NP, NP))
    st = State(
        u=zeros3, v=zeros3,
        t=tile((280.0 + bubble) * jnp.ones_like(dp_ref)),
        dp3d=tile(dp_ref),
        ps_v=tile(ps),
        phis=jnp.zeros((cs.nelem, NP, NP)),
        qdp=jnp.full((QDP_TIME_LEVELS, cs.nelem, cfg.qsize, args.nlev,
                      NP, NP), 1e-3) * dp_ref[None, :, None],
    )
    dv = zero_derived(cfg)

    # round-3 conservation stack on the field cadence (VERDICT r3 item 7):
    # two-float rspheremp projection + global dry-mass fixer at every remap
    from tinman_sandbox_tpu.dist.dss import rsp_2f
    from tinman_sandbox_tpu.timeloop.prim import air_mass

    rsp2 = tuple(jnp.asarray(x) for x in rsp_2f(g.spheremp, cs.gdof,
                                                cs.ndof))
    mass_target = air_mass(st, jnp.asarray(g.spheremp),
                           dataclasses.replace(cfg, np1=cfg.n0))

    d0 = {k: float(v) for k, v in
          energy_diagnostics(st, g.spheremp, cfg).items()}
    samples = [dict(step=0, **d0, dp3d_ok=True)]
    print("step 0:", json.dumps(d0), flush=True)

    c = cfg
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        st, dv, c = prim_run_step(st, dv, g, hv, c, gdof, cs.ndof,
                                  nu=args.nu, qsplit=2, limit_tracers=True,
                                  remap=(step % 3 == 0), rsp2=rsp2,
                                  mass_target=mass_target)
        if step % args.every == 0 or step == args.steps:
            d = {k: float(v) for k, v in
                 energy_diagnostics(st, g.spheremp, cfg, tl=c.n0).items()}
            ok, _ = check_dp3d(st, dataclasses.replace(c, np1=c.n0))
            samples.append(dict(step=step, **d, dp3d_ok=bool(ok)))
            print(f"step {step}:", json.dumps(samples[-1]), flush=True)
            assert np.isfinite(np.asarray(st.t)).all(), "state blew up"
    wall = time.perf_counter() - t0

    final = samples[-1]
    report = {
        "config": {"ne": args.ne, "nelem": cs.nelem, "nlev": args.nlev,
                   "dt": args.dt, "steps": args.steps, "nu": args.nu,
                   "qsplit": 2, "remap_every": 3, "limit_tracers": True},
        "backend": jax.default_backend(),
        "simulated_days": args.steps * args.dt / 86400.0,
        "samples": samples,
        "mass_drift_rel": abs(final["M"] / d0["M"] - 1.0),
        "ie_drift_rel": abs(final["IE"] / d0["IE"] - 1.0),
        "ke_final": final["KE"],
        "wall_s": round(wall, 1),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ENERGY_DRIFT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"mass drift {report['mass_drift_rel']:.3e}  IE drift "
          f"{report['ie_drift_rel']:.3e}  KE {final['KE']:.3e}  -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
