#!/usr/bin/env python3
"""Production packed-cadence integration: the fused fast path end to end.

Runs the FULL prim cadence entirely on the packed transposed Pallas layout
(dist/step_pallas.py::prim_step_packed_t4): SSPRK3 dynamics + biharmonic
hyperviscosity + limited SSP tracer transport, with the conservative
vertical remap every ``--rsplit`` steps and packed-layout energy/mass
diagnostics — no unpacking anywhere in the loop. This is the serving-shape
configuration: state packs once, chains across steps, reads back only
diagnostics scalars.

    python examples/packed_cadence.py --ne 8 --nlev 26 --steps 48
    python examples/packed_cadence.py --ne 4 --nlev 8 --steps 6 --cpu
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=8)
    ap.add_argument("--nlev", type=int, default=26)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--dt", type=float, default=100.0)
    ap.add_argument("--nu", type=float, default=1e15)
    ap.add_argument("--qsize", type=int, default=2)
    ap.add_argument("--qsplit", type=int, default=2)
    ap.add_argument("--rsplit", type=int, default=3,
                    help="vertical remap cadence (steps)")
    ap.add_argument("--eb", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend + interpret-mode kernels (smoke)")
    ap.add_argument("--checkpoint", default=None,
                    help="write a packed-chain checkpoint here at the end "
                         "and restart from it if it already exists")
    ap.add_argument("--init", default="random",
                    choices=("random", "bubble"),
                    help="initial state: projected random flow (spin-up "
                         "stress test; physically UNSTABLE past ~4 "
                         "simulated days at ne8 — the field-layout path "
                         "blows at the same simulated time with a "
                         "matching KE trajectory, see "
                         "ENERGY_DRIFT_TPU_Q35_5DAY.json note) or a "
                         "resting isothermal atmosphere + warm bubble "
                         "(the long-horizon drift configuration, "
                         "tools/energy_drift.py analog)")
    ap.add_argument("--drift-out", default=None,
                    help="record the sampled IE/KE/M diagnostics to this "
                         "JSON (long-run drift artifact for the packed "
                         "cadence, ENERGY_DRIFT.json analog)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu import Config, random_state, zero_derived
    from tinman_sandbox_tpu.dist import build_cubed_sphere
    from tinman_sandbox_tpu.dist.dss import dss_project
    from tinman_sandbox_tpu.dist.step_pallas import (
        packed_air_mass, prim_step_packed_t4, remap_packed_t4,
    )
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.grid import HybridVCoord
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import pack_field_t
    from tinman_sandbox_tpu.ops.diagnostics import (
        energy_diagnostics_packed_t,
    )

    interp = jax.default_backend() != "tpu"
    cs = build_cubed_sphere(args.ne)
    eb = args.eb or (8 if cs.nelem % 8 == 0 else 4)
    cfg = Config(nelem=cs.nelem, nlev=args.nlev, qsize=args.qsize,
                 dt=args.dt, elem_block=eb)
    cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
    st = cast(random_state(cfg, seed=11))
    g = cast(cs.geometry)
    gdof = jnp.asarray(cs.gdof)

    # physically monotone hybrid levels (increasing interface pressure)
    eta = np.linspace(0.0, 1.0, cfg.nlev + 1, dtype=np.float32)
    hv = HybridVCoord(
        ps0=np.float32(1000.0),
        hyai=(0.12 * (1.0 - eta)).astype(np.float32),
        hybi=eta, hyam=None, hybm=None)
    hv = dataclasses.replace(
        hv, hyam=0.5 * (hv.hyai[:-1] + hv.hyai[1:]),
        hybm=0.5 * (hv.hybi[:-1] + hv.hybi[1:]))

    # continuous, positive-mass initial state (the packed path's contract)
    proj = lambda x: np.asarray(dss_project(
        jnp.asarray(x), gdof, cs.ndof, g.spheremp, g.rspheremp), np.float32)
    n0, qn0 = cfg.n0, cfg.qn0
    if args.init == "bubble":
        # resting isothermal atmosphere + warm bubble: balanced, stable
        # over multi-day horizons (the drift-artifact configuration)
        from tinman_sandbox_tpu.config import NP
        from tinman_sandbox_tpu.ops.remap import reference_dp

        ps = jnp.full((cs.nelem, NP, NP), float(hv.ps0))
        dp_ref = np.asarray(reference_dp(hv, ps), np.float32)
        bubble = 0.5 * np.exp(
            -((np.asarray(cs.lat) - 0.0) ** 2
              + (np.asarray(cs.lon) - 1.0) ** 2) / 0.05
        ).astype(np.float32)[:, None]
        su = np.zeros_like(np.array(st.u))
        sv = np.zeros_like(su)
        stt = np.array(st.t)
        stt[n0] = (280.0 + bubble) * np.ones_like(dp_ref)
        sdp = np.array(st.dp3d)
        sdp[n0] = dp_ref
        sq = np.array(st.qdp)
        sq[qn0] = 1e-3 * dp_ref[:, None]
        st = dataclasses.replace(st, u=su, v=sv, t=stt, dp3d=sdp, qdp=sq)
    else:
        su, sv, stt = np.array(st.u), np.array(st.v), np.array(st.t)
        sdp, sq = np.array(st.dp3d), np.abs(np.array(st.qdp)) * 0.01
        su[n0], sv[n0], stt[n0] = (proj(su[n0]), proj(sv[n0]),
                                   proj(stt[n0] + 280))
        sdp[n0] = proj(np.abs(sdp[n0]) + 900.0 / cfg.nlev)
        sq[qn0] = proj(sq[qn0])
        st = dataclasses.replace(st, u=su, v=sv, t=stt, dp3d=sdp, qdp=sq)

    plan = make_structured_plan(cs.gdof, args.ne)
    pt = pack_problem_t(st, cast(zero_derived(cfg)), g, hv, cfg)
    scal = _scalars(cfg.dt, 1.0, hv)
    # two-float rspheremp: kills the systematic per-DSS-pass mass bias
    # (kernels.dss_pallas._rsp_mul)
    from tinman_sandbox_tpu.dist.structured_dss import rsp_lanes_2f
    rsp = jnp.asarray(rsp_lanes_2f(g.spheremp, cs.gdof, cs.ndof))
    s = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]], axis=0)
    qdp = jnp.concatenate(
        [pack_field_t(jnp.asarray(st.qdp[qn0, :, q], jnp.float32))
         for q in range(cfg.qsize)], axis=0)
    acc = (pt["vn0u"], pt["vn0v"], pt["omg"])
    consts = (pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"], pt["bstrt"],
              pt["meta"])

    step0 = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        from tinman_sandbox_tpu.timeloop import load_packed_checkpoint

        s, qdp, acc, step0 = load_packed_checkpoint(args.checkpoint)
        s, qdp = jnp.asarray(s), jnp.asarray(qdp)
        acc = tuple(jnp.asarray(a) for a in acc)
        print(f" restarted packed chain at step {step0} "
              f"from {args.checkpoint}", flush=True)

    # dry-mass fixer target: the t=0 air mass under the SAME f32
    # measurement functional the remap-time fixer uses
    from tinman_sandbox_tpu.kernels.layout import META_COLS
    sph_lanes = pt["meta"][META_COLS.index("spheremp")][None, :]
    mass0 = packed_air_mass(s, sph_lanes, cfg.nlev)

    d0 = {k: float(v) for k, v in
          energy_diagnostics_packed_t(s, pt["meta"], nlev=cfg.nlev).items()}
    print(f" step {step0}: "
          + "  ".join(f"{k}={v:.6e}" for k, v in d0.items()), flush=True)
    samples = [dict(step=step0, **d0)]

    t0 = time.perf_counter()
    for step in range(step0 + 1, step0 + args.steps + 1):
        s, qdp, phi, a, b, c = prim_step_packed_t4(
            scal, *consts, s, qdp, pt["pecnd"], *acc, plan, rsp, args.nu,
            eb=eb, nlev=cfg.nlev, qsplit=args.qsplit, limit_tracers=True,
            interpret=interp)
        acc = (a, b, c)
        if args.rsplit and step % args.rsplit == 0:
            s, qdp = remap_packed_t4(s, qdp, hv, nelem=cfg.nelem,
                                     nlev=cfg.nlev, qsize=cfg.qsize,
                                     sph_lanes=sph_lanes,
                                     mass_target=mass0)
        nsample = 24 if args.drift_out else 4
        if (step == step0 + args.steps
                or step % max(args.steps // nsample, 1) == 0):
            d = {k: float(v) for k, v in energy_diagnostics_packed_t(
                s, pt["meta"], nlev=cfg.nlev).items()}
            samples.append(dict(step=step, **d))
            print(f" step {step}: "
                  + "  ".join(f"{k}={v:.6e}" for k, v in d.items()),
                  flush=True)
    wall = time.perf_counter() - t0

    if args.checkpoint:
        from tinman_sandbox_tpu.timeloop import save_packed_checkpoint

        save_packed_checkpoint(args.checkpoint, s, qdp, acc,
                               step0 + args.steps)
        print(f" packed chain checkpointed to {args.checkpoint}",
              flush=True)

    drift = abs(d["M"] - d0["M"]) / abs(d0["M"])
    finite = bool(jnp.all(jnp.isfinite(s)))
    if args.drift_out:
        import json

        with open(args.drift_out, "w") as fh:
            json.dump({
                "config": dict(ne=args.ne, nelem=cfg.nelem, nlev=cfg.nlev,
                               dt=args.dt, steps=args.steps, nu=args.nu,
                               qsize=args.qsize, qsplit=args.qsplit,
                               rsplit=args.rsplit, init=args.init),
                "backend": jax.default_backend(),
                "path": "prim_step_packed_t4 (fused packed Pallas cadence)",
                "samples": samples,
                "mass_drift_rel": drift,
                "finite": finite,
                "note": "round-3 conservation stack: two-float rspheremp "
                        "(rsp_lanes_2f; kills the fixed ~1e-8/pass "
                        "rsp*S!=1 DSS bias), compensated remap column "
                        "totals (ops/remap.comp_sum + dp_tgt "
                        "renormalization), and the global dry-mass fixer "
                        "in remap_packed_t4 (ratio of same-order f32 "
                        "measurements; absorbs the dt-proportional f32 "
                        "edge-flux roundoff of the dynamics, which the "
                        "f64 oracle bounds at ~1e-6/5days). Round-2 "
                        "drift 1.25e-4/5days linear -> now at the "
                        "measurement-noise floor.",
            }, fh, indent=1)
        print(f" drift samples written to {args.drift_out}", flush=True)
    print(f" {args.steps} steps in {wall:.1f} s "
          f"({wall / args.steps * 1e3:.1f} ms/step incl. diagnostics); "
          f"relative mass drift {drift:.2e}; finite={finite}")
    return 0 if (finite and drift < 1e-4) else 1


if __name__ == "__main__":
    raise SystemExit(main())
