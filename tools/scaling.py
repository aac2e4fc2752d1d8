#!/usr/bin/env python3
"""Weak/strong scaling sweep over an N-device mesh.

The reference's fortran/scaling.sh (OMP 1->8 thread sweep with speedup
table) re-imagined for device meshes: run the distributed CAAR+DSS step on
1, 2, 4, 8 devices and report throughput + parallel efficiency. On a real
pod slice the same code scales over chips; in this container it validates
on the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count).

    python tools/scaling.py --ne 8 --nlev 72 --steps 10 [--weak]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ne", type=int, default=6)
    ap.add_argument("--nlev", type=int, default=72)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--weak", action="store_true",
                    help="scale the problem with the device count")
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--cpu", action="store_true", default=None,
                    help="force the CPU backend (default when multi-device "
                         "TPU hardware is unavailable)")
    args = ap.parse_args()

    import jax

    if args.cpu or len(jax.devices()) < max(args.devices):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tinman_sandbox_tpu import Config, analytic_hvcoord, random_state, zero_derived
    from tinman_sandbox_tpu.dist import (
        build_cubed_sphere, caar_dss_step, make_mesh, shard_problem,
    )

    results = []
    for nd in args.devices:
        ne = args.ne
        if args.weak:
            # grow elements ~linearly with devices, keeping 6*ne^2 % nd == 0
            ne = int(round(args.ne * np.sqrt(nd)))
        while (6 * ne * ne) % nd:
            ne += 1
        cs = build_cubed_sphere(ne)
        cfg = Config(nelem=cs.nelem, nlev=args.nlev)
        cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
        st, dv = cast(random_state(cfg, seed=7)), cast(zero_derived(cfg))
        geom = cast(cs.geometry)
        hv = analytic_hvcoord(cfg).astype(np.float32)
        gdof = jnp.asarray(cs.gdof)

        mesh = make_mesh(nd)
        st, dv, geom = shard_problem(mesh, st, dv, geom)

        def step(s, d):
            return caar_dss_step(s, d, geom, hv, gdof, cs.ndof, cfg,
                                 np.float32(0.01), np.float32(1.0))

        s, d = step(st, dv)
        jax.block_until_ready((s, d))
        wall = float("inf")
        for _ in range(3):                     # best-of-3 timed reps
            t0 = time.perf_counter()
            s, d = st, dv
            for _ in range(args.steps):
                s, d = step(s, d)
            jax.block_until_ready((s, d))
            wall = min(wall, time.perf_counter() - t0)
        gps = cs.nelem * args.nlev * 16 * args.steps / wall
        results.append((nd, cs.nelem, wall, gps))
        print(f"devices={nd:2d} ne={ne:3d} nelem={cs.nelem:6d} "
              f"wall={wall:.3f}s  {gps/1e6:8.1f} Mgp/s")

    base_nd, base_ne, base_wall, base_gps = results[0]
    print("\nefficiency vs {} device(s):".format(base_nd))
    for nd, nelem, wall, gps in results:
        if args.weak:
            eff = (gps / nelem) / (base_gps / results[0][1])
        else:
            eff = (gps / gps_ideal) if (gps_ideal := base_gps * nd / base_nd) else 0
        print(f"  {nd:2d} devices: {eff*100:6.1f}%")


if __name__ == "__main__":
    main()
