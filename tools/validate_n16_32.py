"""Round-5 multi-chip paths at N=16 and N=32 virtual devices.

Extends the 8-device CPU-mesh gates (tests/, dryrun) to larger meshes:
the band-sharded assembled step and the FULL banded prim cadence with
the round-5 shard bodies — lane-grouped producers, compact super-block
slabs, and the overlapped (merge-free sweep + fix-tile patch)
decomposition — must equal the single-device packed step/cadence.

    XLA_FLAGS=--xla_force_host_platform_device_count=32 \
        python tools/validate_n16_32.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=32").strip()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_state, zero_derived,
    )
    from tinman_sandbox_tpu import fastpath
    from tinman_sandbox_tpu.dist.banded_t4 import caar_dss_banded_t4
    from tinman_sandbox_tpu.dist.cubed_sphere import build_cubed_sphere
    from tinman_sandbox_tpu.dist.prim_banded import prim_step_banded_t4
    from tinman_sandbox_tpu.dist.step_pallas import (
        caar_dss_structured_packed_t4, prim_step_packed_t4,
    )
    from tinman_sandbox_tpu.dist.structured_dss import make_structured_plan
    from tinman_sandbox_tpu.kernels.caar_pallas import _scalars
    from tinman_sandbox_tpu.kernels.caar_pallas_t import pack_problem_t
    from tinman_sandbox_tpu.kernels.layout import pack_field_t

    report = {}
    # (N, ne, m): 6m % N == 0; single-row bands with 128-aligned lanes
    for N, ne, m in ((16, 8, 8), (32, 16, 16)):
        if len(jax.devices()) < N:
            print(f"N={N}: SKIP ({len(jax.devices())} devices)")
            continue
        k = 4
        cs = build_cubed_sphere(ne)
        cfg = Config(nelem=cs.nelem, nlev=k, elem_block=8, qsize=2)
        cast = lambda t: jax.tree.map(
            lambda x: np.asarray(x, np.float32), t)
        st = cast(random_state(cfg, seed=8))
        dv = cast(zero_derived(cfg))
        hv = analytic_hvcoord(cfg).astype(np.float32)
        g = cast(cs.geometry)
        plan = make_structured_plan(cs.gdof, ne)
        pt = pack_problem_t(st, dv, g, hv, cfg)
        scal = _scalars(0.02, 1.0, hv)
        rsp = jnp.asarray(g.rspheremp, jnp.float32).reshape(1, -1)
        s0 = jnp.concatenate([pt["u0"], pt["v0"], pt["t0"], pt["dp0"]],
                             axis=0)
        sm1 = jnp.concatenate([pt["um1"], pt["vm1"], pt["tm1"],
                               pt["dpm1"]], axis=0)
        qdp0 = jnp.concatenate(
            [pack_field_t(jnp.asarray(st.qdp[cfg.qn0, :, q], jnp.float32))
             for q in range(cfg.qsize)], axis=0)
        mesh = Mesh(np.asarray(jax.devices()[:N]), ("e",))
        row = {}

        ref = caar_dss_structured_packed_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp,
            eb=8, nlev=k, interpret=True)
        args = (scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
                pt["bstrt"], pt["meta"], s0, sm1, pt["qdp"], pt["pecnd"],
                pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m)
        for label, kw in (("banded_lg", {}),
                          ("banded_lg_overlap", dict(overlap=True))):
            with mesh:
                got = caar_dss_banded_t4(*args, eb=8, nlev=k,
                                         interpret=True, **kw)
            err = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                      for a, b in zip(got, ref))
            assert err < 1e-4, (N, label, err)
            row[label] = {"max_err": err,
                          "path": fastpath.last_path.get(
                              "caar_dss_banded_t4")}

        pref = prim_step_packed_t4(
            scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
            pt["bstrt"], pt["meta"], s0, qdp0, pt["pecnd"],
            pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, 2.5e-4,
            eb=8, nlev=k, qsplit=1, interpret=True)
        with mesh:
            pgot = prim_step_banded_t4(
                scal, pt["dxbt"], pt["dybt"], pt["ainct"], pt["astrt"],
                pt["bstrt"], pt["meta"], s0, qdp0, pt["pecnd"],
                pt["vn0u"], pt["vn0v"], pt["omg"], plan, rsp, mesh, m,
                2.5e-4, eb=8, nlev=k, qsplit=1, interpret=True)
        err = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                  for a, b in zip(pgot, pref))
        assert err < 1e-4, (N, "prim", err)
        row["prim_cadence"] = {"max_err": err,
                               "path": fastpath.last_path.get(
                                   "prim_banded_t4")}
        report[f"N={N} ne={ne} m={m}"] = row
        print(f"N={N}:", json.dumps(row), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
