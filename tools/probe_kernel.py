#!/usr/bin/env python3
"""Roofline probes: HBM triad bandwidth, block-matmul rate, CAAR phases.

Decomposes the fused CAAR kernel's cost to find the bottleneck on the real
chip. Not part of the test suite; a tuning tool (GPTL-spirit, SURVEY §5).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())

    # 1. triad bandwidth
    from tinman_sandbox_tpu.kernels.saxpby import saxpby_bandwidth_gbs

    print(f"triad BW: {saxpby_bandwidth_gbs():.1f} GB/s")

    # 2. block matmul rate: the CAAR kernel's inner shape
    for m, k, n in [(128, 128, 72), (256, 256, 72), (256, 256, 128),
                    (512, 512, 512), (1024, 1024, 1024)]:
        a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)), jnp.float32)

        def mm_kernel(a_ref, b_ref, o_ref):
            acc = jnp.zeros_like(o_ref)
            for _ in range(20):
                acc = acc + jax.lax.dot(a_ref[:], b_ref[:],
                                        preferred_element_type=jnp.float32)
            o_ref[:] = acc

        f = jax.jit(lambda a, b: pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        dt = timeit(f, a, b, iters=100)
        gf = 20 * 2 * m * k * n / dt / 1e9
        print(f"matmul f32 [{m},{k}]@[{k},{n}] x20: {gf:.0f} GFLOP/s")

    # 3. CAAR kernel timing at several (eb, nelem)
    from tinman_sandbox_tpu import (
        Config, analytic_hvcoord, random_geometry, random_state, zero_derived,
    )
    from tinman_sandbox_tpu.kernels.caar_pallas import (
        caar_pallas_packed, pack_problem, _scalars,
    )

    for eb in (8, 16):
        cfg = Config(nelem=1024, nlev=72, elem_block=eb)
        cast = lambda t: jax.tree.map(lambda x: np.asarray(x, np.float32), t)
        st, dv = cast(random_state(cfg, seed=7)), cast(zero_derived(cfg))
        geom = cast(random_geometry(cfg, seed=8))
        hv = analytic_hvcoord(cfg).astype(np.float32)
        p = pack_problem(st, dv, geom, hv, cfg)
        scal = _scalars(0.1, 1.0, hv)
        args = (scal, p["dxb"], p["dyb"], p["ainc"], p["astr"], p["bstr"],
                p["meta"], p["u0"], p["v0"], p["t0"], p["dp0"],
                p["um1"], p["vm1"], p["tm1"], p["dpm1"],
                p["qdp"], p["pecnd"], p["vn0u"], p["vn0v"], p["omg"])
        f = lambda *a: caar_pallas_packed(*a, eb=eb, nlev=cfg.nlev)
        dt = timeit(f, *args, iters=50)
        gp = cfg.nelem * cfg.nlev * 16
        print(f"caar eb={eb}: {dt*1e3:.3f} ms/step, {gp/dt/1e6:.0f} Mgp/s, "
              f"{22*gp*4/dt/1e9:.1f} GB/s effective")


if __name__ == "__main__":
    main()
